"""Rolling/trend/statistical batch analytics over `events` (round-11
split of the 2,500-line events_batch module: this file carries the
rolling-window, trend and distribution-statistics sub-family —
EWMA/Bollinger/rolling-median/seasonality, concentration (Pareto/
Gini), survival (Kaplan-Meier), sliding distinct users, funnel-step
and Sankey transition breakdowns, interval-overlap join, bot
regularity, VARIANT props stats. events_batch keeps the core
windowing/sessionization/journey family; events_ops remains the
compatibility aggregator that imports both, so registered names,
import paths and load order are unchanged). All hash-verified against
the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "events_sliding_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    expanded AS (
      SELECT du.day + CAST(x.o AS INTEGER) AS target_day, du.user_id
      FROM du, (SELECT unnest(generate_series(0, 6)) AS o) x
    ),
    bounds AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM du)
    SELECT e.target_day AS window_end,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS distinct_users_7d
    FROM expanded e, bounds b
    WHERE e.target_day BETWEEN b.mind AND b.maxd
    GROUP BY 1
    """,
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct active users per day — the
    sliding-window COUNT DISTINCT that naive windowing can't do
    (distinct doesn't decompose over frames). Shape: reduce to
    per-(day, user) distinct first, then map-side EXPAND each row to
    the 7 window-ends it serves and count distinct per target day —
    the shuffle grows by the window length (7x the daily-distinct
    frame, tiny), never by raw event volume, and no state or ordered
    scan is needed. Days outside the observed range are clipped so
    every emitted window is fully contained in the data."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    bounds = du.agg(
        F.min("day").alias("mind"), F.max("day").alias("maxd")
    )
    expanded = du.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("o"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("o")).alias("window_end"), "user_id")
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_end").between(F.col("mind"), F.col("maxd")))
        .groupBy("window_end")
        .agg(
            F.countDistinct("user_id").cast("long").alias("distinct_users_7d")
        )
    )


@register(
    "events_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1
    )
    SELECT day,
           v,
           0.5 * v
           + 0.25 * COALESCE(LAG(v, 1) OVER w, 0)
           + 0.125 * COALESCE(LAG(v, 2) OVER w, 0)
           + 0.0625 * COALESCE(LAG(v, 3) OVER w, 0)
           + 0.03125 * COALESCE(LAG(v, 4) OVER w, 0)
           + 0.015625 * COALESCE(LAG(v, 5) OVER w, 0)
           + 0.0078125 * COALESCE(LAG(v, 6) OVER w, 0) AS ewma7
    FROM daily
    WINDOW w AS (ORDER BY day)
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily totals
    (lambda = 1/2, truncated at 7 terms): trend smoothing whose
    coefficients 2^-1 .. 2^-7 are EXACT binary fractions, so the
    fixed-order multiply-add chain is bit-identical across engines —
    the deterministic alternative to a sequential EWMA recurrence
    (which cannot parallelize) and to pow() (which varies by libm).
    The window runs over the day-grain aggregate: one row per day
    into the ordered window regardless of event volume; partition by
    series key when smoothing many series."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("v")
    )
    # bounded-window: input is the per-day aggregate (≤ #days rows)
    w = Window.orderBy("day")
    terms = F.lit(0.5) * F.col("v")
    for i in range(1, 7):
        terms = terms + F.lit(0.5 ** (i + 1)) * F.coalesce(
            F.lag("v", i).over(w), F.lit(0.0)
        )
    return daily.select("day", "v", terms.alias("ewma7"))


@register(
    "events_journey_array_stats",
    oracle="""
    WITH j AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS steps
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(steps) AS BIGINT) AS path_len,
           steps[1] AS first_step,
           steps[len(steps)] AS last_step,
           CAST(len(list_filter(steps, s -> s = 'purchase')) AS BIGINT)
             AS n_purchases,
           CAST(len(list_distinct(steps)) AS BIGINT) AS n_distinct_types,
           CAST(len(list_filter(generate_series(1, len(steps) - 1),
                    i -> steps[i] = steps[i+1])) AS BIGINT)
             AS n_immediate_repeats
    FROM j WHERE user_id < 100
    """,
)
def events_journey_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array analytics over materialized journeys: path length,
    first/last step, purchase count, type variety, and immediate
    repeats — all computed with array higher-order functions INSIDE
    the row after one order-imposing collect (struct-sort idiom shared
    with events_user_journey). This is the downstream-consumer shape:
    one shuffle builds the nested column, every feature after it is a
    zero-shuffle projection."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    steps = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("event_id"),
                    F.col("event_type").alias("t"),
                )
            )
        ),
        lambda s: s["t"],
    )
    j = ev.groupBy("user_id").agg(steps.alias("steps"))
    n = F.size("steps")
    repeats = F.size(
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.element_at(F.col("steps"), i)
            == F.element_at(F.col("steps"), i + 1),
        )
    )
    return j.select(
        "user_id",
        n.cast("long").alias("path_len"),
        F.element_at("steps", 1).alias("first_step"),
        F.element_at(F.col("steps"), n).alias("last_step"),
        F.size(
            F.filter(F.col("steps"), lambda s: s == F.lit("purchase"))
        ).cast("long").alias("n_purchases"),
        F.size(F.array_distinct("steps")).cast("long").alias(
            "n_distinct_types"
        ),
        repeats.cast("long").alias("n_immediate_repeats"),
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t
      GROUP BY 1
    )
    SELECT 1 AS step, 'view' AS step_name,
           (SELECT COUNT(*) FROM v) AS survivors
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel rollup (view -> click after it ->
    purchase after that): survivor counts per step, each step's
    earliest-qualifying timestamp chained through a min-aggregate +
    semi-join on the SAME user partitioning — n steps cost n bounded
    aggregations, never a self-join of the raw stream."""
    e = load_table(spark, sf_dir, "events")

    def first_after(prev, etype):
        ev = e.filter(F.col("event_type") == etype)
        if prev is not None:
            ev = ev.join(prev, "user_id").filter(
                F.col("ts") > F.col("prev_t")
            )
        return ev.groupBy("user_id").agg(F.min("ts").alias("prev_t"))

    v = first_after(None, "view")
    c = first_after(v, "click")
    p = first_after(c, "purchase")
    rows = None
    for step, nm, frame in ((1, "view", v), (2, "click", c), (3, "purchase", p)):
        r = frame.agg(
            F.lit(step).cast("int").alias("step"),
            F.lit(nm).alias("step_name"),
            F.count(F.lit(1)).alias("survivors"),
        ).select("step", "step_name", "survivors")
        rows = r if rows is None else rows.unionByName(r)
    return rows


@register(
    "events_cohort_ltv",
    oracle="""
    WITH first_wk AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE))
               - CAST(((MIN(CAST(ts AS DATE)) - DATE '2024-01-01') % 7)
                      AS INTEGER) AS cohort
      FROM events GROUP BY 1
    ),
    spend AS (
      SELECT e.user_id, f.cohort,
             ((CAST(e.ts AS DATE) - DATE '2024-01-01') // 7)
               - ((f.cohort - DATE '2024-01-01') // 7) AS wk_offset,
             CAST(e.value AS DECIMAL(18,6)) AS v
      FROM events e JOIN first_wk f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    wk AS (
      SELECT cohort, CAST(wk_offset AS BIGINT) AS wk_offset,
             SUM(v) AS wk_rev
      FROM spend GROUP BY 1, 2
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, wk_offset,
           CAST(wk_rev AS DOUBLE) AS week_revenue,
           CAST(SUM(wk_rev) OVER (PARTITION BY cohort ORDER BY wk_offset
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_ltv
    FROM wk
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: purchase revenue by signup-week cohort x
    week offset, with the running cumulative LTV curve per cohort —
    the money twin of events_retention_cohorts. Revenue accumulates in
    DECIMAL end-to-end (the cumulative window sums exact decimals and
    casts once at emission); the window partition is the bounded
    (cohort, offsets) frame, not raw events."""
    e = load_table(spark, sf_dir, "events")
    epoch = F.lit("2024-01-01").cast("date")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("fd"))
    first = first.select(
        "user_id",
        F.date_sub(
            F.col("fd"), F.datediff(F.col("fd"), epoch) % 7
        ).alias("cohort"),
    )
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .select(
            "cohort",
            (
                (F.datediff(F.to_date("ts"), epoch) / 7).cast("long")
                - (F.datediff(F.col("cohort"), epoch) / 7).cast("long")
            ).alias("wk_offset"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    wk = spend.groupBy("cohort", "wk_offset").agg(F.sum("v").alias("wk_rev"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("wk_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wk.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "wk_offset",
        F.col("wk_rev").cast("double").alias("week_revenue"),
        F.sum("wk_rev").over(w).cast("double").alias("cum_ltv"),
    )


@register(
    "events_bounce_rate_daily",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ),
    per_session AS (
      SELECT user_id, sid, MIN(CAST(ts AS DATE)) AS day, COUNT(*) AS n
      FROM sess GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS bounce_rate
    FROM per_session GROUP BY day
    """,
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: single-event sessions over total sessions,
    sessions defined by the same 30-minute inactivity gap as the
    sessionizer family (lag + running-sum island id on one user
    partitioning); the day key is the session's first event. Exact
    integer counts, one double division."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = (
        F.lag("ts").over(wu).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
            > 30 * 60 * 1_000_000
        )
    ).cast("int")
    sess = (
        e.select("user_id", "event_id", "ts", is_new.alias("is_new"))
        .withColumn(
            "sid",
            F.sum("is_new").over(
                wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.to_date("ts")).alias("day"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return sess.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        (
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("bounce_rate"),
    )


@register(
    "events_pareto_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             SUM(CAST(round(value * 1000000) AS HUGEINT)) AS spend_u
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    thr AS (
      SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY spend_u) AS t
      FROM per_user
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN p.spend_u >= thr.t THEN 1 ELSE 0 END)
                AS BIGINT) AS n_top,
           round(CAST(thr.t AS DOUBLE) / 1000000, 6) AS threshold_spend,
           round(CAST(SUM(CASE WHEN p.spend_u >= thr.t
                          THEN p.spend_u ELSE 0::HUGEINT END) AS DOUBLE)
                 / CAST(SUM(p.spend_u) AS DOUBLE), 6) AS top_decile_share
    FROM per_user p CROSS JOIN thr
    GROUP BY thr.t
    """,
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto revenue concentration: the share of purchase revenue
    held by users at or above the 90th-percentile spend — the 80/20
    health metric. Per-user spend is exact integer micros; the
    threshold is the exact discrete percentile (an existing data
    value, engine-portable) over the user-grain frame, broadcast back
    for one conditional sum."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.round(F.col("value") * 1_000_000).cast("decimal(38,0)")
            ).alias("spend_u")
        )
    )
    per_user.createOrReplaceTempView("_pareto_per_user")
    thr = spark.sql(
        """
        SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY spend_u) AS t
        FROM _pareto_per_user
        """
    )
    top = F.col("spend_u") >= F.col("t")
    return (
        per_user.crossJoin(F.broadcast(thr))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.when(top, 1).otherwise(0)).cast("long").alias("n_top"),
            F.sum(F.when(top, F.col("spend_u")).otherwise(F.lit(0))).alias(
                "s_top"
            ),
            F.sum("spend_u").alias("s_all"),
        )
        .select(
            "n_users",
            "n_top",
            F.round(F.col("t").cast("double") / 1_000_000, 6).alias(
                "threshold_spend"
            ),
            F.round(
                F.col("s_top").cast("double") / F.col("s_all").cast("double"),
                6,
            ).alias("top_decile_share"),
        )
    )


@register(
    "events_dau_wau_mau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM du),
    wau AS (
      SELECT du.day + CAST(x.o AS INTEGER) AS day, du.user_id
      FROM du, (SELECT unnest(generate_series(0, 6)) AS o) x
    ),
    mau AS (
      SELECT du.day + CAST(x.o AS INTEGER) AS day, du.user_id
      FROM du, (SELECT unnest(generate_series(0, 29)) AS o) x
    ),
    d AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1),
    w AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM wau GROUP BY 1),
    m AS (SELECT day, COUNT(DISTINCT user_id) AS mau FROM mau GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(m.mau AS BIGINT) AS mau,
           round(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
    FROM d
    JOIN w ON w.day = d.day
    JOIN m ON m.day = d.day
    CROSS JOIN bounds b
    WHERE d.day BETWEEN b.mind AND b.maxd
    """,
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-health triple: DAU, trailing-7-day WAU, trailing-30
    -day MAU, and DAU/MAU stickiness per day — three map-side
    expansions of the per-(day, user) distinct frame (window length is
    the expansion factor, never raw event volume), joined on the day
    key. Only days inside the observed range emit."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    bounds = du.agg(F.min("day").alias("mind"), F.max("day").alias("maxd"))

    def trailing(n, name):
        return (
            du.select(
                F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("o"),
                "day",
                "user_id",
            )
            .select(F.date_add("day", F.col("o")).alias("day"), "user_id")
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(name))
        )

    d = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    w7 = trailing(7, "wau")
    m30 = trailing(30, "mau")
    return (
        d.join(w7, "day")
        .join(m30, "day")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("day").between(F.col("mind"), F.col("maxd")))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "events_bollinger_bands",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(round(value * 1000000) AS HUGEINT)) AS v
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT day, v,
             SUM(v) OVER w AS s1,
             SUM(v * v) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(CAST(v AS DOUBLE) / 1000000, 6) AS value,
           round(CAST(s1 AS DOUBLE) / n / 1000000, 6) AS ma7,
           round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n / 1000000, 6)
             AS sd7,
           (CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
             > 2 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n)
             AS above_upper,
           (CAST(s1 AS DOUBLE) / n - CAST(v AS DOUBLE))
             > 2 * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n)
             AS below_lower
    FROM m WHERE n = 7
    """,
)
def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band anomaly flags over daily totals: trailing-7-day
    mean and population-σ from EXACT integer-micros window moments
    (Σv, Σv² in wide integers inside the frame — the windowed twin of
    agg_variance_exact), breakout = |v - ma| > 2σ. Only complete
    windows emit. The window runs over the day-grain aggregate: one
    row per day regardless of event volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.round(F.col("value") * 1_000_000).cast("decimal(38,0)")
        ).alias("v")
    )
    # bounded-window: input is the per-day aggregate (≤ #days rows)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    m = daily.select(
        "day",
        "v",
        F.sum("v").over(w).alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)"))
        .over(w)
        .alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") == 7)
    sd = (
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        )
        / F.col("n")
    )
    ma = F.col("s1").cast("double") / F.col("n")
    v = F.col("v").cast("double")
    return m.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(v / 1_000_000, 6).alias("value"),
        F.round(ma / 1_000_000, 6).alias("ma7"),
        F.round(sd / 1_000_000, 6).alias("sd7"),
        ((v - ma) > 2 * sd).alias("above_upper"),
        ((ma - v) > 2 * sd).alias("below_lower"),
    )


@register(
    "events_dow_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
             SUM(CAST(round(value * 1000000) AS HUGEINT)) AS v
      FROM events GROUP BY 1, 2
    ),
    per_dow AS (
      SELECT dow, SUM(v) AS sv, COUNT(*) AS nd FROM daily GROUP BY 1
    ),
    overall AS (SELECT SUM(v) AS st, COUNT(*) AS nt FROM daily)
    SELECT p.dow,
           CAST(p.nd AS BIGINT) AS n_days,
           round(CAST(p.sv AS DOUBLE) / p.nd / 1000000, 6) AS avg_daily,
           round((CAST(p.sv AS DOUBLE) / p.nd)
                 / (CAST(o.st AS DOUBLE) / o.nt), 6) AS seasonality_index
    FROM per_dow p CROSS JOIN overall o
    """,
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: each weekday's average daily
    value over the overall daily average (index 1.0 = flat) — the
    profile that seeds staffing and anomaly baselines. Exact
    integer-micros sums at day grain; two bounded aggregates and one
    broadcast of the overall row. DuckDB's dayofweek (0=Sunday)
    matches Spark's dayofweek-1, aligned explicitly."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        (F.dayofweek(F.to_date("ts")) - 1).cast("long").alias("dow"),
    ).agg(
        F.sum(
            F.round(F.col("value") * 1_000_000).cast("decimal(38,0)")
        ).alias("v")
    )
    per_dow = daily.groupBy("dow").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("nd")
    )
    overall = daily.agg(
        F.sum("v").alias("st"), F.count(F.lit(1)).alias("nt")
    )
    avg_daily = F.col("sv").cast("double") / F.col("nd")
    overall_avg = F.col("st").cast("double") / F.col("nt")
    return per_dow.crossJoin(F.broadcast(overall)).select(
        "dow",
        F.col("nd").cast("long").alias("n_days"),
        F.round(avg_daily / 1_000_000, 6).alias("avg_daily"),
        F.round(avg_daily / overall_avg, 6).alias("seasonality_index"),
    )


@register(
    "events_rolling_median_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(round(value * 1000000) AS HUGEINT)) AS v
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, v,
             list_sort(list(v) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win,
             COUNT(*) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(CAST(v AS DOUBLE) / 1000000, 6) AS value,
           round(CAST(win[4] AS DOUBLE) / 1000000, 6) AS median7
    FROM w WHERE n = 7
    """,
)
def events_rolling_median_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median (robust trend line): the 7-day window's
    values collect into a bounded in-row array, sort row-locally, and
    the 4th element is the exact median — the order-statistic rolling
    windows can't express with frame aggregates alone, kept cheap
    because the FRAME (not the data) bounds the array. Integer-micros
    values make the collected array hashable cross-engine."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.round(F.col("value") * 1_000_000).cast("decimal(38,0)")
        ).cast("long").alias("v")
    )
    # bounded-window: input is the per-day aggregate (≤ #days rows)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            "v",
            F.array_sort(F.collect_list("v").over(w)).alias("win"),
            F.count(F.lit(1)).over(w).alias("n"),
        )
        .filter(F.col("n") == 7)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("v").cast("double") / 1_000_000, 6).alias("value"),
            F.round(
                F.element_at("win", 4).cast("double") / 1_000_000, 6
            ).alias("median7"),
        )
    )


@register(
    "events_gini_coefficient",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             SUM(CAST(round(value * 1000000) AS HUGEINT)) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i
      FROM per_user
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(CAST(i AS HUGEINT) * x) AS six
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(CAST(2 * six AS DOUBLE) / (n * CAST(sx AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM m
    """,
)
def events_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of purchase spend across users — the standard
    inequality single-number (0 = equal, ->1 = concentrated),
    complementing the Pareto top-decile share. Rank-weighted exact
    integer sums (2*Sum(i*x_i)/(n*Sum(x)) - (n+1)/n) with a
    deterministic (value, user) rank order; ranks come from the
    DISTRIBUTED exact ranker (``operators.ntile.global_row_number``)
    — the user-grain frame grows with the data, so no
    single-partition window touches it."""
    from ..operators.ntile import global_row_number

    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.round(F.col("value") * 1_000_000).cast("decimal(38,0)")
            ).alias("x")
        )
    )
    ranked = global_row_number(
        per_user, [F.col("x"), F.col("user_id")], "i"
    ).select("x", F.col("i").cast("long").alias("i"))
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("x")).alias("six"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(
            (2 * F.col("six")).cast("double")
            / (F.col("n") * F.col("sx").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "events_sankey_step_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS step
      FROM events
    ),
    first3 AS (SELECT * FROM seq WHERE step <= 3),
    trans AS (
      SELECT a.step AS from_step, a.event_type AS from_type,
             b.event_type AS to_type
      FROM first3 a
      JOIN first3 b ON b.user_id = a.user_id AND b.step = a.step + 1
    )
    SELECT CAST(from_step AS BIGINT) AS from_step, from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM trans GROUP BY 1, 2, 3
    """,
)
def events_sankey_step_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-indexed flow (Sankey) counts: what users do 1st -> 2nd ->
    3rd, as (step, from, to) transition volumes — the onboarding-flow
    diagram's data. One rank window per user, a self-join on
    (user, step+1) over the 3-row-per-user frame; unlike the Markov
    matrix (time-homogeneous), this keeps the step index."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("step")
    ).filter(F.col("step") <= 3)
    a = seq.select(
        "user_id",
        F.col("step").alias("from_step"),
        F.col("event_type").alias("from_type"),
    )
    b = seq.select(
        "user_id",
        (F.col("step") - 1).alias("from_step"),
        F.col("event_type").alias("to_type"),
    )
    return (
        a.join(b, ["user_id", "from_step"])
        .groupBy(
            F.col("from_step").cast("long").alias("from_step"),
            "from_type",
            "to_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "events_kaplan_meier",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    origin AS (SELECT user_id, MIN(ts_us) AS o FROM e GROUP BY 1),
    horizon AS (SELECT MAX(ts_us) AS h FROM e),
    ev AS (
      SELECT o.user_id,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts_us > o.o
                      THEN e.ts_us END) AS p
      FROM origin o JOIN e USING (user_id)
      GROUP BY o.user_id
    ),
    subj AS (
      SELECT o.user_id,
             CASE WHEN v.p IS NOT NULL THEN 1 ELSE 0 END AS observed,
             CAST((COALESCE(v.p, hz.h) - o.o) // 86400000000 AS BIGINT)
               AS dur
      FROM origin o JOIN ev v USING (user_id) CROSS JOIN horizon hz
    ),
    days AS (
      SELECT dur AS t,
             SUM(observed) AS d
      FROM subj GROUP BY dur HAVING SUM(observed) > 0
    ),
    risk AS (
      SELECT d1.t, d1.d,
             (SELECT COUNT(*) FROM subj s WHERE s.dur >= d1.t) AS n
      FROM days d1
    ),
    terms AS (
      SELECT t, n, d,
             CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n), 9)
                  AS DECIMAL(24,12)) AS lt
      FROM risk WHERE d < n
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(exp(CAST(SUM(lt) OVER (ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 6) AS survival
    FROM terms
    """,
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: origin =
    each user's first event, event = first later purchase, right-
    censored at the corpus horizon — THE estimator for conversion /
    churn timing under censoring (naive mean time-to-convert is biased
    the moment anyone hasn't converted yet).

    S(t) = prod over event days u <= t of (1 - d_u / n_u). The risk
    sets collapse to one row per distinct event DAY before any ordered
    work, so the cumulative product — computed as exp of a running
    decimal sum of 9-dp-rounded log terms, order-free by construction —
    runs over a <= 31-row frame. Scale shape (r14): ONE events scan and
    ONE user-keyed exchange — the per-user origin is a window min on
    the same partitioning the (user, origin) aggregation then reuses,
    and the corpus horizon is max-of-per-user-max over the persisted
    per-user frame instead of a second full scan; then a day-level
    aggregation and a bounded days x days risk join; no per-user
    ordered scan anywhere."""
    from pyspark.sql import Window

    from ..caching import tracked_persist

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    # origin as a window min: hashpartitioning(user_id) from this one
    # exchange also satisfies the (user_id, o) aggregation below — the
    # former origin-aggregate + join shape exchanged the events table
    # twice and scanned it three times (guide §2.4: two operations
    # keyed the same way share one exchange).
    uw = Window.partitionBy("user_id")
    ev = tracked_persist(
        e.withColumn("o", F.min("ts_us").over(uw))
        .groupBy("user_id", "o")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("o")),
                    F.col("ts_us"),
                )
            ).alias("p"),
            F.max("ts_us").alias("umax"),
        )
    )
    # corpus horizon = max over the per-user maxima (O(users) rows from
    # cache, not a second events scan)
    horizon = ev.agg(F.max("umax").alias("h"))
    subj = ev.crossJoin(F.broadcast(horizon)).select(
        F.col("p").isNotNull().cast("int").alias("observed"),
        (
            (F.coalesce(F.col("p"), F.col("h")) - F.col("o"))
            / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("dur"),
    )
    days = (
        subj.groupBy(F.col("dur").alias("t"))
        .agg(F.sum("observed").alias("d"))
        .filter(F.col("d") > 0)
    )
    # risk set per event day: bounded days × durations join (≤31 rows
    # on the left), aggregated to counts
    risk = (
        days.join(subj, subj.dur >= days.t)
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    terms = risk.filter(F.col("d") < F.col("n")).select(
        "t",
        "n",
        "d",
        F.round(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n")), 9
        )
        .cast("decimal(24,12)")
        .alias("lt"),
    )
    w = Window.orderBy("t").rowsBetween(  # bounded-window: input is the aggregated per-event-day frame (≤ calendar days of the corpus)
        Window.unboundedPreceding, 0
    )
    return terms.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round(F.exp(F.sum("lt").over(w).cast("double")), 6).alias(
            "survival"
        ),
    )


_IVO_H = 3_600_000_000  # 1-hour candidate buckets (µs)


@register(
    "events_interval_overlap_join",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP))
               + CAST(round(value) AS BIGINT) * 60000000 AS e
      FROM events
    ),
    a AS (SELECT * FROM iv WHERE event_id % 2 = 1),
    b AS (SELECT * FROM iv WHERE event_id % 2 = 0)
    SELECT a.user_id,
           a.event_id AS a_event_id,
           b.event_id AS b_event_id,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT)
             AS overlap_us
    FROM a JOIN b
      ON a.user_id = b.user_id
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def events_interval_overlap_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-OVERLAP join (two interval sets, find every overlapping
    pair) — the temporal/genomic join one step harder than the
    point-in-range join: each event becomes the interval
    [ts, ts + value minutes], odd-event intervals join even-event
    intervals of the same user wherever they overlap.

    Scale shape: both sides explode into the 1-hour buckets their
    interval covers, candidates come from a (user, bucket) EQUI-join,
    and a pair spanning several shared buckets is emitted exactly once
    — only in the bucket containing the overlap's START
    (floor(greatest(s_a, s_b) / H)), the standard dedup rule that
    avoids a distinct over the pair set. The oracle is the naive theta
    join, so the bucketed plan is verified to lose and invent
    nothing. Bucket width trades candidate fan-out (long intervals
    explode into more buckets) against per-bucket pair density, same
    knob as the LSH band count."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value")).cast("long") * 60_000_000
        ).alias("e"),
    )
    bucketed = iv.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("s") / _IVO_H).cast("long"),
                (F.col("e") / _IVO_H).cast("long"),
            )
        ).alias("bk"),
    )
    a = bucketed.filter(F.col("event_id") % 2 == 1).select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("a_event_id"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
        "bk",
    )
    b = bucketed.filter(F.col("event_id") % 2 == 0).select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("b_event_id"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        "bk",
    )
    pairs = (
        a.join(b, ["u", "bk"])
        .filter(
            (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
            & (
                (F.greatest("sa", "sb") / _IVO_H).cast("long")
                == F.col("bk")
            )
        )
        .select(
            F.col("u").alias("user_id"),
            "a_event_id",
            "b_event_id",
            (
                F.least("ea", "eb") - F.greatest("sa", "sb")
            ).cast("long").alias("overlap_us"),
        )
    )
    return pairs


@register(
    "events_bot_regularity",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    g AS (
      SELECT user_id,
             ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS gap
      FROM e
    ),
    m AS (
      SELECT user_id, COUNT(*) AS n_gaps,
             SUM(CAST(gap AS HUGEINT)) AS s,
             SUM(CAST(gap AS HUGEINT) * gap) AS ss
      FROM g WHERE gap IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(s AS DOUBLE) / n_gaps AS mean_gap_us,
           (n_gaps * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS cv2,
           CAST(CASE WHEN n_gaps >= 20 AND
                  (n_gaps * CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    < 0.05 * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                THEN 1 ELSE 0 END AS INTEGER) AS is_bot
    FROM m
    """,
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot / automation detection by inter-arrival regularity: per
    user, the squared coefficient of variation of the gaps between
    consecutive events — genuine humans are bursty (cv² ≈ 1 for a
    Poisson process, higher with sessions), schedulers and scrapers
    are metronomic (cv² → 0). A training-data pipeline runs this
    before trusting user-generated text: content from near-periodic
    accounts is machine-emitted. Flag = ≥ 20 gaps AND cv² < 0.05.

    Determinism: gap moments accumulate as DECIMAL/HUGEINT integers
    (µs gaps squared overflow a 64-bit long at production event
    volumes); cv² is one fixed-order double expression of those exact
    integers, and the flag compares the SAME doubles on both engines.
    Scale shape: one lag window PARTITIONED BY user (bounded per
    user), then a map-side-combined per-user aggregation — no global
    sort, no unbounded state."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = e.select(
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(19,0)")
    m = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(gd).alias("s"),
        F.sum(gd * gd).alias("ss"),
    )
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    num = F.col("n_gaps") * ssd - sd * sd
    return m.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        (sd / F.col("n_gaps")).alias("mean_gap_us"),
        (num / (sd * sd)).alias("cv2"),
        F.when(
            (F.col("n_gaps") >= 20) & (num < 0.05 * sd * sd), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("is_bot"),
    )


@register(
    "events_variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k')
                AS BIGINT)) AS BIGINT) AS k_distinct,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured stats through Spark 4's VARIANT type: the JSON
    payload parses ONCE into the binary variant encoding
    (``parse_json``) and fields are extracted with typed
    ``variant_get`` paths — the schema-flexible sibling of
    ``events_json_props_rollup``'s fixed-schema ``from_json``. At
    100 TB this is the difference that matters: variant shreds into a
    columnar binary form at write time (no re-tokenizing the JSON text
    per query, no schema declared up front), extraction is a codegen'd
    path lookup, and NEW payload keys arrive without a migration.
    Plan shape: parse + extract fuse into the scan projection; one
    (type, partials) aggregation shuffle; the distinct-count is the
    only expansion and is keyed by (type, k) — bounded by the true
    cardinality."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("k_distinct"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
        )
    )
