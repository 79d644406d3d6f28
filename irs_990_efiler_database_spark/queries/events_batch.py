"""Batch event-stream analytics over `events` (VERDICT r9 #7 split:
this file carries the CORE batch sub-family — windowing,
sessionization, as-of joins, funnels, journeys, cohorts; the
rolling/trend/statistics sub-family moved to events_trends in round
11, and the Structured-Streaming drains + staging harness live in
events_streaming, with events_ops as the compatibility aggregator).
All hash-verified against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register



@register(
    "events_tumbling_5min",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation via F.window (same operator the
    streaming path uses with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


_SLIDING_ORACLE = """
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT event_type, value,
             time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               - k * INTERVAL '5 minutes' AS ws
      FROM events, (SELECT UNNEST([0, 1]) AS k) ks
    )
    GROUP BY 1, 2
    """


@register("events_sliding_10x5", oracle=_SLIDING_ORACLE)
def events_sliding_10x5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (10-minute window, 5-minute slide):
    every event belongs to exactly window/slide = 2 epoch-aligned
    windows. The oracle reconstructs Spark's window assignment
    arithmetically (each event joined to offsets {0,1} of its 5-minute
    bucket), so the slide semantics themselves are under the hash
    gate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_asof_last_purchase",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events
    ),
    clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
    purch AS (SELECT user_id, ts_us, value FROM e WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts_us,
           p.ts_us AS asof_ts_us, p.value AS asof_value
    FROM clicks c
    ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
    """,
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the same user's most recent
    purchase at or before it (union + window implementation — one
    shuffle on user_id, no range join; oracle is DuckDB's native
    ASOF JOIN, so two entirely different algorithms must agree)."""
    from ..operators.joins import asof_join

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "value"
    )
    return asof_join(
        clicks, purchases, keys=["user_id"], ts_col="ts_us", payload_cols=["value"]
    )


@register(
    "events_sessionize_gap",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                  OR ts_us - LAG(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), sess AS (
      SELECT user_id, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap → new session (window
    lag + running sum), then events per session.

    The gap is compared in epoch MICROSECONDS on both sides: the
    parquet ts is ns-precision and both engines truncate ns→µs on
    cast, so µs arithmetic is the finest granularity that is
    deterministic across engines — a seconds-granularity comparison
    (or an ambiguous LAG over a shadowing ts alias) can disagree at
    session-boundary events."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > 1_800_000_000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(wsum).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "events_hypertable_rollup",
    oracle="""
    SELECT
      CASE WHEN GROUPING(h) = 0 AND GROUPING(d) = 0 THEN 'hour'
           WHEN GROUPING(d) = 0 THEN 'day'
           ELSE 'total' END AS grain,
      strftime(coalesce(h, d, TIMESTAMP '1970-01-01 00:00:00'),
               '%Y-%m-%d %H:%M:%S') AS bucket,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT event_type, value,
             time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
             time_bucket(INTERVAL '1 day',  CAST(ts AS TIMESTAMP)) AS d
      FROM events
    )
    GROUP BY GROUPING SETS ((h, d, event_type), (d, event_type), (event_type))
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour, day, and
    total grains for every event type in ONE pass — GROUPING SETS over
    pre-computed time buckets, so the scan happens once and partial
    aggregation combines map-side for all three grains. At 100 TB this
    replaces three separate windowed aggregations with one shuffle."""
    e = load_table(spark, sf_dir, "events")
    bucketed = e.select(
        "event_type",
        "value",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
    )
    # grouping() is only defined inside the aggregate projection, so
    # the grain label is emitted as an aggregate-list expression
    grain = (
        F.when(
            (F.grouping("h") == 0) & (F.grouping("d") == 0), F.lit("hour")
        )
        .when(F.grouping("d") == 0, F.lit("day"))
        .otherwise(F.lit("total"))
    )
    rolled = bucketed.groupingSets(
        [["h", "d", "event_type"], ["d", "event_type"], ["event_type"]],
        "h",
        "d",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        grain.alias("grain"),
    )
    return rolled.select(
        "grain",
        F.date_format(
            F.coalesce("h", "d", F.lit("1970-01-01 00:00:00").cast("timestamp")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("bucket"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "events_asof_next_error",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    err AS (SELECT * FROM events WHERE event_type = 'error')
    SELECT p.event_id, p.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
           (SELECT e.event_id FROM err e
             WHERE e.user_id = p.user_id AND e.ts >= p.ts
             ORDER BY e.ts, e.event_id LIMIT 1) AS next_error_id,
           (SELECT epoch_us(CAST(e.ts AS TIMESTAMP)) FROM err e
             WHERE e.user_id = p.user_id AND e.ts >= p.ts
             ORDER BY e.ts, e.event_id LIMIT 1) AS next_error_us
    FROM p
    """,
)
def events_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched with the user's
    earliest error event at or after it (operators.joins.
    asof_join_forward — union+window, one shuffle, no range join).
    The oracle is the per-row ORDER BY ts LIMIT 1 subquery the window
    replaces; ties broken by event_id on both sides."""
    from ..operators.joins import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    out = asof_join_forward(p, e, ["user_id"], "ts", ["err_id"], tie_col="err_id")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_err_id").alias("next_error_id"),
        F.unix_micros("asof_ts").alias("next_error_us"),
    )


@register(
    "events_funnel_view_to_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           epoch_us(CAST(v.first_view AS TIMESTAMP)) AS first_view_us,
           epoch_us(CAST(p.first_purchase AS TIMESTAMP)) AS first_purchase_us,
           CASE WHEN p.user_id IS NULL THEN FALSE ELSE TRUE END AS converted,
           CASE WHEN p.user_id IS NULL THEN CAST(NULL AS BIGINT)
                ELSE epoch_us(CAST(p.first_purchase AS TIMESTAMP))
                     - epoch_us(CAST(v.first_view AS TIMESTAMP))
           END AS us_to_convert
    FROM v LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel analysis: per user, the first view and the
    first purchase AT OR AFTER it, with conversion flag and
    time-to-convert. Two grouped aggregations + one left join, all on
    the user key — a single shuffle partitioning reused across every
    stage."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("first_view").alias("first_view_us"),
            F.unix_micros("first_purchase").alias("first_purchase_us"),
            F.col("first_purchase").isNotNull().alias("converted"),
            F.when(
                F.col("first_purchase").isNotNull(),
                F.unix_micros("first_purchase") - F.unix_micros("first_view"),
            ).alias("us_to_convert"),
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP)) / 604800.0) AS BIGINT)
               AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(floor(epoch(CAST(e.ts AS TIMESTAMP)) / 604800.0) AS BIGINT)
             - f.cohort_week AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users bucketed by the epoch-week
    of their first event; each (cohort, week offset) cell counts the
    distinct users still active — the canonical product-analytics
    rollup. Two aggregations on the user key, then one small
    distinct-count shuffle on the (cohort, offset) pair."""
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800.0).cast("long")  # noqa: E731
    f = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    return (
        ev.join(f, "user_id")
        .groupBy(
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_asof_nearest_error",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    err AS (SELECT * FROM events WHERE event_type = 'error')
    SELECT p.event_id, p.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
           (SELECT e.event_id FROM err e WHERE e.user_id = p.user_id
             ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                          - epoch_us(CAST(p.ts AS TIMESTAMP))),
                      e.ts, e.event_id LIMIT 1) AS nearest_error_id,
           (SELECT abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                       - epoch_us(CAST(p.ts AS TIMESTAMP)))
             FROM err e WHERE e.user_id = p.user_id
             ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                          - epoch_us(CAST(p.ts AS TIMESTAMP))),
                      e.ts, e.event_id LIMIT 1) AS us_apart
    FROM p
    """,
)
def events_asof_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of: each purchase matched to the closest
    error of the same user in EITHER direction — composed from the
    backward and forward as-of joins (two single-shuffle window passes)
    plus a row-local pick of the smaller delta; ties prefer the earlier
    (backward) side, matching the oracle's ORDER BY abs, ts."""
    from ..operators.joins import asof_join, asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    # tie_col pins equal-timestamp error picks to the lowest err_id —
    # the oracle's ORDER BY abs, ts, event_id; without it a testdata
    # regen with duplicate (user_id, ts) errors flaps the hash gate
    back = asof_join(
        p, e, ["user_id"], "ts", ["err_id"], prefix="b_", tie_col="err_id"
    )
    both = asof_join_forward(
        back, e, ["user_id"], "ts", ["err_id"], tie_col="err_id", prefix="f_"
    )
    d_b = F.unix_micros("ts") - F.unix_micros("b_ts")
    d_f = F.unix_micros("f_ts") - F.unix_micros("ts")
    pick_b = F.col("f_err_id").isNull() | (
        F.col("b_err_id").isNotNull() & (d_b <= d_f)
    )
    return both.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(pick_b, F.col("b_err_id"))
        .otherwise(F.col("f_err_id"))
        .alias("nearest_error_id"),
        F.when(pick_b & F.col("b_err_id").isNotNull(), d_b)
        .otherwise(F.when(~pick_b, d_f))
        .alias("us_apart"),
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
           CAST(SUM(next_us - ts_us) AS BIGINT) AS span_us,
           round(CAST(SUM(CAST(value * (next_us - ts_us)
                              AS DECIMAL(30,6))) AS DOUBLE)
                 / SUM(next_us - ts_us), 6) AS twa_value
    FROM seq
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregular samples (the TimescaleDB
    `time_weight` hyperfunction): each reading holds until the next
    one, so the average weights each value by its holding interval —
    the honest aggregate for sensor/price/state feeds where a plain
    AVG over-counts bursts. One shuffle on the user key (lead window +
    grouped sum share it); interval-weighted products accumulate as
    DECIMAL so the division is order-free. Users with a single event
    have no holding interval and drop out, mirrored by the oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dur = F.col("next_us") - F.col("ts_us")
    return seq.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_events"),
        F.sum(dur).cast("long").alias("span_us"),
        F.round(
            F.sum((F.col("value") * dur).cast("decimal(30,6)")).cast("double")
            / F.sum(dur),
            6,
        ).alias("twa_value"),
    )


@register(
    "events_json_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.k')
                IS NULL) AS BIGINT) AS n_bad
    FROM events
    GROUP BY event_type
    """,
)
def events_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema-on-read: the JSON ``props`` payload is
    parsed in-plan (``from_json`` with an explicit schema — JVM-side,
    codegen'd, no Python) and aggregated per event type; rows whose
    JSON lacks the field count as bad instead of failing the scan.
    The 100 TB shape: JSON parsing is a pure projection fused into the
    scan stage, one aggregation shuffle of (type, partials)."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(
        "props", T.StructType([T.StructField("k", T.LongType())])
    )["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.max("k").cast("long").alias("k_max"),
            F.sum(F.col("k").isNull().cast("long")).cast("long").alias("n_bad"),
        )
    )


@register(
    "events_top_types_per_day",
    oracle="""
    SELECT day, event_type, n, rk FROM (
      SELECT day, event_type, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY n DESC, event_type) AS BIGINT) AS rk
      FROM (
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
      )
    ) WHERE rk <= 3
    """,
)
def events_top_types_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k over an aggregate (the 'top N per group' report):
    daily event-type counts ranked per day, top 3 kept. Scale shape:
    the aggregation shrinks the data to |days × types| rows BEFORE the
    rank window, so the window partition is bounded regardless of
    event volume — never rank the raw stream."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "events_sequence_view_click_purchase",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    vc AS (
      SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts,
             (SELECT c.event_id FROM c
               WHERE c.user_id = v.user_id AND c.ts >= v.ts
               ORDER BY c.ts, c.event_id LIMIT 1) AS click_id,
             (SELECT c.ts FROM c
               WHERE c.user_id = v.user_id AND c.ts >= v.ts
               ORDER BY c.ts, c.event_id LIMIT 1) AS click_ts
      FROM v
    )
    SELECT view_id, user_id,
           epoch_us(CAST(view_ts AS TIMESTAMP)) AS view_us,
           click_id,
           (SELECT p.event_id FROM p
             WHERE p.user_id = vc.user_id AND p.ts >= vc.click_ts
             ORDER BY p.ts, p.event_id LIMIT 1) AS purchase_id
    FROM vc
    WHERE click_id IS NOT NULL
      AND epoch_us(CAST(click_ts AS TIMESTAMP))
          - epoch_us(CAST(view_ts AS TIMESTAMP)) <= 3600000000
    """,
)
def events_sequence_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered sequence matching (MATCH_RECOGNIZE-lite): for every
    view, the user's next click within one hour, then the next
    purchase at or after that click — strict event-order pattern
    v → c → p composed from two forward as-of joins. Each join is one
    union+window pass on the user key (the same single-shuffle shape
    as the as-of family), so an n-step pattern costs n window passes,
    never n self-joins of the raw stream."""
    from ..operators.joins import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    vc = asof_join_forward(
        v, c, ["user_id"], "ts", ["click_id"], tie_col="click_id", prefix="c_"
    ).filter(
        F.col("c_click_id").isNotNull()
        & (F.unix_micros("c_ts") - F.unix_micros("ts") <= 3_600_000_000)
    )
    # second hop keys off the CLICK time: re-enter the as-of machinery
    # with ts = click_ts, carrying the view columns through
    hop2_left = vc.select(
        "view_id",
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("c_click_id").alias("click_id"),
        F.col("c_ts").alias("ts"),
    )
    out = asof_join_forward(
        hop2_left, p, ["user_id"], "ts", ["purchase_id"],
        tie_col="purchase_id", prefix="p_",
    )
    return out.select(
        "view_id",
        "user_id",
        F.unix_micros("view_ts").alias("view_us"),
        "click_id",
        F.col("p_purchase_id").alias("purchase_id"),
    )


@register(
    "events_user_journey",
    oracle="""
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           array_to_string(steps[1:10], '>') AS journey
    FROM (
      SELECT user_id, COUNT(*) AS n,
             list(event_type ORDER BY ts, event_id) AS steps
      FROM events
      GROUP BY user_id
    )
    WHERE user_id < 200
    """,
)
def events_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey extraction: each user's first 10 events as an
    ordered 'view>click>purchase…' path string. collect_list order is
    shuffle-dependent, so the events collect as (ts, event_id, type)
    STRUCTS and ``array_sort`` imposes the total order inside the row
    — the deterministic idiom for order-sensitive aggregation (the
    oracle uses DuckDB's ORDER BY-qualified list() instead; both must
    agree exactly). One shuffle on the user key; the payload is
    bounded by the journey cap."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    steps = F.transform(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("us"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("et"),
                    )
                )
            ),
            1,
            10,
        ),
        lambda s: s["et"],
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(steps, ">").alias("journey"),
    )


@register(
    "events_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d') AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             user_id
      FROM events
    )
    SELECT d.day,
           CAST(COUNT(*) FILTER (WHERE f.first_day = d.day) AS BIGINT)
             AS n_new,
           CAST(COUNT(*) FILTER (WHERE f.first_day <> d.day) AS BIGINT)
             AS n_returning
    FROM daily d JOIN firsts f USING (user_id)
    GROUP BY d.day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users — the other canonical
    product-analytics rollup next to cohorts: a user counts as new on
    the day of their first-ever event, returning on any later active
    day. Two aggregations on the user key share one partitioning; the
    final (day) rollup shuffles |days × users-active| rows at most."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    firsts = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day")
    )
    daily = ev.select(day.alias("day"), "user_id").distinct()
    j = daily.join(firsts, "user_id")
    return j.groupBy("day").agg(
        F.sum((F.col("first_day") == F.col("day")).cast("long"))
        .cast("long")
        .alias("n_new"),
        F.sum((F.col("first_day") != F.col("day")).cast("long"))
        .cast("long")
        .alias("n_returning"),
    )


@register(
    "events_interval_join_bucketed",
    oracle="""
    WITH promos AS (
      SELECT i AS promo_id,
             epoch_us(TIMESTAMP '2024-01-01 00:00:00')
               + i * 5400000000 AS start_us,
             epoch_us(TIMESTAMP '2024-01-01 00:00:00')
               + i * 5400000000 + 3600000000 AS end_us
      FROM unnest(generate_series(0, 19)) AS t(i)
    )
    SELECT p.promo_id, e.event_id, e.user_id,
           epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us
    FROM events e
    JOIN promos p
      ON epoch_us(CAST(e.ts AS TIMESTAMP)) >= p.start_us
     AND epoch_us(CAST(e.ts AS TIMESTAMP)) < p.end_us
    WHERE e.event_type = 'purchase'
    """,
)
def events_interval_join_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-interval join via TIME-BUCKET BLOCKING — the scalable
    plan for 'which promotion window was this purchase inside': the
    naive theta join (the oracle) is a cartesian filter, O(|events| ×
    |intervals|); here each interval explodes into the hour buckets it
    touches and each event maps to its hour bucket, so the join is an
    EQUI-join on the bucket key (hash join, shuffle on bucket) and the
    residual range predicate only verifies candidates that share a
    bucket. Interval count per bucket bounds the fan-out — the same
    blocking idea as the LSH funnels, keyed on time."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
    hour_us = 3_600_000_000
    promos = spark.range(20).select(
        F.col("id").alias("promo_id"),
        (F.lit(base_us) + F.col("id") * 5_400_000_000).alias("start_us"),
        (F.lit(base_us) + F.col("id") * 5_400_000_000 + hour_us).alias(
            "end_us"
        ),
    )
    # explode each interval into every hour bucket it overlaps
    pb = promos.select(
        "promo_id",
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.floor(F.col("start_us") / hour_us),
                F.floor((F.col("end_us") - 1) / hour_us),
            )
        ).alias("bucket"),
    )
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
    ).withColumn("bucket", F.floor(F.col("ts_us") / hour_us))
    return (
        e.join(pb, "bucket")
        .filter(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") < F.col("end_us"))
        )
        .select("promo_id", "event_id", "user_id", "ts_us")
    )


@register(
    "events_spike_detection",
    oracle="""
    WITH w AS (
      SELECT event_type,
             time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS wstart,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, wstart, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY wstart
                          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
               AS trail_sum,
             COUNT(n) OVER (PARTITION BY event_type ORDER BY wstart
                            ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
               AS trail_n
      FROM w
    )
    SELECT event_type,
           strftime(wstart, '%Y-%m-%d %H:%M:%S') AS win_start,
           n, CAST(trail_sum AS BIGINT) AS trail_sum,
           CAST(trail_n AS BIGINT) AS trail_n
    FROM t
    WHERE trail_n >= 3 AND n * trail_n > 2 * trail_sum
    """,
)
def events_spike_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-spike detection (the alerting query over any event
    feed): per type, 5-minute window counts compared against the
    trailing-6-window mean; a window fires when its count exceeds 2×
    that mean. The comparison is cross-multiplied INTEGERS
    (n·trail_n > 2·trail_sum), so no floating-point mean ever enters
    the predicate — deterministic at any scale. One aggregation
    shrinks the stream to |types × windows| rows BEFORE the trailing
    window runs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "event_type", F.window("ts", "5 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    trail = (
        Window.partitionBy("event_type")
        .orderBy(F.col("w.start"))
        .rowsBetween(-6, -1)
    )
    t = w.select(
        "event_type",
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "n",
        F.sum("n").over(trail).cast("long").alias("trail_sum"),
        F.count("n").over(trail).cast("long").alias("trail_n"),
    )
    return t.filter(
        (F.col("trail_n") >= 3)
        & (F.col("n") * F.col("trail_n") > 2 * F.col("trail_sum"))
    )


@register(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, MIN(d) AS start_day, MAX(d) AS end_day,
             COUNT(*) AS len
      FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           strftime(start_day, '%Y-%m-%d') AS start_day,
           strftime(end_day, '%Y-%m-%d') AS end_day,
           CAST(len AS BIGINT) AS streak_days
    FROM streaks
    WHERE len >= 2
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days
    (streaks ≥ 2) — the classic sessionize-on-a-calendar problem,
    solved with the date-minus-row_number island key (consecutive days
    share it, any gap breaks it). One shuffle on the user key serves
    both the distinct-day collapse and the ranking window; streak
    aggregation reuses the same partitioning."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "island")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("start_day"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 2)
        .drop("island")
    )


@register(
    "events_rfm_segmentation",
    oracle="""
    WITH anchor AS (
      SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS now_us FROM events
      WHERE event_type = 'purchase'
    ),
    rfm AS (
      SELECT e.user_id,
             a.now_us - MAX(epoch_us(CAST(e.ts AS TIMESTAMP))) AS recency_us,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
      FROM events e
      JOIN anchor a ON e.event_type = 'purchase'
      GROUP BY e.user_id, a.now_us
    )
    SELECT user_id, recency_us, CAST(frequency AS BIGINT) AS frequency,
           monetary,
           CAST(NTILE(4) OVER (ORDER BY recency_us, user_id) AS BIGINT) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_quartile
    FROM rfm
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles over
    purchases) — the canonical customer-scoring rollup. The per-user
    aggregation shrinks the stream before the quartile cuts (one row
    per purchasing user; tie-broken by user_id so both engines rank
    identically); monetary sums accumulate as DECIMAL. Each quartile
    is assigned by the DISTRIBUTED exact-ntile operator
    (``operators.ntile.exact_ntile``: range-partitioned local ranks +
    broadcast offsets) — bit-identical to the oracle's global NTILE
    with no single-partition window anywhere in the plan. Scale shape
    (r14): ONE events scan — the recency anchor (corpus max purchase
    ts) is max-of-per-user-max over the persisted O(users) frame, not
    a second full scan + single-partition aggregate of the stream."""
    from ..caching import tracked_persist
    from ..operators.ntile import exact_ntile

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = tracked_persist(
        ev.groupBy("user_id").agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    anchor = per_user.agg(F.max("last_us").alias("now_us"))
    rfm = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.col("now_us") - F.col("last_us")).alias("recency_us"),
        "frequency",
        "monetary",
    )
    out = exact_ntile(rfm, 4, ["recency_us", "user_id"], "r_quartile")
    out = exact_ntile(
        out, 4, [F.col("frequency").desc(), F.col("user_id")], "f_quartile"
    )
    out = exact_ntile(
        out, 4, [F.col("monetary").desc(), F.col("user_id")], "m_quartile"
    )
    return out.select(
        "user_id",
        "recency_us",
        "frequency",
        "monetary",
        "r_quartile",
        "f_quartile",
        "m_quartile",
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, SUM(n) AS row_n FROM t GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
           CAST(t.n AS DOUBLE) / tot.row_n AS p
    FROM t JOIN tot USING (from_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the behavioral-model input: what follows what, with
    row-normalized probabilities). One user-key window pass builds the
    bigrams, the transition counts shrink to |types²| rows before the
    normalizing join, and each probability is one integer-over-integer
    double division — deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = t.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return t.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("row_n")).alias("p"),
    )


@register(
    "events_linear_attribution",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    touch AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             p.user_id
      FROM p JOIN c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND epoch_us(CAST(c.ts AS TIMESTAMP))
           >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 1800000000
    ),
    w AS (
      SELECT purchase_id, click_id, user_id,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n_touch
      FROM touch
    )
    SELECT click_id, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(CAST(round(CAST(1 AS DOUBLE) / n_touch, 12)
                         AS DECIMAL(20,12))) AS DOUBLE) AS credit
    FROM w
    GROUP BY click_id, user_id
    """,
)
def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every click in the 30 minutes
    before a purchase shares the conversion credit equally (1/n each)
    — the multi-touch counterpart of the single-touch as-of
    attribution. The touch join is the watermark-bounded interval
    shape the streaming path uses; credit fractions are
    integer-over-integer double divisions summed per click. Double
    addition order could vary across shuffles, so credits accumulate
    per (click, purchase) list size n — each click's credit sum runs
    over ≤ a handful of terms grouped in one partition, and the oracle
    replays the identical grouping."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
    )
    touch = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") >= F.col("p_us") - 1_800_000_000),
    ).select("purchase_id", "click_id", "user_id")
    from pyspark.sql import Window

    w = Window.partitionBy("purchase_id")
    weighted = touch.withColumn("n_touch", F.count(F.lit(1)).over(w))
    credit_term = F.round(F.lit(1.0) / F.col("n_touch"), 12).cast(
        "decimal(20,12)"
    )
    return weighted.groupBy("click_id", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum(credit_term).cast("double").alias("credit"),
    )


@register(
    "events_burst_users",
    oracle="""
    WITH w AS (
      SELECT user_id,
             time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS m,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS peak_per_min,
           CAST(COUNT(*) AS BIGINT) AS active_minutes,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CASE WHEN MAX(n) >= 5 THEN TRUE ELSE FALSE END AS burst_flag
    FROM w
    GROUP BY user_id
    """,
)
def events_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst/bot detection: per-user peak events-per-minute (plus
    active-minute and total counts), flagged at ≥5/min — the
    rate-limit screen that separates scripted traffic from humans.
    Two aggregations sharing the user partitioning; the minute
    bucketing is pure arithmetic, so the stream shrinks before any
    per-user state accumulates."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "user_id", F.window("ts", "1 minute").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    return w.groupBy("user_id").agg(
        F.max("n").cast("long").alias("peak_per_min"),
        F.count(F.lit(1)).cast("long").alias("active_minutes"),
        F.sum("n").cast("long").alias("total_events"),
        (F.max("n") >= 5).alias("burst_flag"),
    )


@register(
    "events_behavior_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, SUM(n) AS total FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           CAST(tot.total AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           round(CAST(SUM(CAST(round(
             -(CAST(c.n AS DOUBLE) / tot.total)
               * log2(CAST(c.n AS DOUBLE) / tot.total), 12)
             AS DECIMAL(20,12))) AS DOUBLE), 9) AS entropy_bits
    FROM c JOIN tot USING (user_id)
    GROUP BY c.user_id, tot.total
    """,
)
def events_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy (bits) of each user's
    event-type distribution — 0 for single-action users, log2(k) for
    uniform k-type behavior; the feature that separates scripted
    single-purpose traffic from organic use. Probabilities are
    integer-over-integer divisions; each −p·log2 p term rounds to
    12 dp and accumulates as DECIMAL (the engine's rule for float
    sums), then one 9-dp rounded emission."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    term = F.round(-p * F.log2(p), 12).cast("decimal(20,12)")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id", "total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(F.sum(term).cast("double"), 9).alias("entropy_bits"),
        )
        .select(
            "user_id",
            F.col("total").cast("long").alias("n_events"),
            "n_types",
            "entropy_bits",
        )
    )


@register(
    "events_variant_schemaless",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k')
                AS BIGINT)) AS BIGINT) AS k_distinct,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS DOUBLE) / COUNT(*) AS k_mean
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_schemaless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-LESS semi-structured analytics via the Spark 4 VARIANT
    type: ``parse_json`` ingests the payload with no declared struct
    (unlike events_json_props_rollup's from_json), and ``variant_get``
    path-extracts with a target type at query time — the
    open-schema path for payloads whose keys drift across producers.
    Parsing stays a JVM-side projection fused into the scan; the
    binary variant encoding is columnar-shreddable at rest. Mean is
    an exact integer sum over the bigint count (one double division)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("k_distinct"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("k_mean"),
        )
    )


@register(
    "events_peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_id,
             CAST(ts AS TIMESTAMP) AS s,
             LEAST(CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE,
                   CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP)
                     + INTERVAL 1 DAY) AS e
      FROM events
    ),
    pts AS (
      SELECT CAST(s AS DATE) AS day, hour(s) AS hr, s AS t, 1 AS delta,
             event_id FROM iv
      UNION ALL
      SELECT CAST(s AS DATE) AS day, hour(e - INTERVAL 1 MICROSECOND) AS hr,
             e AS t, -1 AS delta, event_id FROM iv
    ),
    hour_tot AS (
      SELECT day, hr, SUM(delta) AS htot FROM pts GROUP BY 1, 2
    ),
    carry AS (
      SELECT day, hr,
             COALESCE(SUM(htot) OVER (PARTITION BY day ORDER BY hr
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS cin
      FROM hour_tot
    ),
    run AS (
      SELECT p.day,
             c.cin + SUM(p.delta) OVER (PARTITION BY p.day, p.hr
                              ORDER BY p.t, p.delta, p.event_id
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts p JOIN carry c ON c.day = p.day AND c.hr = p.hr
    )
    SELECT day AS day_ts, CAST(MAX(conc) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval analytics: peak number of concurrently
    active 5-minute event windows per day — the 'max concurrent
    sessions' staffing/capacity question, computed as +1/-1 endpoint
    deltas with a running sum (the classic O(n log n) sweep, here one
    ordered window per day partition).

    The running sum is HIERARCHICAL (the scalable-prefix-sum shape):
    endpoint deltas aggregate to per-hour totals first, a 24-row
    window per day turns those into carry-in offsets, and the ordered
    sweep runs per (day, hour) — so no window partition ever holds
    more than an hour of endpoints, at any daily volume; nest another
    level (minutes) if an hour is still too hot. Determinism: at equal
    timestamps the -1 endpoint sorts first (half-open intervals never
    overlap at a shared boundary) and event_id breaks residual ties;
    intervals clip at midnight (the -1 endpoint's hour is taken one
    microsecond back so a midnight clip stays in hour 23) so each
    day's sweep is self-contained."""
    e = load_table(spark, sf_dir, "events")
    day_end = F.date_add(F.to_date("ts"), 1).cast("timestamp")
    iv = e.select(
        "event_id",
        F.col("ts").alias("s"),
        F.least(F.col("ts") + F.expr("INTERVAL 5 MINUTES"), day_end).alias(
            "e"
        ),
    )
    pts = iv.select(
        F.to_date("s").alias("day"),
        F.hour("s").alias("hr"),
        F.col("s").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    ).unionAll(
        iv.select(
            F.to_date("s").alias("day"),
            F.hour(F.col("e") - F.expr("INTERVAL 1 MICROSECOND")).alias(
                "hr"
            ),
            F.col("e").alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    hour_tot = pts.groupBy("day", "hr").agg(F.sum("delta").alias("htot"))
    wday = (
        Window.partitionBy("day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = hour_tot.select(
        "day",
        "hr",
        F.coalesce(F.sum("htot").over(wday), F.lit(0)).alias("cin"),
    )
    whr = (
        Window.partitionBy("day", "hr")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.join(carry, ["day", "hr"])
        .select(
            "day", (F.col("cin") + F.sum("delta").over(whr)).alias("conc")
        )
        .groupBy(F.col("day").alias("day_ts"))
        .agg(F.max("conc").cast("long").alias("peak_concurrent"))
    )

