"""Batch event-stream analytics over `events` (VERDICT r9 #7 split:
this file carries the BATCH sub-family; the Structured-Streaming drains
and their staging harness live in events_streaming, with events_ops as
the compatibility aggregator). All hash-verified against the oracle.
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
    with no single-partition window anywhere in the plan."""
    from ..operators.ntile import exact_ntile

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("now_us"))
    rfm = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "now_us")
        .agg(
            (F.col("now_us") - F.max(F.unix_micros("ts"))).alias("recency_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
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
    runs over a <= 31-row frame. Scale shape: two user-keyed
    aggregations (origin, first purchase) on one partitioning, a
    day-level aggregation, and a bounded days x days risk join; no
    per-user ordered scan anywhere."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    origin = e.groupBy("user_id").agg(F.min("ts_us").alias("o"))
    horizon = e.agg(F.max("ts_us").alias("h"))
    ev = (
        origin.join(e, "user_id")
        .groupBy("user_id", "o")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("o")),
                    F.col("ts_us"),
                )
            ).alias("p")
        )
    )
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
