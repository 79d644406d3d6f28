"""Event-stream operators over `events`. Batch-expressible windowed
aggregations here (hash-verified vs the oracle); the true Structured
Streaming path (watermarks, availableNow) lives in ``streaming`` and is
exercised by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
