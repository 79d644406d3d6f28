"""Structured Streaming path over event feeds.

The reference is batch-only (monthly full rebuilds,
BUILD_SCRIPTS/README.md:260); the engine adds the incremental path
SURVEY §2.12 specifies: a file source on a growing directory, event-time
watermarks for late data, and the SAME windowed-aggregation operators
the batch queries use — ``events_tumbling_5min`` batch vs
``tumbling_counts`` streaming produce identical results (asserted by an
availableNow parity test).

At scale this is the monthly-IRS-drop story: new index/XML files land
under a prefix, ``availableNow`` (or a continuous trigger) processes
exactly the new files with checkpointed exactly-once sinks — replacing
the reference's "rebuild everything every few months".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) as long
        T.StructField("value", T.DoubleType()),
        T.StructField("session_hint", T.LongType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet prefix; ns → µs
    timestamps exactly like the batch catalog."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    the batch ``events_tumbling_5min`` query (same grouping, same
    decimal-exact sum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time sessionization via F.session_window (the streaming
    form of the batch lag+running-sum sessionizer)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events")
    )


def run_available_now(
    stream: DataFrame, query_name: str, checkpoint_dir: str
) -> DataFrame:
    """Drain everything currently in the source into an in-memory sink
    (test/backfill mode) and return the result table."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(query_name)
