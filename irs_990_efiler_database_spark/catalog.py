"""Parquet table catalog for the synthetic star schema (TESTDATA.md).

At 100 TB the same tables would be partitioned parquet/iceberg paths; this
catalog keeps path resolution in one place so queries never hardcode file
layout, and registers temp views so the DataFrame and SQL surfaces see the
same names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    # parquet reader rejects. The tuned session factory sets nanosAsLong
    # up front (session.py); for caller-provided vanilla sessions (the
    # driver's) fall back to setting it here, guarded so an already-
    # configured session is never mutated.
    if (
        name == "events"
        and spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true"
    ):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ,
    # which functions like unix_micros() reject. The session timezone is
    # pinned to UTC (session.py), so casting NTZ -> TIMESTAMP preserves
    # every value while restoring the full timestamp function surface.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view (idempotent) for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
