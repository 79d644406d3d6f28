"""Similarity-search operators over `embeddings` (north-star surface).

Brute-force cosine is the correctness baseline; the LSH-bucketed scale
path lives in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "sim_vector_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,15))) AS DOUBLE)), 6) AS l2_norm,
           CAST(COUNT(*) AS BIGINT) AS dim
    FROM (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    GROUP BY vec_id
    """,
)
def sim_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms via explode + exact decimal sum-of-squares (order-safe
    for hash comparison; per-element double products are deterministic)."""
    e = load_table(spark, sf_dir, "embeddings")
    x = F.explode("embedding").alias("x")
    ex = e.select("vec_id", x).select(
        "vec_id", (F.col("x").cast("double") * F.col("x").cast("double")).alias("xx")
    )
    return ex.groupBy("vec_id").agg(
        F.round(F.sqrt(F.sum(F.col("xx").cast("decimal(30,15)")).cast("double")), 6).alias(
            "l2_norm"
        ),
        F.count(F.lit(1)).alias("dim"),
    )


@register(
    "sim_explode_embedding",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
           CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    WHERE vec_id <= 20
    """,
)
def sim_explode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the vector column (SURVEY §2.9 explode surface on
    array<float>)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), F.col("val").cast("double").alias("val"))
