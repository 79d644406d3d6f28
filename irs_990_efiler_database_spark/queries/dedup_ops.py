"""Deduplication operators over `documents` (north-star surface).

Exact dedup is a hash-groupBy; fuzzy variants (MinHash-LSH, SimHash,
n-gram Jaccard) live in ``operators.dedup`` and are surfaced here with
engine-portable hashing (md5) so a DuckDB oracle can verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

_NORM = lambda c: F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))  # noqa: E731


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS group_size
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: normalized-text hash → min-id
    representative. Scale: one shuffle on the 16-byte digest."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(_NORM("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


@register(
    "dedup_exact_keep",
    oracle="""
    SELECT COUNT(*) AS n_kept
    FROM (
      SELECT MIN(doc_id)
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    )
    """,
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving-document count after exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(_NORM("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep"))
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
