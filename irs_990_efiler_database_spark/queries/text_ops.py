"""Text-analysis operators over the `documents` table (north-star
training-data-pipeline surface): token counting, quality scoring,
fingerprinting, language-ID. All native Column expressions (codegen'd);
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(length(text) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')) AS chars_per_token
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + chars/token ratio (quality signal)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (F.length("text").cast("double") / toks).alias("chars_per_token"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           round(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS space_ratio,
           CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 20 AND 1000
                THEN 1 ELSE 0 END AS len_ok
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: space density + length gate —
    the shape of a pretraining quality filter."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    spaces = F.length(F.regexp_replace("text", "[^ ]", "")).cast("double")
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.round(spaces / F.length("text"), 6).alias("space_ratio"),
        F.when(toks.between(20, 1000), 1).otherwise(0).alias("len_ok"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercased
    text (portable across engines, unlike murmur3)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return d.select("doc_id", F.md5(norm).alias("fp"))
