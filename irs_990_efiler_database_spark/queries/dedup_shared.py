"""Shared synthetic near-dup corpus + MinHash-LSH SQL templates for
the dedup query family (round-11: extracted from dedup_ops so that
dedup_ops and dedup_eval both import them from here with NO circular
module edge — either sub-family module is directly importable in any
order). No @register calls live here; this module is pure helpers.

The oracle templates mirror the Spark operators constant-for-constant
(perm_constants, the 1000-doc hot-bucket cap) so every pair-generating
oracle agrees with cap_hot_buckets BY CONSTRUCTION at any SF."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import MERSENNE31, normalize_text, perm_constants

_NORM = normalize_text

_SUFFIX = " duplicated appendix notice"


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ mutated near-copies of doc_id < 25 (deterministic)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_SUFFIX)).alias("text"),
    )
    return d.unionByName(dups)


_SQL_BASE = f"""
  base AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, concat(text, '{_SUFFIX}')
    FROM documents WHERE doc_id < 25
  ),
  norm AS (
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
    FROM base
  )
"""

_SQL_SHINGLES = """
  sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
             generate_series(1, greatest(len(t) - 4, 1)),
             i -> substring(t, i, 5))) AS sh
    FROM norm
  )
"""

_K = 16
_ROWS = 4
# ONE md5 per shingle (32-bit base hash), then k affine permutations —
# same constants as the Spark builder (operators.dedup.perm_constants).
# The Spark pipeline carries the hashed sets (hs) downstream, so the
# verify stages below compare hs, not shingle strings — both engines
# hash identically, so the comparison stays exact.
_SQL_HASHED = """
  hashed AS (
    SELECT doc_id, sh,
           list_transform(sh,
             s -> CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT)) AS hs
    FROM sh
  )
"""
_SQL_SIG_ELEMS = ", ".join(
    f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
    for a, b in perm_constants(_K)
)
_SQL_SIG = f"""
  {_SQL_HASHED},
  sig AS (
    SELECT doc_id, sh, hs, [{_SQL_SIG_ELEMS}] AS sig FROM hashed
  )
"""

_SQL_BAND_ELEMS = ", ".join(
    f"md5(array_to_string(sig[{i * _ROWS + 1}:{i * _ROWS + _ROWS}], '|'))"
    for i in range(4)
)
_SQL_BANDS = f"""
  bands AS (
    SELECT doc_id,
           generate_subscripts([{_SQL_BAND_ELEMS}], 1) - 1 AS band_idx,
           unnest([{_SQL_BAND_ELEMS}]) AS band_hash
    FROM sig
  ),
  okb AS (
    SELECT band_idx, band_hash FROM bands
    GROUP BY band_idx, band_hash HAVING COUNT(*) <= 1000
  ),
  cbands AS (
    SELECT b.doc_id, b.band_idx, b.band_hash
    FROM bands b JOIN okb USING (band_idx, band_hash)
  )
"""
# cbands models the operator's max_bucket_size=1000 hot-bucket cap, so
# every pair-generating oracle below agrees with cap_hot_buckets BY
# CONSTRUCTION at any SF (an over-cap band drops from both engines).


_SQL_MH_PAIRS = f"""
  cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM cbands a
      JOIN cbands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
      WHERE CAST(list_sum(list_transform(generate_series(1, {_K}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / {_K}.0 >= 0.25
    ),
    mhpairs AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
               / len(list_distinct(x.hs || y.hs)) AS jaccard
      FROM est c
      JOIN hashed x ON x.doc_id = c.id_a
      JOIN hashed y ON y.doc_id = c.id_b
      WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
               / len(list_distinct(x.hs || y.hs)) >= 0.5
    )
"""
