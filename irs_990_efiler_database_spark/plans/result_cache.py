"""Materialized query-result cache keyed by the CANONICALIZED logical
plan.

``df.persist()`` only lives for one session; at 100 TB the expensive
thing is recomputing the same heavy aggregate every morning in a NEW
session. This cache fingerprints the optimizer's canonicalized plan
(expression IDs normalized, so two syntactically different but
plan-identical queries share a key), materializes the result once as
parquet, and serves every later run — same session or not — as a scan.
Invalidation is the fingerprint itself: any change to the query OR to
the source paths/schema changes the canonical plan and misses the
cache. (Changed *contents* under an unchanged path are deliberately
out of scope — pair with the snapshot sink's versioned paths when
content-addressing matters.)
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def plan_fingerprint(df: DataFrame) -> str:
    """Stable key for a DataFrame's logical plan: sha256 over the
    canonicalized optimized plan (expr IDs normalized driver-side)."""
    canon = (
        df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    )
    return hashlib.sha256(canon.encode()).hexdigest()[:32]


def cached_run(
    spark: SparkSession, df: DataFrame, cache_dir: str
) -> tuple[DataFrame, bool]:
    """Return (result frame, hit). On miss, materialize ``df`` to
    ``cache_dir/<fingerprint>`` (with a _SUCCESS-gated directory, so a
    torn write is a miss, never a wrong answer) and read it back; on
    hit, just scan the cached parquet."""
    fp = plan_fingerprint(df)
    out = Path(cache_dir) / fp
    if (out / "_SUCCESS").exists():
        return spark.read.parquet(str(out)), True
    df.write.mode("overwrite").parquet(str(out))
    return spark.read.parquet(str(out)), False
