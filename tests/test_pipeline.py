"""Pipeline runner: DAG order, incremental skip, and surgical rebuild
when one mid-DAG step's version bumps."""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import functions as F

from irs_990_efiler_database_spark.catalog import load_table
from irs_990_efiler_database_spark.plans.pipeline import (
    Step,
    read_step,
    run_pipeline,
)

SF = "/root/testdata/sf0.001"


def _steps(version_mid: str = "1"):
    def docs(spark, inputs):
        return load_table(spark, SF, "documents").select(
            "doc_id", "text", "source"
        )

    def quality(spark, inputs):
        d = inputs["raw_docs"]
        toks = F.size(F.split(F.trim("text"), r"\s+"))
        return d.filter(toks >= 20).select("doc_id", "text", "source")

    def stats(spark, inputs):
        return (
            inputs["quality_docs"]
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        )

    return {
        "raw_docs": Step(fn=docs),
        "quality_docs": Step(
            fn=quality, depends=("raw_docs",), version=version_mid
        ),
        "source_stats": Step(fn=stats, depends=("quality_docs",)),
    }


def _mtimes(path: str) -> dict[str, int]:
    return {
        str(f): f.stat().st_mtime_ns
        for f in Path(path).rglob("*.parquet")
    }


def test_pipeline_builds_skips_and_rebuilds_surgically(spark, tmp_path):
    out = str(tmp_path / "wh")
    r1 = run_pipeline(spark, out, _steps())
    assert r1.built == ["raw_docs", "quality_docs", "source_stats"]
    assert r1.skipped == []
    n_q = read_step(spark, out, "quality_docs").count()
    assert 0 < n_q <= read_step(spark, out, "raw_docs").count()
    got = {
        r["source"]: r["n_docs"]
        for r in read_step(spark, out, "source_stats").collect()
    }
    assert sum(got.values()) == n_q

    # unchanged re-run: everything skipped, nothing rewritten
    pre = _mtimes(out)
    time.sleep(0.05)
    r2 = run_pipeline(spark, out, _steps())
    assert r2.built == [] and set(r2.skipped) == set(r1.built)
    assert _mtimes(out) == pre

    # version-bump the MIDDLE step: it and its descendant rebuild,
    # the upstream table is untouched on disk
    pre_raw = _mtimes(str(Path(out) / "raw_docs"))
    r3 = run_pipeline(spark, out, _steps(version_mid="2"))
    assert r3.built == ["quality_docs", "source_stats"]
    assert r3.skipped == ["raw_docs"]
    assert _mtimes(str(Path(out) / "raw_docs")) == pre_raw


def test_result_cache_hits_on_plan_equivalence(spark, tmp_path):
    """Same logical plan (even via different construction order) must
    share one cache entry; a genuinely different query must miss; a
    hit must not rewrite the cached files."""
    from irs_990_efiler_database_spark.plans.result_cache import (
        cached_run,
        plan_fingerprint,
    )

    cache = str(tmp_path / "qcache")
    o = load_table(spark, SF, "orders")
    q1 = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    r1, hit1 = cached_run(spark, q1, cache)
    assert not hit1
    want = {r["o_orderpriority"]: r["n"] for r in r1.collect()}

    # an equivalent plan built independently — same fingerprint
    q2 = load_table(spark, SF, "orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert plan_fingerprint(q1) == plan_fingerprint(q2)
    pre = _mtimes(cache)
    time.sleep(0.05)
    r2, hit2 = cached_run(spark, q2, cache)
    assert hit2
    assert {r["o_orderpriority"]: r["n"] for r in r2.collect()} == want
    assert _mtimes(cache) == pre  # hit rewrote nothing

    # a different query misses and gets its own entry
    q3 = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    _, hit3 = cached_run(spark, q3, cache)
    assert not hit3
    assert plan_fingerprint(q3) != plan_fingerprint(q1)
