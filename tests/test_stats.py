"""Invariant tests for the stats / sketch operators added in round 4 —
properties the DuckDB hash gate can't express (determinism across
partitionings, one-sided error bounds, merge algebra)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_cms_never_undercounts(spark):
    """Count-min's defining guarantee: estimate >= true frequency."""
    from irs_990_efiler_database_spark.queries.sketch_ops import (
        sketch_cms_freq_error,
    )

    rows = sketch_cms_freq_error(spark, SF_DIR).collect()
    assert rows, "probe set should be non-empty"
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.est_n >= r.exact_n for r in rows)


def test_kmv_merge_equals_whole_corpus_sketch(spark):
    """Sketch algebra: bottom-k(merge(synopsis(A), synopsis(B))) ==
    bottom-k(A ∪ B) — the property that lets per-shard synopses answer
    global questions without rescanning."""
    from irs_990_efiler_database_spark.operators.sketch import (
        kmv_bottom_k,
        kmv_merge,
    )

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = 32
    left = kmv_bottom_k(e.filter(F.col("event_id") % 2 == 0), "user_id", k)
    right = kmv_bottom_k(e.filter(F.col("event_id") % 2 == 1), "user_id", k)
    merged = sorted(r.h for r in kmv_merge(k, left, right).collect())
    whole = sorted(r.h for r in kmv_bottom_k(e, "user_id", k).collect())
    assert merged == whole


def test_priority_sample_deterministic_across_partitionings(spark):
    """The weighted sample must select identical rows no matter how
    the input is partitioned — the reason it uses hash uniforms, not
    rand()."""
    from irs_990_efiler_database_spark.queries.stats_ops import (
        sample_weighted_priority,
    )

    base = sample_weighted_priority(spark, SF_DIR)
    picked = {(r.o_orderpriority, r.o_orderkey) for r in base.collect()}
    # re-run over a deliberately different partitioning of the same table
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(13)
    o.createOrReplaceTempView("_orders_repart")
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        + 1
    )
    from pyspark.sql import Window

    keyed = o.select(
        "o_orderpriority",
        "o_orderkey",
        (u.cast("double") / F.col("o_totalprice")).alias("pk"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("pk", "o_orderkey")
    again = {
        (r.o_orderpriority, r.o_orderkey)
        for r in keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .collect()
    }
    assert picked == again
    # per-group size is min(20, group size)
    sizes = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    expected = {r.o_orderpriority: min(20, r["count"]) for r in sizes}
    got: dict[str, int] = {}
    for p, _ in picked:
        got[p] = got.get(p, 0) + 1
    assert got == expected


def test_gap_fill_produces_dense_calendar(spark):
    """Every user's output covers every day from first to last with no
    holes, and the filled value is never NULL (day 1 is observed by
    construction)."""
    import datetime

    from irs_990_efiler_database_spark.queries.stats_ops import (
        events_gap_fill_ffill,
    )

    rows = events_gap_fill_ffill(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list[str]] = {}
    for r in rows:
        assert r.val_filled is not None
        by_user.setdefault(r.user_id, []).append(r.day)
    for days in by_user.values():
        ds = sorted(datetime.date.fromisoformat(d) for d in days)
        span = (ds[-1] - ds[0]).days + 1
        assert len(ds) == span, "calendar must be dense"
        assert len(set(ds)) == len(ds), "no duplicate days"


def test_chi2_nonnegative_and_dof(spark):
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_chi2_independence,
    )

    row = stat_chi2_independence(spark, SF_DIR).collect()[0]
    assert row.chi2 >= 0.0
    assert row.dof >= 1


def test_corr_bounded(spark):
    from irs_990_efiler_database_spark.queries.stats_ops import (
        stat_corr_pairs,
    )

    for r in stat_corr_pairs(spark, SF_DIR).collect():
        for c in ("corr_qty_price", "corr_qty_disc", "corr_price_disc"):
            assert -1.0 <= r[c] <= 1.0


def test_pagerank_mass_and_convergence_shape(spark):
    """Fixed-point PageRank sanity: every node retains rank >= the
    teleport base, and high-degree nodes outrank the minimum."""
    from irs_990_efiler_database_spark.queries.graph_ops import (
        _BASE,
        graph_pagerank_5iter,
    )

    rows = graph_pagerank_5iter(spark, SF_DIR).collect()
    assert rows
    assert all(r.pr >= _BASE for r in rows)
    assert max(r.pr for r in rows) > min(r.pr for r in rows)
