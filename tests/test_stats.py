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


def test_prefix_filter_exact_recall_superset_of_lsh(spark):
    """Prefix filtering guarantees NO false negatives at the same
    threshold, so its pair set must contain every pair the
    probabilistic MinHash-LSH path reports (LSH can only miss)."""
    from irs_990_efiler_database_spark.queries.dedup_ops import (
        _augmented,
        fdedup_minhash_pairs,
    )
    from irs_990_efiler_database_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    exact = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(
            _augmented(spark, SF_DIR), token_mode="char5"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in fdedup_minhash_pairs(spark, SF_DIR).collect()
    }
    assert lsh <= exact
    # the planted near-copies must all be recalled by the exact path
    planted = {p for p in exact if p[1] == p[0] + 1_000_000}
    assert len(planted) == min(25, len({p[0] for p in planted}) or 25)


def test_triangle_count_matches_bruteforce(spark):
    """Cross-check the ordered two-path triangle count against a
    driver-side brute force over the (small) sf0.001 edge set."""
    from itertools import combinations

    from irs_990_efiler_database_spark.queries.graph_ops import (
        graph_triangle_count,
    )

    row = graph_triangle_count(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    baskets: dict[int, set[int]] = {}
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    pair_counts: Counter = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] += 1
    edges = {p for p, c in pair_counts.items() if c >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    brute = sum(
        1
        for a, nbrs in adj.items()
        for b in nbrs
        for c in adj.get(b, ())
        if c in nbrs
    )
    assert row.n_edges == len(edges)
    assert row.n_triangles == brute
