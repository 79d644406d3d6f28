"""Smoke: every registered query runs at sf0.001 and produces a stable
schema; entry() returns rows. The full value-level correctness gate is
tools/check_oracle.py (driver-equivalent, sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _all_queries():
    from irs_990_efiler_database_spark.queries import all_queries

    return all_queries()


def test_registry_nonempty():
    from irs_990_efiler_database_spark.queries import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    assert len(qs) >= 40
    # every oracle key must have a query
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", sorted(_all_queries()))
def test_query_runs(spark, name):
    fn = _all_queries()[name]
    df = fn(spark, SF_SMOKE)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 1


def test_oracle_and_query_names_aligned():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    missing = set(qs) - set(oracles)
    # every query should have an oracle unless deliberately rows-only
    allowed_rows_only: set[str] = set()
    assert missing <= allowed_rows_only, f"queries without oracle: {missing}"


def test_link_prediction_excludes_existing_edges(spark):
    """Predicted links must be non-adjacent pairs: no (u,v) in the
    output may be an edge of the co-purchase graph, and every output
    pair must share >= 2 common neighbors with Jaccard in (0, 1]."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.queries.graph_ops import (
        graph_link_prediction_jaccard,
    )

    sf = "/root/testdata/sf0.01"
    out = graph_link_prediction_jaccard(spark, sf)
    rows = out.collect()
    assert rows, "expected candidate links"
    li = load_table(spark, sf, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    r = b.select("l_orderkey", F.col("l_partkey").alias("pk2"))
    edges = {
        (x["l_partkey"], x["pk2"])
        for x in b.join(r, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pk2"))
        .groupBy("l_partkey", "pk2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    }
    for row in rows:
        assert (row["u"], row["v"]) not in edges
        assert row["common_neighbors"] >= 2
        assert 0.0 < row["jaccard"] <= 1.0


def test_soft_reweight_conserves_cluster_mass(spark):
    """SoftDeDup invariants: singleton weight = 1, every cluster's
    weights sum to exactly 1 document, and every planted near-copy
    shares a cluster with its original (weight <= 0.5)."""
    from collections import defaultdict

    from irs_990_efiler_database_spark.queries.dedup_ops import (
        fdedup_soft_reweight,
    )

    rows = fdedup_soft_reweight(spark, "/root/testdata/sf0.001").collect()
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        assert abs(sum(m["weight"] for m in members) - 1.0) < 1e-9
        for m in members:
            assert m["cluster_size"] == len(members)
    copies = [r for r in rows if r["doc_id"] >= 1_000_000]
    assert copies
    for r in copies:
        assert r["weight"] <= 0.5, f"copy {r['doc_id']} not clustered"


def test_exact_substring_spans_cover_planted_copies(spark):
    """Every doc_id < 25 original is fully contained in its planted
    copy, so its entire normalized text is one duplicated span
    (dup_frac == 1.0 exactly); the copy's duplicated prefix covers
    everything but the appended suffix tail."""
    from irs_990_efiler_database_spark.queries.dedup_ops import (
        fdedup_exact_substring_spans,
    )

    rows = {
        r["doc_id"]: r
        for r in fdedup_exact_substring_spans(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    originals = [r for d, r in rows.items() if d < 25]
    copies = [r for d, r in rows.items() if d >= 1_000_000]
    assert originals and copies
    for r in originals:
        assert r["n_dup_spans"] == 1
        assert r["dup_chars"] == r["n_chars"]
        assert r["dup_frac"] == 1.0
    for r in copies:
        # the copy = original + 27-char suffix; at W=30 the duplicated
        # prefix span reaches to within <30 chars of the suffix start
        assert r["dup_chars"] >= r["n_chars"] - 27 - 30
    for r in rows.values():
        assert 0 <= r["dup_chars"] <= r["n_chars"]
        assert (r["n_dup_spans"] == 0) == (r["dup_chars"] == 0)


def test_kneser_ney_matches_python_reimplementation(spark):
    """Interpolated KN scores must match a from-scratch Python
    implementation of the same formula to float tolerance, and every
    document must report exactly len(tokens)-1 bigrams."""
    import math
    from collections import Counter, defaultdict

    from irs_990_efiler_database_spark.queries.text_ops import (
        text_kneser_ney_bigram_score,
    )

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    cbi = Counter()
    for t in docs.values():
        cbi.update(zip(t, t[1:]))
    ctx, nf, nb = defaultdict(int), defaultdict(int), defaultdict(int)
    for (w1, w2), c in cbi.items():
        ctx[w1] += c
        nf[w1] += 1
        nb[w2] += 1
    tt = len(cbi)
    expect = {}
    for d, t in docs.items():
        lps = [
            round(
                math.log10(
                    (max(cbi[(w1, w2)] - 0.75, 0)
                     + (0.75 * nf[w1]) * (nb[w2] / tt)) / ctx[w1]
                ),
                9,
            )
            for w1, w2 in zip(t, t[1:])
        ]
        expect[d] = (len(lps), sum(lps) / len(lps))
    got = {
        r["doc_id"]: r
        for r in text_kneser_ney_bigram_score(spark, sf).collect()
    }
    assert set(got) == set(expect)
    for d, (n, avg) in expect.items():
        assert got[d]["n_bigrams"] == n
        assert abs(got[d]["avg_kn_logprob"] - avg) < 1e-5
        assert got[d]["avg_kn_logprob"] < 0


def test_personalized_pagerank_concentrates_on_seeds(spark):
    """Teleport mass lands only on the seed set, so seed nodes must
    dominate: mean seed PPR far above mean non-seed PPR, and every
    non-seed score is purely edge-propagated (> 0 in a connected
    symmetric graph, but strictly below the teleport base + inflow of
    a comparable seed)."""
    from irs_990_efiler_database_spark.queries.graph_ops import (
        graph_personalized_pagerank,
    )

    rows = graph_personalized_pagerank(
        spark, "/root/testdata/sf0.001"
    ).collect()
    seeds = [r["ppr"] for r in rows if r["is_seed"] == 1]
    rest = [r["ppr"] for r in rows if r["is_seed"] == 0]
    assert seeds and rest
    assert all(p >= 0 for p in seeds + rest)
    assert sum(seeds) / len(seeds) > 10 * (sum(rest) / len(rest))


def test_cross_split_leakage_finds_planted_copies(spark):
    """The planted near-copies (doc_id d and d+1e6) hash to independent
    splits, so with 25 planted pairs at 90/5/5 some must straddle the
    split: the audit must report at least one is_leak=1 row, and total
    pair mass must cover the planted pairs."""
    from irs_990_efiler_database_spark.queries.dedup_ops import (
        fdedup_cross_split_leakage,
    )

    rows = fdedup_cross_split_leakage(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["n_pairs"] for r in rows) >= 25
    for r in rows:
        assert r["is_leak"] == (1 if r["split_lo"] != r["split_hi"] else 0)
    assert any(r["is_leak"] == 1 for r in rows), "no cross-split pair found"


def test_exact_substring_spans_stride_keeps_long_copy_recall(spark):
    """With stride=3 the window table shrinks ~3x, but the planted
    full-document copies (shared spans far above W+stride-1) must still
    be flagged with near-total coverage."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.queries.dedup_ops import (
        _ESS_W,
        _NORM,
        _augmented,
    )
    from irs_990_efiler_database_spark.operators.dedup import (
        exact_substring_spans,
    )

    norm = _augmented(spark, "/root/testdata/sf0.001").select(
        "doc_id", _NORM(F.col("text")).alias("t")
    )
    rows = {
        r["doc_id"]: r
        for r in exact_substring_spans(norm, _ESS_W, stride=3).collect()
    }
    originals = [r for d, r in rows.items() if d < 25]
    assert originals
    for r in originals:
        # sampled windows cover all but at most (stride-1 + W-1) tail chars
        assert r["dup_chars"] >= r["n_chars"] - (3 - 1) - (_ESS_W - 1)
        assert r["n_dup_spans"] >= 1


def test_kaplan_meier_curve_is_valid_survival_function(spark):
    """KM invariants: survival strictly within (0,1], non-increasing in
    t; risk sets non-increasing; and S(t_k) equals the direct product
    of (1 - d_i/n_i) over the emitted rows to float tolerance."""
    from irs_990_efiler_database_spark.queries.events_ops import (
        events_kaplan_meier,
    )

    rows = sorted(
        events_kaplan_meier(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["t_days"],
    )
    assert rows
    prod = 1.0
    prev_s, prev_n = 1.0 + 1e-9, float("inf")
    for r in rows:
        assert 0 < r["survival"] <= 1
        assert r["survival"] <= prev_s + 1e-9
        assert r["n_risk"] <= prev_n
        assert 0 < r["n_events"] < r["n_risk"]
        prod *= 1.0 - r["n_events"] / r["n_risk"]
        assert abs(r["survival"] - prod) < 1e-4
        prev_s, prev_n = r["survival"], r["n_risk"]


def test_kcore_matches_python_peeling(spark):
    """The 5-round distributed peel must match a from-scratch Python
    peeling of the same symmetric graph, node set AND degrees."""
    from collections import Counter

    from irs_990_efiler_database_spark.queries.graph_ops import (
        _KCORE_K,
        _KCORE_ROUNDS,
        graph_kcore_membership,
    )

    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    e0 = {
        (r[0] * 2, r[1] * 2 + 1)
        for r in li.select("l_partkey", "l_suppkey").distinct().collect()
    }
    edges = e0 | {(b, a) for a, b in e0}
    for _ in range(_KCORE_ROUNDS):
        deg = Counter(a for a, _ in edges)
        keep = {n for n, c in deg.items() if c >= _KCORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    expect = Counter(a for a, _ in edges)
    got = {
        r["node"]: r["core_degree"]
        for r in graph_kcore_membership(spark, sf).collect()
    }
    assert got == dict(expect)
    assert got, "k=20 should leave a non-empty core at sf0.01"


def test_bloom_decontaminate_never_misses_and_bounds_fp(spark):
    """Bloom screening has NO false negatives by construction
    (n_bloom_flagged >= n_true_shared per doc) and the corpus-wide
    false-positive rate at 131k bits / 3 hashes must stay small."""
    from irs_990_efiler_database_spark.queries.text_ops import (
        text_decontaminate_bloom,
    )

    rows = text_decontaminate_bloom(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = sum(r["n_grams"] for r in rows)
    fp = sum(r["n_false_pos"] for r in rows)
    for r in rows:
        assert r["n_bloom_flagged"] >= r["n_true_shared"]
        assert r["n_false_pos"] == r["n_bloom_flagged"] - r["n_true_shared"]
    assert fp / total < 0.05, f"FP rate {fp}/{total} exceeds 5%"
