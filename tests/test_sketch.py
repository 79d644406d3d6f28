"""KMV sketch invariants: accuracy, exact-below-k fallback, and
mergeability (the property that makes it a sketch, not a sample)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_kmv_estimate_accuracy(spark):
    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.operators.sketch import (
        kmv_bottom_k,
        kmv_estimate,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    row = kmv_estimate(kmv_bottom_k(li, "l_partkey", 256), 256).collect()[0]
    if exact <= 256:
        assert row["est_distinct"] == float(exact)
    else:
        # k=256 -> relative standard error ~ 1/sqrt(k-2) ~ 6.3%
        assert abs(row["est_distinct"] - exact) / exact < 0.25


def test_kmv_synopsis_merges(spark):
    """bottom_k(A ∪ B) == reduce(bottom_k(A) ∪ bottom_k(B)): the
    synopsis computed over pre-sketched halves equals the synopsis of
    the whole — unions of daily sketches answer the all-time question
    without rescanning."""
    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.operators.sketch import kmv_bottom_k

    k = 64
    li = load_table(spark, SF_SMOKE, "lineitem")
    whole = sorted(r["h"] for r in kmv_bottom_k(li, "l_partkey", k).collect())
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)
    sk_a = kmv_bottom_k(half_a, "l_partkey", k)
    sk_b = kmv_bottom_k(half_b, "l_partkey", k)
    # merging = keep the k smallest distinct of the unioned synopses
    # (values are already hashed, so reduce them directly)
    import numpy as np

    u = np.unique(
        [r["h"] for r in sk_a.collect()] + [r["h"] for r in sk_b.collect()]
    )[:k]
    assert [int(x) for x in u] == whole


def test_hll_distinct_error_bound_and_mergeability(spark):
    """HLL contract: (a) the estimate lands within the published
    ~1.04/sqrt(2^lgk) relative error of the exact distinct count,
    (b) merging per-day sketches equals sketching the union — the
    rollup-without-rescan property that makes HLL the constant-memory
    companion to the exact KMV family."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.operators.sketch import (
        hll_distinct,
        hll_merge_estimate,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.select("user_id").distinct().count()
    est = hll_distinct(ev, "user_id").collect()[0][0]
    tol = 3 * 1.04 / (2**12) ** 0.5  # 3 sigma
    assert abs(est - exact) <= max(2, tol * exact)

    # mergeability: per-day sketches -> union estimate == whole-table estimate
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = hll_merge_estimate(daily, "sk").collect()[0][0]
    assert merged == est


def test_approx_percentile_within_accuracy_contract(spark):
    """Native approx_percentile: with accuracy parameter N the rank
    error is bounded by n/N — checked against the exact discrete
    percentile; and at accuracy >= n the sketch must be EXACT."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.catalog import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_totalprice").alias("v")
    )
    n = o.count()
    exact_sorted = [r["v"] for r in o.orderBy("v").collect()]
    for acc in (100, n):
        got = o.agg(
            F.expr(f"approx_percentile(v, 0.5, {acc})").alias("p")
        ).collect()[0]["p"]
        # rank of the returned value must be within n/acc of the true rank
        import bisect

        rank = bisect.bisect_left(exact_sorted, got)
        assert abs(rank - n * 0.5) <= max(1, n / acc) + 1
    exact_p50 = exact_sorted[(n - 1) // 2]
    got_exact = o.agg(
        F.expr(f"approx_percentile(v, 0.5, {n})").alias("p")
    ).collect()[0]["p"]
    assert abs(got_exact - exact_p50) < 1e-9 or got_exact in exact_sorted


def test_bloom_filter_never_false_negative(spark):
    """Bloom's one-sided contract: members are always claimed."""
    from irs_990_efiler_database_spark.queries.sketch_ops import (
        sketch_bloom_filter,
    )

    r = sketch_bloom_filter(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.false_negatives == 0
    assert r.n_members > 0
