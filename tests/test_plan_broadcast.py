"""Scale-safety plan tests: SF-proportional tables (customer, part,
supplier, the tf-idf vocabulary) must NOT carry a forced broadcast
hint — at 100× scale a hint overrides the size threshold and OOMs
executors. At test SF they are still small, so the
autoBroadcastJoinThreshold should pick a broadcast join anyway: these
tests assert the broadcast happens WITHOUT a hint (threshold/AQE
decision, not a plan mandate)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"


def _queries():
    from irs_990_efiler_database_spark.queries import all_queries

    return all_queries()


def _logical(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "q5_local_supplier_volume",
        "q7_nation_volume",
        "q10_returned_item_customers",
        "q14_promo_revenue_ratio",
        "q18_large_volume_orders",
        "q19_disjunctive_filter_revenue",
    ],
)
def test_sf_scaling_joins_broadcast_by_threshold_not_hint(spark, name):
    df = _queries()[name](spark, SF)
    logical = _logical(df)
    # every ResolvedHint left in the optimized plan names only bounded
    # dims (nation/region); customer/part/supplier reach the join
    # planner unhinted
    for line in logical.splitlines():
        if "ResolvedHint" in line or "UnresolvedHint" in line:
            raise AssertionError(f"{name}: stray hint survived: {line}")
    # at sf0.1 these tables are far below the 64 MB threshold, so the
    # planner must STILL choose a broadcast join on its own
    assert "BroadcastHashJoin" in _physical(df), (
        f"{name}: threshold-based broadcast did not engage at sf0.1"
    )


def test_tfidf_vocab_join_is_unhinted(spark):
    df = _queries()["text_tfidf_top_terms"](spark, SF)
    logical = _logical(df)
    hints = [
        ln
        for ln in logical.splitlines()
        if "ResolvedHint" in ln or "UnresolvedHint" in ln
    ]
    # the single-row corpus-size count may stay hinted; the unbounded
    # vocabulary (document-frequency) table must not be
    assert len(hints) <= 1, f"vocab join carries a hint: {hints}"


# queries whose plan deliberately contains a broadcast nested-loop:
# a 1-row scalar aggregate cross-joined into the stream (global total,
# global max, global average) — bounded build side, safe at any SF
_SCALAR_CROSS = {
    "q11_important_balance",
    "q15_top_supplier",
    "q22_idle_rich_customers",
    "q14_promo_revenue_ratio",  # single-row final aggregate
    "q17_small_quantity_revenue",
    "q6_forecast_revenue",
}


def test_no_tpch_plan_has_an_unbounded_cartesian():
    """Every TPC-H shape must compile to equi-joins (+ the documented
    1-row scalar cross joins): a CartesianProduct anywhere, or a
    BroadcastNestedLoopJoin outside the scalar-subquery allowlist,
    is a 100 TB scale bug regardless of small-SF correctness."""
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark()
    qs = _queries()
    names = sorted(n for n in qs if n[0] == "q" and n[1].isdigit())
    assert len(names) >= 22
    for name in names:
        plan = _physical(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        if name not in _SCALAR_CROSS:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_decontaminate_broadcasts_eval_side(spark):
    """The contamination check must broadcast the (bounded) eval-set
    grams and hash-join the corpus stream — a shuffle or sort-merge
    join here would move every corpus 13-gram across the wire."""
    df = _queries()["text_decontaminate_13gram"](spark, SF)
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_window_is_partitioned_not_global(spark):
    """Sequence packing runs its running sum per `source` partition: a
    global (empty-partitionBy) window would serialize 100 TB through
    one task. The physical plan must hash-partition on source, never
    SinglePartition, for the window exchange."""
    df = _queries()["doc_pack_token_budget"](spark, SF)
    plan = _physical(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_join_strategy_hints_are_honored(spark):
    """The hint surface: merge forces sort-merge, shuffle_hash forces
    shuffled hash — the manual overrides for when a user knows better
    than the optimizer (huge build side, known-sorted inputs)."""
    from irs_990_efiler_database_spark.catalog import load_table

    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    plan_m = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_m
    hashed = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    plan_h = hashed._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_h


def test_triangle_plan_has_no_cartesian(spark):
    """The degeneracy-oriented triangle count must compile to pure
    equi-joins — a CartesianProduct or broadcast nested loop would
    mean the closing-edge check degenerated to all-pairs."""
    from irs_990_efiler_database_spark.queries.graph_ops import (
        graph_triangle_count,
    )

    df = graph_triangle_count(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    df.sparkSession.catalog.clearCache()


def test_bm25_topk_is_take_ordered(spark):
    """BM25's global top-k must plan as TakeOrderedAndProject
    (per-partition top-k + k-row merge), not a single-partition
    window sort over every matching document."""
    from irs_990_efiler_database_spark.queries.text_ops import (
        text_bm25_search,
    )

    df = text_bm25_search(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
