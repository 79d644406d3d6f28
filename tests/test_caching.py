"""Cache-lifetime contract (caching.py): builders that persist()
intermediates register them with tracked_persist, and release_cached()
/ cached_scope() drop every engine-held block — WITHOUT touching
spark.catalog.clearCache(), so a consumer's own caches survive."""

from __future__ import annotations

import pytest

import time

from irs_990_efiler_database_spark.caching import (
    cached_scope,
    release_cached,
    tracked_persist,
)

SF = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _wait_zero_engine(spark, consumer_blocks: int = 0, timeout: float = 20.0):
    """unpersist(blocking=False) evicts asynchronously — poll."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if _n_persistent(spark) <= consumer_blocks:
            return True
        time.sleep(0.2)
    return False


@pytest.mark.slow
def test_multi_query_session_leaves_zero_cached_rdds(spark):
    """A no-clearCache session composing the persisting builders ends
    with zero persistent RDDs after release_cached()."""
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    release_cached()
    assert _wait_zero_engine(spark), "pre-existing cached RDDs"

    qs = entry.queries()
    # one builder from each family VERDICT r5 flagged as leaky
    for name in (
        "fdedup_minhash_pairs",  # dedup_ops funnel
        "graph_triangle_count",  # graph_ops edge frame
        "text_ngram_novelty",  # text_ops persisted gram frame
        "fdedup_prefix_filter_pairs",  # prefix-filter docs frame
        "sketch_kmv_intersection",  # sketch_ops synopses
        "fdedup_semantic_pairs",  # r6: assignment + survivor frames
        "fdedup_embedding_cosine",  # r6: bucketed frame + survivors
        "doc_quality_deciles",  # r6: LM score frame
        "sim_pq_adc_topk",  # r6: lazy-persisted fast-code frame
        "sim_ann_ivfpq",  # r6: residual + fast-code frames
        "stat_signgd_text_classifier",  # r6: doc-partitioned features
        "fdedup_exact_substring_spans",  # r6: spread corpus
    ):
        qs[name](spark, SF).collect()

    assert _n_persistent(spark) > 0, "builders should have persisted"
    released = release_cached()
    assert released >= 11
    assert _wait_zero_engine(spark), "engine left cached RDDs behind"


@pytest.mark.slow
def test_release_does_not_touch_consumer_caches(spark):
    spark.catalog.clearCache()
    release_cached()
    assert _wait_zero_engine(spark)

    mine = spark.range(100).persist()
    mine.count()
    import __spark_entry__ as entry

    entry.queries()["text_ngram_novelty"](spark, SF).collect()
    release_cached()
    assert _wait_zero_engine(spark, consumer_blocks=1)
    assert _n_persistent(spark) == 1, "consumer cache must survive"
    mine.unpersist()


def test_cached_scope_releases_on_exit(spark):
    spark.catalog.clearCache()
    release_cached()
    assert _wait_zero_engine(spark)

    with cached_scope():
        df = tracked_persist(spark.range(50).selectExpr("id", "id * 2 AS d"))
        df.count()
        assert _n_persistent(spark) >= 1
    assert _wait_zero_engine(spark)
    # registry is empty too: a later release finds nothing
    assert release_cached() == 0
