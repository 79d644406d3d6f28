"""Similarity-search operators over `embeddings` (north-star surface).

Per-row vector math (norms, decimal-exact dot products) is zero-shuffle
``F.aggregate``/``F.zip_with`` over the array column; search paths live
in ``operators.similarity`` (brute-force cosine top-k baseline +
sign-LSH bucketed ANN scale path). The DuckDB oracles recompute the
same decimal-exact arithmetic positionally, so cosine values compare
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import (
    ann_topk_bucketed,
    cosine_topk,
    embedding_neardup_pairs,
    l2_norm,
)
from . import register


@register(
    "sim_vector_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,15))) AS DOUBLE)), 6) AS l2_norm,
           CAST(COUNT(*) AS BIGINT) AS dim
    FROM (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    GROUP BY vec_id
    """,
)
def sim_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row L2 norms — computed shuffle-free with a decimal-exact
    array aggregation (the previous explode+groupBy formulation
    shuffled dim× the corpus for the same number; the oracle keeps the
    explode formulation as an independent derivation)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding")), 6).alias("l2_norm"),
        F.size("embedding").cast("long").alias("dim"),
    )


@register(
    "sim_explode_embedding",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
           CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    WHERE vec_id <= 20
    """,
)
def sim_explode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the vector column (SURVEY §2.9 explode surface on
    array<float>)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), F.col("val").cast("double").alias("val"))


_SQL_DOTS = """
  pairs AS (
    SELECT q.vec_id AS query_id, q.embedding AS qv,
           c.vec_id AS neighbor_id, c.embedding AS cv
    FROM embeddings q
    JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ),
  dots AS (
    SELECT query_id, neighbor_id,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS dot,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS qq,
           SUM(CAST(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS cc
    FROM pairs, unnest(generate_series(1, len(qv))) AS t(i)
    GROUP BY query_id, neighbor_id
  ),
  scored AS (
    SELECT query_id, neighbor_id,
           round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6) AS cos
    FROM dots
  )
"""


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH {_SQL_DOTS}
    SELECT query_id, neighbor_id, rank, cos
    FROM (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    WHERE rank <= 3
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-3 for query vectors vec_id < 5 —
    broadcast query set, per-partition scoring, decimal-exact dots."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(e, e.filter(F.col("vec_id") < 5), k=3)


_SQL_BUCKETS = """
  bkt AS (
    SELECT vec_id, embedding,
           array_to_string(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
    FROM embeddings
  ),
  bpairs AS (
    SELECT q.vec_id AS query_id, q.embedding AS qv,
           c.vec_id AS neighbor_id, c.embedding AS cv, c.bucket
    FROM bkt q
    JOIN bkt c ON q.bucket = c.bucket AND q.vec_id < 5
              AND c.vec_id <> q.vec_id
  ),
  bdots AS (
    SELECT query_id, neighbor_id, bucket,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS dot,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS qq,
           SUM(CAST(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS cc
    FROM bpairs, unnest(generate_series(1, len(qv))) AS t(i)
    GROUP BY query_id, neighbor_id, bucket
  ),
  bscored AS (
    SELECT query_id, neighbor_id, bucket,
           round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6) AS cos
    FROM bdots
  )
"""


@register(
    "sim_ann_lsh_bucketed",
    oracle=f"""
    WITH {_SQL_BUCKETS}
    SELECT query_id, neighbor_id, bucket, rank, cos
    FROM (
      SELECT query_id, neighbor_id, bucket, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM bscored
    )
    WHERE rank <= 3
    """,
)
def sim_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN top-3: scoring restricted to same-bucket
    candidates via an equi-join on the bucket key — the scale path that
    replaces all-pairs scoring."""
    e = load_table(spark, sf_dir, "embeddings")
    return ann_topk_bucketed(e, e.filter(F.col("vec_id") < 5), k=3)


@register(
    "fdedup_embedding_cosine",
    oracle="""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 25
    ),
    bkt AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(embedding[1:8],
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM aug
    ),
    okbkt AS (
      SELECT bucket FROM bkt GROUP BY bucket HAVING COUNT(*) <= 1000
    ),
    cpairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b,
             x.embedding AS va, y.embedding AS vb
      FROM bkt x
      JOIN okbkt USING (bucket)
      JOIN bkt y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    cdots AS (
      SELECT id_a, id_b,
             SUM(CAST(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS dot,
             SUM(CAST(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS aa,
             SUM(CAST(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS bb
      FROM cpairs, unnest(generate_series(1, len(va))) AS t(i)
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, cos FROM (
      SELECT id_a, id_b,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6) AS cos
      FROM cdots
    )
    WHERE cos >= 0.99
    """,
)
def fdedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate dedup over embeddings augmented
    with planted exact copies (vec_id + 1e6): sign-LSH bucket
    candidates, rounded-cosine ≥ 0.99 verification."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    aug = e.unionByName(
        e.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    return embedding_neardup_pairs(aug, threshold=0.99)


@register(
    "fdedup_semantic_pairs",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    ascore AS (
      SELECT e.vec_id, c.cid,
             round(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                                 * CAST(c.cv[i] AS DOUBLE)
                                 AS DECIMAL(30,15))) AS DOUBLE)
               / (sqrt(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                                     * CAST(e.embedding[i] AS DOUBLE)
                                     AS DECIMAL(30,15))) AS DOUBLE))
                  * sqrt(CAST(SUM(CAST(CAST(c.cv[i] AS DOUBLE)
                                       * CAST(c.cv[i] AS DOUBLE)
                                       AS DECIMAL(30,15))) AS DOUBLE))), 6) AS cos
      FROM embeddings e
      CROSS JOIN cent c,
      unnest(generate_series(1, len(e.embedding))) AS t(i)
      GROUP BY e.vec_id, c.cid
    ),
    assign AS (
      SELECT vec_id, cid AS centroid_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM ascore
      ) WHERE rn = 1
    ),
    okcell AS (
      SELECT centroid_id FROM assign GROUP BY 1 HAVING COUNT(*) <= 1000
    ),
    cpairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.centroid_id,
             ea.embedding AS va, eb.embedding AS vb
      FROM assign a
      JOIN okcell USING (centroid_id)
      JOIN assign b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),
    cdots AS (
      SELECT id_a, id_b, centroid_id,
             SUM(CAST(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS dot,
             SUM(CAST(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS aa,
             SUM(CAST(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS bb
      FROM cpairs, unnest(generate_series(1, len(va))) AS t(i)
      GROUP BY id_a, id_b, centroid_id
    )
    SELECT id_a, id_b, centroid_id, cos FROM (
      SELECT id_a, id_b, centroid_id,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6) AS cos
      FROM cdots
    )
    WHERE cos >= 0.3
    """,
)
def fdedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: within-k-means-cell cosine pairs
    ≥ 0.3 — the embedding-CLUSTER complement of the sign-LSH near-dup
    path (random hyperplanes split paraphrase-grade pairs that share a
    semantic cell; the published technique dedups within clusters).
    Assignment is the shuffle-free IVF projection; candidates join on
    centroid_id only — per-cell quadratic, never all-pairs."""
    from ..operators.similarity import semantic_dedup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(e, threshold=0.3, n_centroids=8)


@register(
    "fdedup_semantic_incremental",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    ascore AS (
      SELECT e.vec_id, c.cid,
             round(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                                 * CAST(c.cv[i] AS DOUBLE)
                                 AS DECIMAL(30,15))) AS DOUBLE)
               / (sqrt(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                                     * CAST(e.embedding[i] AS DOUBLE)
                                     AS DECIMAL(30,15))) AS DOUBLE))
                  * sqrt(CAST(SUM(CAST(CAST(c.cv[i] AS DOUBLE)
                                       * CAST(c.cv[i] AS DOUBLE)
                                       AS DECIMAL(30,15))) AS DOUBLE))), 6) AS cos
      FROM embeddings e
      CROSS JOIN cent c,
      unnest(generate_series(1, len(e.embedding))) AS t(i)
      GROUP BY e.vec_id, c.cid
    ),
    assign AS (
      SELECT vec_id, cid AS centroid_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM ascore
      ) WHERE rn = 1
    ),
    okcell AS (
      SELECT centroid_id FROM assign GROUP BY 1 HAVING COUNT(*) <= 1000
    ),
    cpairs AS (
      SELECT a.vec_id AS new_id, b.vec_id AS idx_id, a.centroid_id,
             ea.embedding AS va, eb.embedding AS vb
      FROM assign a
      JOIN okcell USING (centroid_id)
      JOIN assign b ON a.centroid_id = b.centroid_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0
    ),
    cdots AS (
      SELECT new_id, idx_id, centroid_id,
             SUM(CAST(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS dot,
             SUM(CAST(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS aa,
             SUM(CAST(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS bb
      FROM cpairs, unnest(generate_series(1, len(va))) AS t(i)
      GROUP BY new_id, idx_id, centroid_id
    )
    SELECT new_id, idx_id, centroid_id, cos FROM (
      SELECT new_id, idx_id, centroid_id,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6) AS cos
      FROM cdots
    )
    WHERE cos >= 0.3
    """,
)
def fdedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup: screen a 'new batch' (every 10th vec_id —
    an SF-stable fraction) against the standing cell index — new ×
    indexed pairs only, cost ∝ |batch| × cell occupancy, never
    corpus²; same two-stage float-prefilter + decimal rerank as the
    full pass."""
    from ..operators.similarity import semantic_dedup_pairs_between

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs_between(
        e, F.col("id") % 10 == 0, threshold=0.3, n_centroids=8
    )


# the IVF oracle template lives in similarity_shared (round-11: breaks
# the similarity_ops<->similarity_pq cycle)
from .similarity_shared import _SQL_IVF  # noqa: E402



@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH {_SQL_IVF}
    SELECT query_id, neighbor_id, centroid_id, rank, cos
    FROM (
      SELECT query_id, neighbor_id, centroid_id,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))), 6) AS cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY round(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))), 6)
                     DESC, neighbor_id) AS BIGINT) AS rank
      FROM rdots
    )
    WHERE rank <= 3
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-3: shuffle-free nearest-centroid assignment (auto
    quantizer — inlined literal at this tiny K, broadcast-packed
    centroid join beyond 8192 plan scalars so plan size stays O(1) at
    IVF-realistic K), nprobe=2 centroid cells probed per query, exact
    decimal rerank inside the probed cells — the second ANN family
    next to sign-LSH."""
    from ..operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 5), k=3, n_centroids=8, nprobe=2)


@register(
    "sim_quantize_int8",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale
      FROM embeddings
    ),
    coded AS (
      SELECT vec_id, embedding, scale,
             list_transform(embedding,
               x -> greatest(-127, least(127,
                      CAST(round(CAST(x AS DOUBLE) / scale) AS INT))))
               AS codes
      FROM base WHERE scale > 0
    )
    SELECT vec_id,
           round(scale, 9) AS scale,
           md5(array_to_string(codes, ',')) AS codes_md5,
           round(list_max(list_transform(
             generate_series(1, len(codes)),
             i -> abs(CAST(embedding[i] AS DOUBLE) - codes[i] * scale))),
             9) AS max_abs_err
    FROM coded
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column — the storage
    layout that turns a 100 TB float32 vector store into ~25 TB with
    bounded reconstruction error (the same symmetric-absmax scheme
    inference runtimes use): per-vector scale = max|x|/127, codes
    clamp to [-127,127], and the query emits the scale, an md5 over
    the full code array (so every code sits under the hash gate
    without shipping wide rows), and the max reconstruction error.
    Pure projection — zero shuffle, scales with the scan; both
    engines run identical double arithmetic (float→double widening is
    exact, one division, same round-half-away rule)."""
    e = load_table(spark, sf_dir, "embeddings")
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        / 127
    )
    b = e.select("vec_id", "embedding", scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    codes = F.transform(
        "embedding",
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.round(x.cast("double") / F.col("scale")).cast("int"),
            ),
        ),
    )
    c = b.select("vec_id", "embedding", "scale", codes.alias("codes"))
    err = F.array_max(
        F.zip_with(
            "embedding",
            "codes",
            lambda x, q: F.abs(x.cast("double") - q * F.col("scale")),
        )
    )
    # err is materialized BEFORE the output projection: in the final
    # select the rounded output column is also named "scale", and
    # lateral-column-alias resolution would silently feed the ROUNDED
    # scale into the reconstruction arithmetic
    c = c.withColumn("max_abs_err", F.round(err, 9))
    return c.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.md5(
            F.array_join(F.transform("codes", lambda q: q.cast("string")), ",")
        ).alias("codes_md5"),
        "max_abs_err",
    )


@register(
    "sim_recall_at_k",
    oracle=f"""
    WITH {_SQL_DOTS},
    exact AS (
      SELECT query_id, neighbor_id
      FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      )
      WHERE rank <= 3
    ),
    {_SQL_BUCKETS},
    ann AS (
      SELECT query_id, neighbor_id
      FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM bscored
      )
      WHERE rank <= 3
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*) AS recall_at_3
    FROM exact e
    LEFT JOIN ann a USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def sim_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@3 of the sign-LSH bucketed
    search against the exact brute-force top-3, per query — the
    similarity-search twin of the dedup precision/recall harness
    (every ANN deployment measures recall on a labeled sample before
    trusting the index). Both search paths already exist in the
    engine; this composes them with one membership join, and the
    oracle composes their two independent SQL derivations."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = cosine_topk(e, q, k=3).select("query_id", "neighbor_id")
    ann = ann_topk_bucketed(e, q, k=3).select(
        "query_id", F.col("neighbor_id").alias("ann_neighbor")
    )
    j = exact.join(
        ann,
        (exact.query_id == ann.query_id)
        & (exact.neighbor_id == ann.ann_neighbor),
        "left",
    ).select(exact.query_id, "neighbor_id", "ann_neighbor")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.count("ann_neighbor").cast("long").alias("n_hit"),
        (
            F.count("ann_neighbor").cast("double") / F.count(F.lit(1))
        ).alias("recall_at_3"),
    )


_SQL_MRL = """
  trunc AS (
    SELECT vec_id, embedding[1:16] AS tv, embedding AS fv FROM embeddings
  ),
  tpairs AS (
    SELECT q.vec_id AS query_id, q.tv AS qv,
           c.vec_id AS neighbor_id, c.tv AS cv
    FROM trunc q
    JOIN trunc c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ),
  tdots AS (
    SELECT query_id, neighbor_id,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS dot,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS qq,
           SUM(CAST(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS cc
    FROM tpairs, unnest(generate_series(1, len(qv))) AS t(i)
    GROUP BY query_id, neighbor_id
  ),
  tscored AS (
    SELECT query_id, neighbor_id,
           round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6)
             AS cos16
    FROM tdots
  ),
  ttop AS (
    SELECT query_id, neighbor_id, cos16, rank FROM (
      SELECT query_id, neighbor_id, cos16,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos16 DESC, neighbor_id) AS BIGINT) AS rank
      FROM tscored
    ) WHERE rank <= 3
  ),
  fpairs AS (
    SELECT q.vec_id AS query_id, q.fv AS qv,
           c.vec_id AS neighbor_id, c.fv AS cv
    FROM trunc q
    JOIN trunc c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ),
  fdots AS (
    SELECT query_id, neighbor_id,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS dot,
           SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS qq,
           SUM(CAST(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS cc
    FROM fpairs, unnest(generate_series(1, len(qv))) AS t(i)
    GROUP BY query_id, neighbor_id
  ),
  fscored AS (
    SELECT query_id, neighbor_id,
           round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6)
             AS cosf
    FROM fdots
  ),
  ftop AS (
    SELECT query_id, neighbor_id FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosf DESC, neighbor_id) AS rank
      FROM fscored
    ) WHERE rank <= 3
  )
"""


@register(
    "sim_matryoshka_overlap",
    oracle=f"""
    WITH {_SQL_MRL}
    SELECT t.query_id, t.neighbor_id, t.rank, t.cos16,
           f.neighbor_id IS NOT NULL AS in_full_top3
    FROM ttop t
    LEFT JOIN ftop f
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    """,
)
def sim_matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncated retrieval quality: top-3
    neighbors using only the FIRST 16 of 64 dims (the cheap first-pass
    index an MRL-trained embedding supports), each flagged for whether
    the full-dimension ranking agrees — the retrieval-quality readout
    that tells you how far the truncated index can be trusted before
    a full-dim re-rank pass.

    Scale shape: truncation is a projection (F.slice); both rankings
    run the broadcast-queries / per-partition-scoring shape of
    cosine_topk (decimal-exact dots, rounded-then-ranked cosines);
    the overlap join touches 3 rows per query."""
    from ..operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    trunc = e.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = trunc.filter(F.col("vec_id") < 5)
    top16 = cosine_topk(trunc, q16, k=3).select(
        "query_id", "neighbor_id", "rank", F.col("cos").alias("cos16")
    )
    qf = e.filter(F.col("vec_id") < 5)
    topf = cosine_topk(e, qf, k=3).select(
        "query_id", F.col("neighbor_id").alias("f_neighbor")
    )
    return top16.join(
        topf,
        (top16.query_id == topf.query_id)
        & (top16.neighbor_id == topf.f_neighbor),
        "left",
    ).select(
        top16.query_id,
        "neighbor_id",
        "rank",
        "cos16",
        F.col("f_neighbor").isNotNull().alias("in_full_top3"),
    )


_HYBRID_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    corpus AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id,
             SUM(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS tf1,
             SUM(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf2
      FROM toks GROUP BY 1
    ),
    dfc AS (
      SELECT SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      FROM tf
    ),
    trank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY round(
               ln((c.n_docs - d.df1 + 0.5) / (d.df1 + 0.5) + 1)
                 * (t.tf1 * 2.2)
                 / (t.tf1 + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl))
               + ln((c.n_docs - d.df2 + 0.5) / (d.df2 + 0.5) + 1)
                 * (t.tf2 * 2.2)
                 / (t.tf2 + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl)), 6) DESC,
               doc_id) AS rt
      FROM tf t JOIN dl l USING (doc_id)
      CROSS JOIN corpus c CROSS JOIN dfc d
      WHERE t.tf1 + t.tf2 > 0
      QUALIFY rt <= 50
    ),
    qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
    dots AS (
      SELECT e.vec_id AS doc_id,
             SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS dot,
             SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS cc,
             SUM(CAST(CAST(qv.v[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS qq
      FROM embeddings e, qv, unnest(generate_series(1, len(e.embedding))) AS t(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    ),
    srank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6)
               DESC, doc_id) AS rs
      FROM dots
      QUALIFY rs <= 50
    ),
    fused AS (
      SELECT COALESCE(t.doc_id, s.doc_id) AS doc_id,
             round(COALESCE(1.0 / (60 + t.rt), 0)
                   + COALESCE(1.0 / (60 + s.rs), 0), 6) AS rrf
      FROM trank t FULL OUTER JOIN srank s ON s.doc_id = t.doc_id
    )
    SELECT doc_id, rrf FROM (
      SELECT doc_id, rrf,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rk
      FROM fused
    ) WHERE rk <= 10
"""


@register("sim_hybrid_rrf_search", oracle=_HYBRID_ORACLE)
def sim_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (the RAG-stack
    default): a lexical BM25 ranking for {spark, join} and a semantic
    cosine ranking against a query embedding fuse as
    sum(1/(60+rank)) — rank-space fusion needs no score calibration
    between the two retrievers. Both legs rank on ROUNDED scores with
    id tie-breaks (deterministic cross-engine), missing-leg docs
    contribute only their present term, and the fused top-10 re-ranks
    the union. Scale: each leg contributes only its top-K=50
    candidates — ``orderBy().limit(K)`` compiles to
    TakeOrderedAndProject (per-partition heap + driver merge of K-row
    heads, no global sort shuffle), and rank assignment runs over the
    bounded K-row frame, so no window ever sees unbounded input
    (r4 perf_weak #1 fixed). A doc outside a leg's top-K contributes
    no term for that leg — the production hybrid-retrieval contract;
    the oracle applies the same per-leg QUALIFY rank <= K."""
    from ..operators.similarity import cosine

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        F.sum(F.when(F.col("tok") == "spark", 1).otherwise(0)).alias("tf1"),
        F.sum(F.when(F.col("tok") == "join", 1).otherwise(0)).alias("tf2"),
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.sum(F.when(F.col("tf1") > 0, 1).otherwise(0)).alias("df1"),
        F.sum(F.when(F.col("tf2") > 0, 1).otherwise(0)).alias("df2"),
    )

    def leg(tf, dfx):
        idf = F.log(
            (F.col("n_docs") - F.col(dfx) + 0.5) / (F.col(dfx) + 0.5) + 1
        )
        return (
            idf
            * (F.col(tf) * 2.2)
            / (F.col(tf) + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
        )

    tscored = (
        per_doc.filter(F.col("tf1") + F.col("tf2") > 0)
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.round(leg("tf1", "df1") + leg("tf2", "df2"), 6).alias("ts"),
        )
    )
    # top-K per leg FIRST (TakeOrderedAndProject — no global sort, no
    # unbounded window), THEN ranks over the bounded K-row frame; the
    # in-top-K ranks equal the global ranks for those rows
    K = 50
    # bounded-window: frame is .limit(K) rows (TakeOrderedAndProject)
    wt = Window.orderBy(F.col("ts").desc(), "doc_id")
    trank = (
        tscored.orderBy(F.col("ts").desc(), "doc_id")
        .limit(K)
        .select("doc_id", F.row_number().over(wt).alias("rt"))
    )

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    sscored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("ss"),
        )
    )
    # bounded-window: frame is .limit(K) rows (TakeOrderedAndProject)
    ws = Window.orderBy(F.col("ss").desc(), "doc_id")
    srank = (
        sscored.orderBy(F.col("ss").desc(), "doc_id")
        .limit(K)
        .select("doc_id", F.row_number().over(ws).alias("rs"))
    )
    t = trank.select(F.col("doc_id").alias("t_id"), "rt")
    s = srank.select(F.col("doc_id").alias("s_id"), "rs")
    fused = t.join(s, t.t_id == s.s_id, "full_outer").select(
        F.coalesce("t_id", "s_id").alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("rt")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rs")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
        .select("doc_id", "rrf")
    )


@register(
    "sim_label_centroids",
    oracle="""
    SELECT label, CAST(i - 1 AS INT) AS dim,
           CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * 1000000 AS HUGEINT))
                AS DOUBLE) / COUNT(*) / 1000000 AS centroid
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i
    """,
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class prototypes: per-label mean embedding, exploded to
    (label, dim, centroid) rows. Float32 inputs scale exactly to
    integer micros (a float's value times 1e6 is integral within
    double precision for this corpus's quantized embeddings), so the
    per-dimension sums are order-free integers and the mean is one
    double division — the nearest-centroid classifier / cluster-seed
    primitive without a Python pass."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    )
    micros = F.round(F.col("v").cast("double") * 1_000_000).cast(
        "decimal(38,0)"
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            (
                F.sum(micros).cast("double")
                / F.count(F.lit(1))
                / 1_000_000
            ).alias("centroid")
        )
        .select("label", F.col("dim").cast("int").alias("dim"), "centroid")
    )


@register(
    "sim_knn_label_eval",
    oracle=f"""
    WITH {_SQL_DOTS.replace("q.vec_id < 5", "q.vec_id < 50")},
    top3 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= 3
    ),
    votes AS (
      SELECT t.query_id, e.label, COUNT(*) AS n_votes
      FROM top3 t JOIN embeddings e ON e.vec_id = t.neighbor_id
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT query_id, label AS predicted FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY n_votes DESC, label) AS r
        FROM votes
      ) WHERE r = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN p.predicted = e.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(SUM(CASE WHEN p.predicted = e.label THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
    """,
)
def sim_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classifier evaluation: each held-out query vector (vec_id
    < 50) is labeled by the majority vote of its 3 nearest neighbors
    (rounded-cosine ranking, lowest-label tie-break) and scored
    against its true label — the embedding-quality metric that says
    whether the vector space actually separates classes. One ranking
    + two bounded joins over the existing cosine machinery."""
    from pyspark.sql import Window as W

    from ..operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    top3 = cosine_topk(e, e.filter(F.col("vec_id") < 50), k=3).select(
        "query_id", "neighbor_id"
    )
    labels = e.select("vec_id", "label")
    votes = (
        top3.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), "label"
    )
    pred = (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("predicted"))
    )
    truth = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "truth"
    )
    return (
        pred.join(truth, "query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(
                F.when(F.col("predicted") == F.col("truth"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "n_queries",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_queries"), 6
            ).alias("accuracy"),
        )
    )



# round-11 split: the PQ/diagnostics sub-family moved to similarity_pq
# — re-exported here so import paths and registered names are
# unchanged (this import runs LAST so the shared IVF SQL template
# above already exists when similarity_pq imports it back)
from .similarity_pq import *  # noqa: E402,F401,F403
