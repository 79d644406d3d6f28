"""Product-quantization ANN + embedding-diagnostics operators
(round-11 split of the 1,640-line similarity_ops module: this file
carries PQ-ADC top-k, PQ recall audit, IVF-PQ, embedding MMD drift,
the IVF nprobe S-curve sweep and hard-negative mining. similarity_ops
keeps the cosine/LSH/IVF/semantic-dedup/quantize/RRF surface and
re-exports this module, so registered names and import paths are
unchanged. The shared IVF SQL template lives in
similarity_shared, so there is no module-level edge back to
similarity_ops and either sub-family module imports cleanly in any
order.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from .similarity_shared import _SQL_IVF

_SQL_PQ = """
  cb AS (
    SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
  ),
  subd AS (
    SELECT e.vec_id, s.m, c.cid,
           SUM(CAST(
             (CAST(e.embedding[s.m * 16 + i] AS DOUBLE)
              - CAST(c.cv[s.m * 16 + i] AS DOUBLE))
             * (CAST(e.embedding[s.m * 16 + i] AS DOUBLE)
                - CAST(c.cv[s.m * 16 + i] AS DOUBLE))
             AS DECIMAL(30,15))) AS d2d
    FROM embeddings e
    CROSS JOIN cb c
    CROSS JOIN generate_series(0, 3) s(m),
    unnest(generate_series(1, 16)) t(i)
    GROUP BY e.vec_id, s.m, c.cid
  ),
  codes AS (
    SELECT vec_id, m, cid AS code FROM (
      SELECT vec_id, m, cid,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id, m
               ORDER BY round(CAST(d2d AS DOUBLE), 6), cid) AS rn
      FROM subd
    ) WHERE rn = 1
  ),
  adc AS (
    SELECT d.vec_id AS query_id, n.vec_id AS neighbor_id,
           round(CAST(SUM(d.d2d) AS DOUBLE), 6) AS adc
    FROM codes n
    JOIN subd d ON d.m = n.m AND d.cid = n.code
    WHERE d.vec_id < 5 AND n.vec_id <> d.vec_id
    GROUP BY 1, 2
  )
"""


@register(
    "sim_pq_adc_topk",
    oracle=f"""
    WITH {_SQL_PQ}
    SELECT query_id, neighbor_id, rank, adc FROM (
      SELECT query_id, neighbor_id, adc,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc, neighbor_id) AS BIGINT) AS rank
      FROM adc
    ) WHERE rank <= 3
    """,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-3 (Jégou et al. 2011): 64-dim
    vectors compressed to 4 subspace codes (16 dims / 8 codewords
    each), per-query distance TABLES computed once, per-pair cost = 4
    table lookups — the compressed-corpus ANN family next to sign-LSH
    (bucketing) and IVF (cells). The DuckDB oracle recomputes the
    identical decimal-exact subspace distances positionally, assigns
    the same codes, and sums the same table entries, so the ADC
    distances compare bit-for-bit."""
    from ..operators.similarity import pq_adc_topk

    # rebalance=False: the committed shuffle bound (0.056) prices a
    # digest-only plan — codes cross the wire, never vectors; the scan
    # rebalance would push the full embedding payload through an extra
    # exchange (measured ratio 0.131 with it, gate-red).
    e = load_table(spark, sf_dir, "embeddings", rebalance=False)
    return pq_adc_topk(e, e.filter(F.col("vec_id") < 5), k=3, n_sub=4, n_codes=8)


@register(
    "sim_pq_recall_eval",
    oracle=f"""
    WITH {_SQL_PQ},
    el AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(
               (CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
               * (CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
               AS DECIMAL(30,15))) AS d2
      FROM embeddings q
      JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id,
      unnest(generate_series(1, len(q.embedding))) t(i)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY round(CAST(d2 AS DOUBLE), 6), neighbor_id)
                 AS rank
        FROM el
      ) WHERE rank <= 3
    ),
    pqtop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY adc, neighbor_id) AS rank
        FROM adc
      ) WHERE rank <= 3
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / COUNT(*) AS recall_at_3
    FROM exact e
    LEFT JOIN pqtop p USING (query_id, neighbor_id)
    GROUP BY e.query_id
    """,
)
def sim_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the PQ-ADC compressed-domain search against the
    EXACT squared-L2 top-3 (the metric PQ approximates — evaluating it
    against cosine would conflate quantization loss with metric
    mismatch). Completes the ANN eval harness: sim_recall_at_k covers
    sign-LSH, this covers PQ; together they are the labeled-sample
    recall audit every ANN deployment runs before trusting an index.
    One membership join between the two (tiny) top-k frames; the
    oracle composes the PQ derivation with an independent exact-L2
    ranking."""
    from pyspark.sql import Window

    from ..operators.similarity import _d2_decimal, pq_adc_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    qn = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(qn))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _d2_decimal(F.col("qv"), F.col("cv")).cast("double"), 6
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), "neighbor_id")
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id")
    )
    pq = pq_adc_topk(e, q, k=3).select(
        "query_id", F.col("neighbor_id").alias("pq_neighbor")
    )
    j = exact.join(
        pq,
        (exact.query_id == pq.query_id)
        & (exact.neighbor_id == pq.pq_neighbor),
        "left",
    ).select(exact.query_id, "neighbor_id", "pq_neighbor")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.count("pq_neighbor").cast("long").alias("n_hit"),
        (
            F.count("pq_neighbor").cast("double") / F.count(F.lit(1))
        ).alias("recall_at_3"),
    )


_SQL_IVFPQ = f"""
  {_SQL_IVF},
  resid AS (
    SELECT a.vec_id, a.centroid_id,
           list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
             AS r
    FROM assign a
    JOIN embeddings e ON e.vec_id = a.vec_id
    JOIN cent c ON c.cid = a.centroid_id
  ),
  cbseed AS (
    SELECT vec_id - 8 AS code, r FROM resid
    WHERE vec_id >= 8 AND vec_id < 16
  ),
  nsubd AS (
    SELECT x.vec_id, x.centroid_id, s.m, cs.code,
           SUM(CAST((x.r[s.m * 16 + i] - cs.r[s.m * 16 + i])
                    * (x.r[s.m * 16 + i] - cs.r[s.m * 16 + i])
                    AS DECIMAL(30,15))) AS d2d
    FROM resid x
    CROSS JOIN cbseed cs
    CROSS JOIN generate_series(0, 3) s(m),
    unnest(generate_series(1, 16)) t(i)
    GROUP BY 1, 2, 3, 4
  ),
  ncodes AS (
    SELECT vec_id, centroid_id, m, code FROM (
      SELECT vec_id, centroid_id, m, code,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id, m
               ORDER BY round(CAST(d2d AS DOUBLE), 6), code) AS rn
      FROM nsubd
    ) WHERE rn = 1
  ),
  qres AS (
    SELECT p.query_id, p.centroid_id,
           list_transform(generate_series(1, len(e.embedding)),
             i -> CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
             AS qr
    FROM probe p
    JOIN embeddings e ON e.vec_id = p.query_id
    JOIN cent c ON c.cid = p.centroid_id
  ),
  qtab AS (
    SELECT q.query_id, q.centroid_id, s.m, cs.code,
           SUM(CAST((q.qr[s.m * 16 + i] - cs.r[s.m * 16 + i])
                    * (q.qr[s.m * 16 + i] - cs.r[s.m * 16 + i])
                    AS DECIMAL(30,15))) AS d2d
    FROM qres q
    CROSS JOIN cbseed cs
    CROSS JOIN generate_series(0, 3) s(m),
    unnest(generate_series(1, 16)) t(i)
    GROUP BY 1, 2, 3, 4
  ),
  ivfpq_adc AS (
    SELECT d.query_id, n.vec_id AS neighbor_id, n.centroid_id,
           round(CAST(SUM(d.d2d) AS DOUBLE), 6) AS adc
    FROM ncodes n
    JOIN qtab d ON d.centroid_id = n.centroid_id
               AND d.m = n.m AND d.code = n.code
    WHERE n.vec_id <> d.query_id
    GROUP BY 1, 2, 3
  )
"""


@register(
    "sim_ann_ivfpq",
    oracle=f"""
    WITH {_SQL_IVFPQ}
    SELECT query_id, neighbor_id, centroid_id, rank, adc FROM (
      SELECT query_id, neighbor_id, centroid_id, adc,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc, neighbor_id) AS BIGINT) AS rank
      FROM ivfpq_adc
    ) WHERE rank <= 3
    """,
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed top-3 (the production FAISS index shape):
    cosine-assigned IVF cells + product quantization of RESIDUALS
    (v − centroid) with per-(query, probed-cell) ADC tables, nprobe=2.
    Residual PQ is what makes billion-scale ANN shippable: cells bound
    the candidate set, residual codebooks bound the quantization
    error, and the scan payload per candidate is 4 code bytes. The
    DuckDB oracle recomputes assignment, residuals, codes, and ADC
    sums positionally — distances compare bit-for-bit."""
    from ..operators.similarity import ivfpq_topk

    # rebalance=False: same digest-only shuffle contract as
    # sim_pq_adc_topk (committed bound 0.069; measured 0.133 with the
    # rebalance exchange carrying the vectors, gate-red).
    e = load_table(spark, sf_dir, "embeddings", rebalance=False)
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") < 5), k=3, n_centroids=8, nprobe=2
    )


@register(
    "sim_embedding_mmd_drift",
    oracle="""
    WITH side AS (
      SELECT vec_id, CAST(vec_id % 2 AS INT) AS grp, embedding
      FROM embeddings
    ),
    dims AS (
      SELECT grp, i AS dim,
             SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,15)))
               AS s,
             COUNT(*) AS n
      FROM side, unnest(generate_series(1, len(embedding))) t(i)
      GROUP BY 1, 2
    ),
    terms AS (
      SELECT a.dim,
             CAST(round(
               (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
               * (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n),
               12) AS DECIMAL(24,14)) AS t2
      FROM dims a JOIN dims b ON a.dim = b.dim AND a.grp = 0 AND b.grp = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           round(CAST(SUM(t2) AS DOUBLE), 9) AS mmd2,
           round(sqrt(CAST(SUM(t2) AS DOUBLE)), 9) AS mmd
    FROM terms
    """,
)
def sim_embedding_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift via linear-kernel Maximum Mean
    Discrepancy (Gretton et al. 2012): MMD² = ||mean(A) − mean(B)||²
    between two corpus slices (even vs odd ids here; in production,
    yesterday's snapshot vs today's) — the cheap first-line monitor for
    'did the embedding model or the corpus shift', run before anything
    expensive re-trains. Per-dimension means come from exact decimal
    sums (one explode + group-by-dimension aggregation — dim×N rows of
    8 bytes, map-side combined); each squared difference is one
    fixed-order double op rounded to 12 dp, and the 64 per-dim terms
    accumulate in DECIMAL — order-free under any partitioning. The
    linear kernel makes the estimator exact and mergeable; an RBF MMD
    would need the pair matrix this formulation exists to avoid."""
    e = load_table(spark, sf_dir, "embeddings")
    side = e.select(
        (F.col("vec_id") % 2).cast("int").alias("grp"),
        F.posexplode("embedding").alias("dim0", "x"),
    )
    dims = (
        side.select("grp", (F.col("dim0") + 1).alias("dim"),
                    F.col("x").cast("double").cast("decimal(30,15)").alias("xd"))
        .groupBy("grp", "dim")
        .agg(F.sum("xd").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    a = dims.filter(F.col("grp") == 0).select(
        "dim", F.col("s").alias("sa"), F.col("n").alias("na")
    )
    b = dims.filter(F.col("grp") == 1).select(
        "dim", F.col("s").alias("sb"), F.col("n").alias("nb")
    )
    diff = (
        F.col("sa").cast("double") / F.col("na")
        - F.col("sb").cast("double") / F.col("nb")
    )
    terms = a.join(b, "dim").select(
        F.round(diff * diff, 12).cast("decimal(24,14)").alias("t2")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.round(F.sum("t2").cast("double"), 9).alias("mmd2"),
        F.round(F.sqrt(F.sum("t2").cast("double")), 9).alias("mmd"),
    )


def _ivf_sweep_oracle() -> str:
    per_np = []
    sels = []
    for np_ in (1, 2, 3):
        per_np.append(f"""
    probe{np_} AS (
      SELECT vec_id AS query_id, cid AS centroid_id FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM ascore WHERE vec_id < 5
      ) WHERE rn <= {np_}
    ),
    cand{np_} AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probe{np_} p
      JOIN assign a ON a.centroid_id = p.centroid_id
                   AND a.vec_id <> p.query_id
    ),
    rd{np_} AS (
      SELECT d.query_id, d.neighbor_id,
             round(CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE)
                          * CAST(n.embedding[i] AS DOUBLE)
                          AS DECIMAL(30,15))) AS DOUBLE)
               / (sqrt(CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE)
                                * CAST(q.embedding[i] AS DOUBLE)
                                AS DECIMAL(30,15))) AS DOUBLE))
                  * sqrt(CAST(SUM(CAST(CAST(n.embedding[i] AS DOUBLE)
                                  * CAST(n.embedding[i] AS DOUBLE)
                                  AS DECIMAL(30,15))) AS DOUBLE))), 6) AS cos
      FROM cand{np_} d
      JOIN embeddings q ON q.vec_id = d.query_id
      JOIN embeddings n ON n.vec_id = d.neighbor_id,
      unnest(generate_series(1, len(q.embedding))) AS t(i)
      GROUP BY d.query_id, d.neighbor_id
    ),
    top{np_} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM rd{np_}
      ) WHERE rank <= 3
    ),
    rec{np_} AS (
      SELECT {np_} AS nprobe,
             COUNT(*) AS n_exact,
             COUNT(t.neighbor_id) AS n_hit,
             (SELECT COUNT(*) FROM cand{np_}) AS n_candidates
      FROM exact e
      LEFT JOIN top{np_} t USING (query_id, neighbor_id)
    )""")
        sels.append(f"SELECT * FROM rec{np_}")
    return (
        "WITH "
        + _SQL_IVF
        + ","
        + """
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                     ORDER BY s.cos DESC, s.neighbor_id) AS rank
        FROM (
          SELECT d.query_id, d.neighbor_id,
                 round(CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE)
                              * CAST(n.embedding[i] AS DOUBLE)
                              AS DECIMAL(30,15))) AS DOUBLE)
                   / (sqrt(CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE)
                                    * CAST(q.embedding[i] AS DOUBLE)
                                    AS DECIMAL(30,15))) AS DOUBLE))
                      * sqrt(CAST(SUM(CAST(CAST(n.embedding[i] AS DOUBLE)
                                      * CAST(n.embedding[i] AS DOUBLE)
                                      AS DECIMAL(30,15))) AS DOUBLE))), 6)
                   AS cos
          FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < 5 AND c.vec_id <> q.vec_id
          ) d
          JOIN embeddings q ON q.vec_id = d.query_id
          JOIN embeddings n ON n.vec_id = d.neighbor_id,
          unnest(generate_series(1, len(q.embedding))) AS t(i)
          GROUP BY d.query_id, d.neighbor_id
        ) s
      ) WHERE rank <= 3
    ),"""
        + ",".join(per_np)
        + f""",
    uni AS ({" UNION ALL ".join(sels)})
    SELECT CAST(nprobe AS INT) AS nprobe,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit AS DOUBLE) / n_exact AS recall_at_3,
           CAST(n_candidates AS BIGINT) AS n_candidates
    FROM uni
    """
    )


@register("sim_ivf_nprobe_sweep", oracle=_ivf_sweep_oracle())
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning sweep: recall@3 against the exact cosine top-3 AND
    candidate volume for nprobe = 1, 2, 3 — the three-row table an ANN
    deployment reads to pick its recall/cost point (the
    fdedup_lsh_param_sweep twin on the IVF side). Reuses the shared
    assignment for all probe depths; each sweep point is the standard
    ivf_topk plan plus one membership join against the exact top-3."""
    from ..operators.similarity import cosine_topk, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = cosine_topk(e, q, k=3).select("query_id", "neighbor_id")
    outs = []
    for np_ in (1, 2, 3):
        ann = ivf_topk(e, q, k=3, n_centroids=8, nprobe=np_).select(
            "query_id", F.col("neighbor_id").alias("ann_neighbor")
        )
        outs.append(
            exact.join(
                ann,
                (exact.query_id == ann.query_id)
                & (exact.neighbor_id == ann.ann_neighbor),
                "left",
            )
            .select(exact.query_id, "neighbor_id", "ann_neighbor")
            .agg(
                F.lit(np_).cast("int").alias("nprobe"),
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.count("ann_neighbor").cast("long").alias("n_hit"),
            )
        )
    from functools import reduce

    swept = reduce(lambda a, b: a.unionByName(b), outs)
    # candidate counts per nprobe from one shared assignment frame
    from ..operators.similarity import _collect_centroids, _pick_assign_fn

    cent_rows = _collect_centroids(e, 8, "vec_id", "embedding")
    assigned = _pick_assign_fn(cent_rows, "auto")(
        e, cent_rows, "vec_id", "embedding"
    ).select("id", "centroid_id")
    cent_df = e.sparkSession.createDataFrame(
        [(int(c), list(v)) for c, v, _ in sorted(cent_rows)], ["cid", "cv"]
    )
    from ..operators.similarity import cosine

    qs = (
        q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cent_df))
        .select(
            "query_id",
            "cid",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("qcos"),
        )
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "cid")
    pr = qs.withColumn("prn", F.row_number().over(wp))
    cands = []
    for np_ in (1, 2, 3):
        cands.append(
            pr.filter(F.col("prn") <= np_)
            .join(
                assigned,
                (assigned.centroid_id == pr.cid)
                & (assigned.id != pr.query_id),
            )
            .agg(
                F.lit(np_).cast("int").alias("nprobe"),
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
            )
        )
    candf = reduce(lambda a, b: a.unionByName(b), cands)
    return swept.join(candf, "nprobe").select(
        "nprobe",
        "n_exact",
        "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_exact")).alias(
            "recall_at_3"
        ),
        "n_candidates",
    )


@register(
    "sim_hard_negative_mining",
    oracle="""
    WITH pairs AS (
      SELECT q.vec_id AS query_id, q.embedding AS qv,
             c.vec_id AS neighbor_id, c.embedding AS cv,
             c.label AS neg_label
      FROM embeddings q
      JOIN embeddings c
        ON q.vec_id < 8 AND c.vec_id <> q.vec_id
       AND c.label <> q.label
    ),
    dots AS (
      SELECT query_id, neighbor_id, neg_label,
             SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS dot,
             SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS qq,
             SUM(CAST(CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                      AS DECIMAL(30,15))) AS cc
      FROM pairs, unnest(generate_series(1, len(qv))) AS t(i)
      GROUP BY query_id, neighbor_id, neg_label
    ),
    scored AS (
      SELECT query_id, neighbor_id, neg_label,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6)
               AS cos
      FROM dots
    )
    SELECT query_id, neighbor_id, neg_label, rank, cos
    FROM (
      SELECT query_id, neighbor_id, neg_label, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for
    each anchor vector, the top-5 most-cosine-similar vectors whose
    LABEL DIFFERS — the near-miss negatives that make a contrastive
    batch informative (random negatives are trivially separable; the
    training-data pipelines behind retrieval models mine these against
    the full corpus per epoch).

    Scale shape: identical to the brute-force cosine baseline — the
    anchor set broadcasts, the corpus is scored per partition with
    zero shuffle, and the label-mismatch filter runs BEFORE ranking so
    same-label rows never reach the window; the top-5 per anchor is a
    bounded rank over the broadcast-join output. The IVF/LSH bucketed
    paths drop in unchanged when the corpus outgrows brute force (the
    mining loop is the same query with ``ivf_topk`` as the scorer)."""
    from ..operators.similarity import cosine

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("neg_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neg_label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            # rounded BEFORE ranking (same rationale as cosine_topk):
            # the decimal dot is exact; only the final double division
            # can drift ~1e-13 across engines
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "neg_label", "rank", "cos")
    )
