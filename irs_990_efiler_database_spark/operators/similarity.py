"""Vector similarity search over array<float> embedding columns.

Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The (small) query set is broadcast; each data partition scores its
  rows locally, and only per-partition top-k survivors reach the final
  TakeOrdered. No shuffle of the embedding corpus.
- ``lsh_bucket``/``ann_topk_bucketed``: the scale path — sign-LSH
  (axis-aligned random-hyperplane) buckets computed per-row, then
  scoring restricted to same-bucket candidates via an equi-join on the
  bucket key. At 100 TB the bucket join shuffles (id, bucket) pairs,
  never the full corpus against itself.

Determinism: dot products accumulate per-element double products cast
to DECIMAL(30,15) (exact, order-independent — a plain double sum is
shuffle-order-dependent and would flap the oracle hash); norms and the
final cosine are single deterministic double operations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import tracked_persist

_DEC = "decimal(30,15)"


def _dot_decimal(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two equal-length float arrays."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, p: (acc + p).cast(_DEC)
    )


def l2_norm(v: Column) -> Column:
    """Per-row L2 norm with exact decimal accumulation — zero shuffle
    (the explode+groupBy formulation shuffles dim× the input for the
    same number)."""
    return F.sqrt(_dot_decimal(v, v).cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return _dot_decimal(a, b).cast("double") / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    ``queries`` is broadcast (a query set is small by definition); the
    join is a broadcast nested-loop scored per partition, and ranking
    ties break on neighbor id for determinism."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # rounded BEFORE ranking: the decimal dot is exact but the
            # final double division can differ ~1e-13 across engines;
            # ranking on the rounded value keeps top-k order-stable
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def lsh_bucket(v: Column, planes: int = 8) -> Column:
    """Sign-LSH bucket key: the sign pattern of the first ``planes``
    components (axis-aligned hyperplanes — deterministic, portable,
    and a valid LSH family for cosine similarity)."""
    signs = F.transform(
        F.slice(v, 1, planes),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(signs, "")


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, rounded
    cosine ≥ threshold), candidates restricted to same sign-LSH bucket.

    The dedup-by-embedding variant of MinHash-LSH: same
    bucket-equi-join shape (shuffle on the bucket key, no all-pairs);
    at 100 TB near-identical vectors land in the same sign bucket by
    construction, so recall loss only affects borderline pairs.
    Buckets over ``max_bucket_size`` (e.g. the all-zeros bucket a
    degenerate embedding model emits) are dropped before the
    self-join — same guard as the text-LSH paths."""
    from .dedup import cap_hot_buckets

    # eager tracked persist: the bucketed projection (per-row plane
    # dots + norm) feeds the hot-bucket count AND both self-join
    # sides; carrying the precomputed norm means the per-pair verify
    # does ONE new dot, not cosine()'s dot + two norm re-derivations
    b = tracked_persist(
        cap_hot_buckets(
            corpus.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                l2_norm(F.col(vec_col)).alias("vn"),
                lsh_bucket(F.col(vec_col), planes).alias("bucket"),
            ),
            ["bucket"],
            max_bucket_size,
        )
    )
    b.count()
    x, y = b.alias("x"), b.alias("y")
    cand = x.join(
        y,
        (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.id") < F.col("y.id")),
    ).select(
        F.col("x.id").alias("id_a"),
        F.col("y.id").alias("id_b"),
        F.col("x.v").alias("va"),
        F.col("y.v").alias("vb"),
        (F.col("x.vn") * F.col("y.vn")).alias("nn"),
    )
    return _two_stage_cosine_verify(cand, threshold, ["id_a", "id_b"])


def ann_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    The candidate join is an equi-join on the bucket key — at scale it
    shuffles bucket-keyed rows instead of forming all pairs. Recall is
    traded for the 2^planes-fold candidate reduction (standard ANN
    contract)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


def _approx_cos_matrix_udf(cent_matrix, cent_norms):
    """Arrow-batched approx cosine of every row against the K-centroid
    matrix: one numpy matmul per batch. Float64 error is ~1e-12
    relative — callers must treat any within-3e-6-of-max tie as
    ambiguous and fall back to the decimal-exact path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def scores(v):
        import numpy as np
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype=object)
        M = np.asarray(cent_matrix, dtype=np.float64)  # K × dim
        cn = np.asarray(cent_norms, dtype=np.float64)  # K
        A = np.vstack(v.to_numpy()).astype(np.float64)  # B × dim
        an = np.linalg.norm(A, axis=1)
        an[an == 0] = 1.0
        S = (A @ M.T) / (an[:, None] * cn[None, :])
        return pd.Series(list(S))

    return scores


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: map every corpus vector to its nearest
    centroid — as a PURE PROJECTION, no join and no shuffle.

    The centroid table (id, vector, norm) is inlined into the plan as an
    array literal, so assignment is `transform` + `array_max` +
    `get` evaluated per row inside the scan stage. At 100 TB the
    quantizer is still only K vectors (a trained k-means output is a
    drop-in replacement for the deterministic seed set used here), so
    the inline-literal pattern holds at any corpus scale. Ties break
    to the lowest centroid id (array_position finds the FIRST
    maximum, and the literal array is ordered by centroid id)."""
    spark = corpus.sparkSession
    cent_sorted = sorted((int(c), list(v), n) for c, v, n in centroids)
    # centroid norms arrive precomputed with the centroid rows (same
    # decimal-exact l2_norm as the per-row path, one collect job) and
    # are inlined as double literals — computing them per corpus row
    # (as cosine() would) triples the arithmetic for values that are
    # constants of the quantizer
    cn = {cid: n for cid, _, n in cent_sorted}
    cent_sorted = [(cid, v) for cid, v, _ in cent_sorted]
    cent = F.array(
        *[
            F.struct(
                F.lit(v).alias("cv"),
                F.lit(cn[cid]).alias("cn"),
            )
            for cid, v in cent_sorted
        ]
    )
    cids = F.array(*[F.lit(cid).cast("long") for cid, _ in cent_sorted])
    with_norm = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("vn"),
    )
    # two-stage exact argmax: an Arrow-batched numpy matmul scores
    # every row against all K centroids (~1e3× the throughput of the
    # interpreted K-transform decimal path), and ONLY rows whose top
    # two approx scores sit within 3e-6 of each other pay the
    # decimal-exact argmax. Exactness: the decimal path ranks on
    # round(cos, 6); two cells with unrounded gap > 3e-6 keep their
    # order under both the ≤5e-7 rounding shift and the ~1e-12 float
    # error, so the fast argmax equals the exact one for every
    # unflagged row; flagged rows (incl. exact ties, broken to the
    # lowest cid by first-max array_position) use the decimal arm —
    # evaluated lazily per row inside the CASE, so the interpreted
    # cost is paid only where needed.
    cmat = [v for _, v in cent_sorted]
    cnorms = [cn[cid] for cid, _ in cent_sorted]
    scored = with_norm.withColumn(
        "_approx", _approx_cos_matrix_udf(cmat, cnorms)(F.col("v"))
    )
    srt = F.array_sort(F.col("_approx"))
    # try_element_at: under ANSI, element_at(-2) on a K=1 array throws
    # instead of returning NULL — a single-centroid quantizer must
    # take the unflagged (fast) path, not crash
    gap = F.element_at(srt, -1) - F.coalesce(
        F.try_element_at(srt, F.lit(-2)), F.lit(-2.0)
    )
    # first occurrence of the max (1-based); F.get is 0-based and
    # NULL-safe under ANSI (element_at would throw on a 0 position)
    fast_best = F.array_position(F.col("_approx"), F.array_max("_approx"))
    dec_scores = F.transform(
        cent,
        lambda c: F.round(
            _dot_decimal(F.col("v"), c["cv"]).cast("double")
            / (F.col("vn") * c["cn"]),
            6,
        ),
    )
    exact_best = F.array_position(dec_scores, F.array_max(dec_scores))
    best = F.when(gap < 3e-6, exact_best).otherwise(fast_best)
    return scored.select(
        "id", "v", "vn", F.get(cids, best - 1).alias("centroid_id")
    )


def ivf_assign_broadcast(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float], float]] | DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization via a broadcast centroid join — the
    K-scalable twin of ``ivf_assign``.

    The literal path inlines K×dim doubles into the plan, which is
    shuffle-free but makes plan size (and driver analysis/codegen
    time) grow O(K×dim) — at IVF-realistic K (1024+) × dim 768 that is
    megabytes of plan. Here the centroid table stays a DataFrame: K
    rows are packed into ONE (cid, cv, cn)-struct-array row (sorted by
    cid, so ties still break to the lowest centroid id) and attached
    to every corpus row through a broadcast join on a constant key
    (the constant equality folds away, so the physical plan is a
    BroadcastNestedLoopJoin whose build side is exactly ONE row —
    cost-identical to a broadcast hash join). Plan size is O(1) in K,
    the corpus is still never shuffled (only the K-row centroid
    packing exchanges + one BroadcastExchange), and the per-row argmax
    arithmetic is identical to the literal path — the two variants are
    value-equal by construction."""
    spark = corpus.sparkSession
    if not isinstance(centroids, DataFrame):
        centroids = spark.createDataFrame(
            [
                (int(c), [float(x) for x in v], float(n))
                for c, v, n in centroids
            ],
            "cid long, cv array<double>, cn double",
        )
    packed = centroids.groupBy(F.lit(1).alias("_one")).agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv", "cn"))).alias(
            "_cents"
        )
    )
    with_norm = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("vn"),
        F.lit(1).alias("_one"),
    )
    scored = with_norm.join(F.broadcast(packed), "_one").withColumn(
        "_scores",
        F.transform(
            F.col("_cents"),
            lambda c: F.round(
                _dot_decimal(F.col("v"), c["cv"]).cast("double")
                / (F.col("vn") * c["cn"]),
                6,
            ),
        ),
    )
    best = F.array_position(F.col("_scores"), F.array_max("_scores"))
    return scored.select(
        "id",
        "v",
        "vn",
        F.get(F.col("_cents"), best - 1)["cid"].alias("centroid_id"),
    )


def _dot_f64_impl():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot_f64(va, vb):
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.vstack(va.to_numpy())
        b = np.vstack(vb.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", a, b))

    return dot_f64


def _dot_f64(va: Column, vb: Column) -> Column:
    """Vectorized float64 dot product (Arrow batch → numpy einsum) —
    the PREFILTER arm only; exact decimal rerank follows for anything
    it passes. Deferred UDF registration (created per call) keeps
    module import free of a SparkSession requirement."""
    return _dot_f64_impl()(va, vb)



def _collect_centroids(corpus, n_centroids, id_col, vec_col):
    """The K lowest-id vectors with decimal-exact norms — the
    deterministic, oracle-reproducible quantizer seed (a trained
    k-means table drops in without changing any plan). One bounded
    collect: K rows by design."""
    return [
        (int(r[0]), list(r[1]), float(r[2]))
        for r in corpus.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col, l2_norm(F.col(vec_col)))
        .collect()
    ]


def _pick_assign_fn(cent_rows, quantizer: str):
    """'auto' picks the inlined-literal quantizer while K×dim stays
    under 8192 plan scalars (measured ~25% faster at tiny K) and the
    O(1)-plan broadcast-packed variant beyond."""
    if quantizer == "auto":
        k_dim = sum(len(v) for _, v, _ in cent_rows)
        quantizer = "literal" if k_dim <= 8192 else "broadcast"
    return ivf_assign_broadcast if quantizer == "broadcast" else ivf_assign


def _two_stage_cosine_verify(
    cand: DataFrame, threshold: float, out_cols: list[str]
) -> DataFrame:
    """The shared verify funnel (est_prefilter pattern): a VECTORIZED
    float64 dot (Arrow-batched numpy — ~1e3× the throughput of the
    interpreted per-element decimal HOF) prunes the candidate stream;
    only survivors (+ a 1e-3 margin dwarfing float64 dot error,
    ~1e-12 relative) pay the decimal-exact rerank the oracle
    comparison is pinned to. ``cand`` must carry va/vb/nn plus
    ``out_cols``. The survivor frame persists EAGERLY: the planner
    extracts the Python-UDF predicate into its own evaluation stage
    and would otherwise compute the decimal projection for every
    candidate first (measured 17.6 s vs 0.45 s at sf0.1)."""
    approx = _dot_f64(F.col("va"), F.col("vb")) / F.col("nn")
    pre = tracked_persist(cand.filter(approx >= threshold - 1e-3))
    pre.count()
    return (
        pre.select(
            *out_cols,
            F.round(
                _dot_decimal(F.col("va"), F.col("vb")).cast("double")
                / F.col("nn"),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.3,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = 1000,
    quantizer: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    'SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication'): (id_a < id_b, centroid_id, cos) for vectors in
    the SAME k-means cell with rounded cosine ≥ ``threshold``.

    The embedding-cluster complement of ``embedding_neardup_pairs``:
    sign-LSH buckets by random hyperplanes (recall on near-identical
    vectors), centroid cells bucket by SEMANTIC neighborhood — pairs
    of paraphrase-grade similarity that random planes routinely split
    land in one cell, which is why the published technique
    deduplicates within clusters. Scale shape: assignment is the
    shuffle-free IVF projection (auto literal/broadcast quantizer),
    candidates join on centroid_id only — per-cell quadratic, never
    all-pairs; K grows with the corpus (corpus_size / target cell
    size) so cells stay bounded, and ``max_cell_size`` drops
    degenerate cells (a collapsed embedding model) before the
    self-join, same guard as the LSH paths. Centroids here are the K
    lowest-id vectors (deterministic, oracle-reproducible); a trained
    k-means table (``ivf_train``) swaps in without changing the plan.
    """
    from .dedup import cap_hot_buckets

    cent_rows = _collect_centroids(corpus, n_centroids, id_col, vec_col)
    assign_fn = _pick_assign_fn(cent_rows, quantizer)
    # eager tracked persist, same as the LSH builders: the assignment
    # projection (per-row quantizer argmax) feeds the hot-cell
    # count AND both self-join sides — uncached it re-runs ~4×
    assigned = tracked_persist(assign_fn(corpus, cent_rows, id_col, vec_col))
    assigned.count()
    capped = cap_hot_buckets(assigned, ["centroid_id"], max_cell_size)
    x, y = capped.alias("x"), capped.alias("y")
    cand = x.join(
        y,
        (F.col("x.centroid_id") == F.col("y.centroid_id"))
        & (F.col("x.id") < F.col("y.id")),
    ).select(
        F.col("x.id").alias("id_a"),
        F.col("y.id").alias("id_b"),
        F.col("x.centroid_id").alias("centroid_id"),
        F.col("x.v").alias("va"),
        F.col("y.v").alias("vb"),
        (F.col("x.vn") * F.col("y.vn")).alias("nn"),
    )
    return _two_stage_cosine_verify(
        cand, threshold, ["id_a", "id_b", "centroid_id"]
    )


def semantic_dedup_pairs_between(
    corpus: DataFrame,
    new_pred: Column,
    threshold: float = 0.3,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = 1000,
    quantizer: str = "auto",
) -> DataFrame:
    """Incremental SemDeDup: (new_id, idx_id, centroid_id, cos) pairs
    between the NEW partition of the corpus (rows where ``new_pred``,
    a predicate over the assigned frame — reference the id column as
    ``id``, same convention as ``minhash_lsh_pairs_between``)
    and the already-INDEXED remainder — the day-2 shape of semantic
    dedup, where a fresh crawl batch is screened against the standing
    cell index instead of re-pairing the whole corpus (the
    ``minhash_lsh_pairs_between`` twin on the embedding side).

    Identical funnel to ``semantic_dedup_pairs`` except the cell join
    is new × indexed, never new × new or indexed × indexed: cost
    scales with |new batch| × cell occupancy, not |corpus|². In
    production the indexed side's (id, v, vn, centroid_id) frame is
    the persisted assignment index; here it derives in the same job so
    the DuckDB oracle can replay both sides."""
    from .dedup import cap_hot_buckets

    cent_rows = _collect_centroids(corpus, n_centroids, id_col, vec_col)
    assign_fn = _pick_assign_fn(cent_rows, quantizer)
    assigned = tracked_persist(
        cap_hot_buckets(
            assign_fn(corpus, cent_rows, id_col, vec_col).withColumn(
                "is_new", new_pred
            ),
            ["centroid_id"],
            max_cell_size,
        )
    )
    assigned.count()
    nb = assigned.filter(F.col("is_new")).alias("x")
    ob = assigned.filter(~F.col("is_new")).alias("y")
    cand = nb.join(
        ob, F.col("x.centroid_id") == F.col("y.centroid_id")
    ).select(
        F.col("x.id").alias("new_id"),
        F.col("y.id").alias("idx_id"),
        F.col("x.centroid_id").alias("centroid_id"),
        F.col("x.v").alias("va"),
        F.col("y.v").alias("vb"),
        (F.col("x.vn") * F.col("y.vn")).alias("nn"),
    )
    return _two_stage_cosine_verify(
        cand, threshold, ["new_id", "idx_id", "centroid_id"]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "auto",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus, probe each
    query's ``nprobe`` nearest centroids, exact-rerank only the
    vectors assigned to those centroids.

    The second ANN family next to sign-LSH (`ann_topk_bucketed`):
    where LSH partitions by random hyperplanes, IVF partitions by
    nearest-centroid cells — better recall on clustered corpora, and
    the probe count tunes recall/cost at query time. Scale shape: the
    corpus is touched by (a) the shuffle-free assignment projection
    and (b) one equi-join on centroid_id against the tiny broadcast
    probe list; candidate volume is nprobe/K of the corpus, never all
    pairs. Centroids here are the K lowest-id vectors (deterministic,
    oracle-reproducible); a k-means table swaps in without changing
    the plan. ``quantizer`` picks the assignment path: "literal"
    (inlined plan constants — fastest at tiny K, but plan size grows
    O(K×dim)), "broadcast" (packed centroid row via broadcast join —
    plan O(1) in K), or "auto" (default): literal while K×dim stays
    under 8192 plan scalars, broadcast beyond — measured crossover on
    the benched corpus, where the literal executes ~25% faster at
    K=8×64 while at IVF-realistic K the literal's plan build alone
    costs seconds."""
    from pyspark.sql import Window

    cent_rows = _collect_centroids(corpus, n_centroids, id_col, vec_col)
    assign_fn = _pick_assign_fn(cent_rows, quantizer)
    assigned = assign_fn(corpus, cent_rows, id_col, vec_col)

    cent_df = corpus.sparkSession.createDataFrame(
        [(cid, v) for cid, v, _ in cent_rows], ["cid", "cv"]
    )
    qscore = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cent_df))
        .select(
            "query_id",
            "qv",
            "cid",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("qcos"),
        )
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "cid")
    probes = (
        qscore.withColumn("prn", F.row_number().over(wprobe))
        .filter(F.col("prn") <= nprobe)
        .select(
            "query_id",
            "qv",
            l2_norm(F.col("qv")).alias("qn"),
            F.col("cid").alias("centroid_id"),
        )
    )

    # rerank reuses the corpus norms the assignment already computed
    # (vn) and the per-query norm (qn) — only the cross dot product is
    # new work per candidate; the double ops match cosine() exactly
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "centroid_id",
            F.round(
                _dot_decimal(F.col("qv"), F.col("v")).cast("double")
                / (F.col("qn") * F.col("vn")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "centroid_id",
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


def ivf_train(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float], float]]:
    """Spherical k-means trainer for the IVF quantizer — turns the
    deterministic seed quantizer into a data-fitted one. Returns
    centroid rows in the exact shape ``ivf_assign``/``ivf_topk``
    consume, so a trained quantizer is a drop-in swap.

    Each Lloyd round is one distributed pass: the shuffle-free
    assignment projection, then ONE aggregation keyed on
    (centroid, dim) — K*dim rows cross to the driver per round (a few
    KB), never vectors. Init is the K lowest-id vectors
    (deterministic); empty cells keep their previous centroid. The
    spherical objective (sum of best-centroid cosines) is
    non-decreasing over rounds up to fp noise — asserted in tests.

    Training is an OFFLINE step (like building any index): its output
    feeds the same inlined-literal assignment plan, so query-time cost
    and the 100 TB shape are unchanged."""
    import math

    cents = [
        (int(r[0]), list(r[1]), float(r[2]))
        for r in corpus.filter(F.col(id_col) < k)
        .select(id_col, vec_col, l2_norm(F.col(vec_col)))
        .collect()
    ]
    dim = len(cents[0][1])
    for _ in range(iterations):
        # broadcast quantizer: per-round plan cost stays O(1) in K
        # instead of re-analyzing a K×dim literal every Lloyd round
        assigned = ivf_assign_broadcast(corpus, cents, id_col, vec_col)
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("d", "x"))
            .groupBy("centroid_id", "d")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["centroid_id"]), {})[int(r["d"])] = float(
                r["m"]
            )
        nxt = []
        for cid, old_v, old_n in cents:
            if cid in by_cell:
                v = [by_cell[cid][d] for d in range(dim)]
                n = math.sqrt(sum(x * x for x in v))
                nxt.append((cid, v, n) if n > 0 else (cid, old_v, old_n))
            else:  # empty cell: keep the previous centroid
                nxt.append((cid, old_v, old_n))
        cents = nxt
    return cents


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# --------------------------------------------------------------------------


def _d2_decimal(a: Column, b: Column) -> Column:
    """Exact decimal squared-L2 distance between two equal-length
    float arrays. Each per-element squared difference is one
    deterministic IEEE double op cast to DECIMAL(30,15); the sum is
    exact and order-free — the same determinism contract as
    ``_dot_decimal``."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ).cast(_DEC),
    )
    return F.aggregate(
        diffs, F.lit(0).cast(_DEC), lambda acc, p: (acc + p).cast(_DEC)
    )


def _pq_fast_codes_udf(cb_subs):
    """Arrow-batched PQ encoding: per batch, one vectorized numpy
    squared-L2 against each subspace codebook (B × K × dsub broadcast
    subtract — the same difference-then-square order as the decimal
    path, so float64 error stays ~1e-13 absolute). Returns per row the
    fast argmin codes AND the top-2 distance gap per subspace; callers
    must route any subspace whose gap is within 3e-6 (the 6-dp rounding
    granularity of the exact path, plus float slack) to the
    decimal-exact argmin."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<codes:array<int>, gaps:array<double>>")
    def enc(v):
        import numpy as np
        import pandas as pd

        n_sub = len(cb_subs)
        if len(v) == 0:
            return pd.DataFrame({"codes": [], "gaps": []})
        X = np.vstack(v.to_numpy()).astype(np.float64)  # B × dim
        codes = np.empty((len(X), n_sub), dtype=np.int32)
        gaps = np.empty((len(X), n_sub), dtype=np.float64)
        pos = 0
        for m, C in enumerate(cb_subs):
            C = np.asarray(C, dtype=np.float64)  # K × dsub
            dsub = C.shape[1]
            Xm = X[:, pos : pos + dsub]
            pos += dsub
            d2 = ((Xm[:, None, :] - C[None, :, :]) ** 2).sum(-1)  # B × K
            codes[:, m] = d2.argmin(axis=1)
            if C.shape[0] > 1:
                top2 = np.partition(d2, 1, axis=1)
                gaps[:, m] = top2[:, 1] - top2[:, 0]
            else:
                gaps[:, m] = np.inf
        return pd.DataFrame(
            {"codes": list(codes), "gaps": list(gaps)}
        )

    return enc


def _pq_codebook_frames(spark, cb_vecs, n_sub: int, dsub: int):
    """Codebook in both consumable forms: a tiny (n_sub × n_codes)-row
    broadcast FRAME for the decimal-exact joins (plan O(1) in codebook
    size — an inlined literal tree costs seconds of Catalyst analysis,
    BENCH_NOTES r6) and the plain nested lists the numpy fast-encode
    UDF closes over. ``cb_vecs``: full-dimension vectors indexed by
    code."""
    cb_df = spark.createDataFrame(
        [
            (m, j, [float(x) for x in cb_vecs[j][m * dsub : (m + 1) * dsub]])
            for m in range(n_sub)
            for j in range(len(cb_vecs))
        ],
        "m int, code int, cw array<double>",
    )
    cb_subs = [
        [cb_vecs[j][m * dsub : (m + 1) * dsub] for j in range(len(cb_vecs))]
        for m in range(n_sub)
    ]
    return cb_df, cb_subs


def _pq_encode(
    df: DataFrame,
    key_cols: list[str],
    vec_col: str,
    cb_df: DataFrame,
    cb_subs,
    n_sub: int,
    dsub: int,
) -> DataFrame:
    """Two-stage exact PQ encoding (the ivf_assign contract): the
    Arrow-batched numpy argmin encodes every (row, subspace); only
    subspaces whose top-2 distance gap sits inside the 6-dp rounding
    band of the exact path (< 3e-6) are re-assigned by the
    decimal-exact argmin — a small explode + broadcast codebook join
    over the flagged rows only. Returns ``key_cols`` + a ``codes``
    int array."""
    # LAZY persist: the fast frame feeds BOTH the flagged-subspace
    # funnel and the final code assembly — uncached, the Arrow encode
    # UDF would run twice per row. No eager count: plan-only consumers
    # (plan_audit) pay nothing; the first action materializes it.
    fast = tracked_persist(
        df.select(
            *key_cols,
            F.col(vec_col).alias("_pqv"),
            _pq_fast_codes_udf(cb_subs)(F.col(vec_col)).alias("fc"),
        )
    )
    flagged = (
        fast.filter(F.exists("fc.gaps", lambda g: g < 3e-6))
        .select(
            *key_cols,
            "_pqv",
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
            "fc",
        )
        .filter(F.element_at(F.col("fc.gaps"), F.col("m") + 1) < 3e-6)
        .select(
            *key_cols,
            "m",
            F.slice(F.col("_pqv"), F.col("m") * dsub + 1, dsub).alias("subv"),
        )
    )
    exact = (
        flagged.join(F.broadcast(cb_df), "m")
        .select(
            *key_cols,
            "m",
            F.struct(
                F.round(
                    _d2_decimal(F.col("subv"), F.col("cw")).cast("double"), 6
                ).alias("d2"),
                F.col("code").alias("code"),
            ).alias("sc"),
        )
        .groupBy(*key_cols, "m")
        .agg(F.min("sc")["code"].alias("xcode"))
        .groupBy(*key_cols)
        .agg(
            F.map_from_arrays(
                F.collect_list("m"), F.collect_list("xcode")
            ).alias("xmap")
        )
    )
    return fast.join(exact, key_cols, "left").select(
        *key_cols,
        F.array(
            *[
                F.coalesce(
                    F.element_at(F.col("xmap"), F.lit(m)),
                    F.col("fc.codes").getItem(m),
                )
                for m in range(n_sub)
            ]
        ).alias("codes"),
    )


def _pq_query_tables(
    qdf: DataFrame,
    key_cols: list[str],
    vec_col: str,
    cb_df: DataFrame,
    dsub: int,
) -> DataFrame:
    """Per-query flat ADC distance table: entry m*n_codes + code + 1
    holds the exact decimal d²(query sub-vector m, codeword code)."""
    return (
        qdf.crossJoin(F.broadcast(cb_df))
        .select(
            *key_cols,
            "m",
            "code",
            _d2_decimal(
                F.slice(F.col(vec_col), F.col("m") * dsub + 1, dsub),
                F.col("cw"),
            ).alias("d2"),
        )
        .groupBy(*key_cols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code", "d2"))),
                lambda s: s["d2"],
            ).alias("dtab")
        )
    )


def _pq_adc(n_sub: int, n_codes: int) -> Column:
    """Σ_m dtab[m*n_codes + codes[m]] in exact decimal, rounded once."""
    adc_dec = None
    for m in range(n_sub):
        term = F.element_at(
            F.col("dtab"), F.col("codes").getItem(m) + (m * n_codes + 1)
        )
        adc_dec = term if adc_dec is None else adc_dec + term
    return F.round(adc_dec.cast("double"), 6)


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_sub: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN top-k with asymmetric distance
    computation (Jégou, Douze & Schmid 2011, "Product Quantization for
    Nearest Neighbor Search") — the third ANN family next to sign-LSH
    and IVF, and the one that wins when the corpus must be COMPRESSED:
    each vector is stored as ``n_sub`` one-byte codes instead of
    dim×4-byte floats (here 64 floats → 4 codes, 64×).

    The vector is split into ``n_sub`` contiguous subspaces; each
    subspace has its own ``n_codes``-entry codebook (deterministically
    seeded from the lowest-id vectors' sub-vectors, same contract as
    the IVF quantizer — a trained per-subspace k-means table drops in
    unchanged). Encoding is two-stage exact (the ivf_assign contract):
    an Arrow-batched numpy argmin encodes every (row, subspace), and
    only subspaces whose top-2 distance gap sits inside the 6-dp
    rounding band of the exact path (< 3e-6) are re-assigned by the
    decimal-exact argmin — computed as a small explode + broadcast
    codebook join over the flagged rows only, NOT an inlined literal
    tree (the literal form pushed Catalyst analysis alone past the
    data time at any SF).

    ADC is the part that scales: per QUERY a distance TABLE
    d²(query_sub, codeword) of n_sub × n_codes exact decimals is
    computed ONCE (explode × broadcast codebook join, reassembled as a
    flat sorted array); per (query, neighbor) pair the approximate
    distance is ``n_sub`` array lookups summed in decimal — no
    per-pair float math at all. Plan shape: the corpus is touched by
    one shuffle-free encode projection plus a flagged-subset exact
    pass, then one broadcast nested-loop against the tiny query frame;
    at 100 TB the scan payload per vector is the 4-byte code word, not
    the 256-byte embedding."""
    from pyspark.sql import Window

    cb = sorted(_collect_centroids(corpus, n_codes, id_col, vec_col))
    dim = len(cb[0][1])
    dsub = dim // n_sub
    spark = corpus.sparkSession
    cb_df, cb_subs = _pq_codebook_frames(
        spark, [v for _, v, _ in cb], n_sub, dsub
    )
    enc = _pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col),
        ["neighbor_id"],
        vec_col,
        cb_df,
        cb_subs,
        n_sub,
        dsub,
    )
    q = _pq_query_tables(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        ["query_id"],
        "qv",
        cb_df,
        dsub,
    )
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _pq_adc(n_sub, n_codes).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "adc",
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    n_sub: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composed index (Jégou et al. 2011 §IV — the production
    FAISS `IVFx,PQy` shape): coarse-quantize the corpus into IVF cells,
    then product-quantize each vector's RESIDUAL (v − centroid) —
    residuals concentrate near zero, so the same codebook budget buys
    far lower quantization error than PQ on raw vectors — and answer
    queries by probing ``nprobe`` cells with PER-CELL ADC tables built
    from the query's residual against each probed centroid.

    Determinism contract is the intersection of the two parents: cell
    assignment is the IVF two-stage cosine argmax; PQ codebooks are
    seeded from the residuals of the ``n_codes`` lowest-id
    non-centroid vectors (a trained residual k-means table drops in
    unchanged); encoding is the two-stage numpy/decimal argmin; ADC
    sums exact decimals. Scale shape: one assignment projection + one
    broadcast centroid join (residuals) + the encode passes over the
    corpus; candidates are the nprobe/K fraction of CODES (4 bytes
    each), never vectors; ADC per pair = 4 lookups into the
    (query, cell) table."""
    from pyspark.sql import Window

    spark = corpus.sparkSession
    cent_rows = _collect_centroids(corpus, n_centroids, id_col, vec_col)
    assign_fn = _pick_assign_fn(cent_rows, "auto")
    assigned = assign_fn(corpus, cent_rows, id_col, vec_col)

    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in v]) for cid, v, _ in sorted(cent_rows)],
        "centroid_id long, cv array<double>",
    )
    # LAZY persist: residuals feed the codebook-seed collect AND the
    # encode pass — uncached, the two-stage IVF assignment (an Arrow
    # UDF projection) would run twice over the corpus.
    resid = tracked_persist(
        assigned.join(F.broadcast(cent_df), "centroid_id").select(
            F.col("id"),
            "centroid_id",
            F.zip_with(
                "v", "cv", lambda x, y: x.cast("double") - y
            ).alias("r"),
        )
    )
    # residual codebook seeds: the n_codes lowest-id NON-centroid
    # vectors' residuals (centroids' own residuals are zero — useless
    # codewords). Bounded collect: n_codes rows by construction.
    seed_rows = sorted(
        (int(r[0]), list(r[1]))
        for r in resid.filter(
            (F.col("id") >= n_centroids)
            & (F.col("id") < n_centroids + n_codes)
        )
        .select("id", "r")
        .collect()
    )
    dim = len(seed_rows[0][1])
    dsub = dim // n_sub
    cb_df, cb_subs = _pq_codebook_frames(
        spark, [v for _, v in seed_rows], n_sub, dsub
    )

    enc = _pq_encode(
        resid.select(F.col("id").alias("neighbor_id"), "centroid_id", "r"),
        ["neighbor_id", "centroid_id"],
        "r",
        cb_df,
        cb_subs,
        n_sub,
        dsub,
    )

    # probe: per query the nprobe nearest centroids by rounded cosine
    # (identical rule to ivf_topk), then the query RESIDUAL per probed
    # cell feeds that cell's ADC table
    qbase = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cent_cos = spark.createDataFrame(
        [(int(cid), list(v), float(n)) for cid, v, n in sorted(cent_rows)],
        "cid long, cv array<float>, cn double",
    )
    qscore = qbase.crossJoin(F.broadcast(cent_cos)).select(
        "query_id",
        "qv",
        "cid",
        F.round(
            _dot_decimal(F.col("qv"), F.col("cv")).cast("double")
            / (l2_norm(F.col("qv")) * F.col("cn")),
            6,
        ).alias("qcos"),
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "cid")
    probes = (
        qscore.withColumn("prn", F.row_number().over(wprobe))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("centroid_id"))
    )
    qres = probes.join(F.broadcast(cent_df), "centroid_id").select(
        "query_id",
        "centroid_id",
        F.zip_with("qv", "cv", lambda x, y: x.cast("double") - y).alias("qr"),
    )
    qtabs = _pq_query_tables(
        qres, ["query_id", "centroid_id"], "qr", cb_df, dsub
    )

    scored = (
        enc.join(F.broadcast(qtabs), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "centroid_id",
            _pq_adc(n_sub, n_codes).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "centroid_id",
            F.col("rank").cast("long").alias("rank"),
            "adc",
        )
    )
