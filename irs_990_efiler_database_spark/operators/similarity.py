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

    b = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    b = cap_hot_buckets(b, ["bucket"], max_bucket_size)
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.round(cosine(F.col("x.v"), F.col("y.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


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
