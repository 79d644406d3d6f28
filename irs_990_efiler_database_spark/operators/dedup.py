"""Fuzzy deduplication operators: MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):

- Shingling/minhashing/simhashing are per-row projections — zero
  shuffle, whole-stage codegen'd, linear scans.
- Candidate generation shuffles only (doc_id, band_hash) pairs — never
  document text — and the self-join is an equi-join on the band key, so
  Catalyst plans a shuffled hash join over the band buckets. There is
  NO all-pairs/cartesian stage anywhere.
- Exact Jaccard verification runs only on LSH candidates (joined back
  to shingle sets by id).

Hash portability: all hashes are md5-derived (minhash = lexicographic
min of per-permutation-salted md5 hex; token hashes = first 15 hex
chars as a 60-bit int), so DuckDB reproduces every value exactly —
that is what puts these operators under the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60  # 15 md5 hex chars -> 60-bit token hashes


def normalize_text(col: Column) -> Column:
    """Whitespace-collapse + lowercase (same normalization as exact
    dedup, so the fuzzy and exact paths agree on what "same" means)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of a (normalized) string."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(n))))


def _salted_min(shingles: Column, j: int) -> Column:
    # NB: the salt must be closed over OUTSIDE the lambda — a
    # two-parameter lambda is interpreted by F.transform as
    # (element, index) and would silently salt with the array index
    salt = F.lit(f"#{j}")
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(s, salt))))


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """k-permutation MinHash signature: permutation j is the md5 of the
    shingle salted with '#j'; the signature element is the lexicographic
    minimum hex digest (a valid min-wise hash)."""
    return F.array(*[_salted_min(shingles, j) for j in range(k)])


def band_hashes(sig: Column, bands: int = 4, rows: int = 3) -> Column:
    """LSH banding: band i's key is the md5 of its signature slice."""
    return F.array(
        *[
            F.md5(F.array_join(F.slice(sig, i * rows + 1, rows), "|"))
            for i in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return (inter.cast("double") / union.cast("double"))


def shingled(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, k: int = 12, bands: int = 4, rows: int = 3,
) -> DataFrame:
    """(id, shingles, minhash signature, band hashes) per document."""
    norm = normalize_text(F.col(text_col))
    out = df.select(F.col(id_col).alias("id"), char_shingles(norm, n).alias("sh"))
    out = out.withColumn("sig", minhash_signature(F.col("sh"), k))
    return out.withColumn("bh", band_hashes(F.col("sig"), bands, rows))


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, k: int = 12, bands: int = 4, rows: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact jaccard >= threshold).

    Candidates come from shared LSH band buckets (shuffle on the band
    key only); exact Jaccard then verifies candidates. The plan
    contains no cartesian product (asserted in tests)."""
    # the shingle/signature projection feeds four plan branches (both
    # sides of the band self-join + both jaccard joins); persist so the
    # salted-md5 work runs once per document, not four times
    sh = shingled(df, id_col, text_col, n, k, bands, rows).persist()
    bandsdf = sh.select(
        "id", F.posexplode("bh").alias("band_idx", "band_hash")
    )
    a, b = bandsdf.alias("a"), bandsdf.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets_ = sh.select("id", "sh")
    out = (
        cand.join(sets_.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sets_.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def token_hash(tok: Column) -> Column:
    """60-bit md5-derived token hash (portable: first 15 hex chars)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per document via explode + one grouped bit-vote
    aggregation (the shuffle carries only (id, 8-byte hash) pairs and
    is map-side combined — the scalable shape for simhashing 100 TB)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).select("id", token_hash(F.col("tok")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    voted = toks.groupBy("id").agg(*votes)
    acc: Column = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return voted.select("id", acc.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    band_bits: int = 15, max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate pairs by banded SimHash: candidates share at
    least one 15-bit band of the 60-bit fingerprint; verification is
    the Hamming distance (bit_count of xor)."""
    sh = simhash(df, id_col, text_col)
    nbands = SIMHASH_BITS // band_bits
    mask = (1 << band_bits) - 1
    bandsdf = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    for i in range(nbands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    a, b = bandsdf.alias("a"), bandsdf.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
