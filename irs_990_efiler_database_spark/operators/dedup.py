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
from pyspark.sql import Window as PWindow
from ..caching import tracked_persist
from pyspark.sql import functions as F

SIMHASH_BITS = 60  # 15 md5 hex chars -> 60-bit token hashes


def normalize_text(col: Column) -> Column:
    """Whitespace-collapse + lowercase (same normalization as exact
    dedup, so the fuzzy and exact paths agree on what "same" means)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of a (normalized) string.

    ``col`` MUST be a materialized ATTRIBUTE (aliased in its own
    projection), never an inline computed expression: the lambda body
    evaluates ``col.substr`` once PER SHINGLE, so an inlined
    ``lower(trim(regexp_replace(...)))`` would re-run the normalize
    regex O(len) times per document (the plan_audit HOF-recompute
    gate catches this on the executed plan). Referencing the
    attribute twice here (length bound + lambda) also stops
    CollapseProject from re-inlining the upstream alias."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(n))))


MERSENNE31 = 2147483647  # 2^31 - 1


def perm_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants (a_j odd, b_j), both
    md5-derived so the Spark builder and the SQL oracle generator share
    them byte-for-byte."""
    import hashlib

    out = []
    for j in range(k):
        a = int(hashlib.md5(f"a{j}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:7], 16)
        out.append((a, b))
    return out


def shingle_base_hash(s: Column) -> Column:
    """32-bit md5-derived shingle hash (portable: first 8 hex chars)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def minhash_signature_from_hashes(hashes: Column, k: int = 16) -> Column:
    """k-permutation MinHash signature over PRE-HASHED shingles: k
    affine permutations (a_j·h + b_j) mod (2^31−1) — the classic
    integer minhash; a_j < 2^28 and h < 2^32 keep products in int64.

    Takes the 32-bit base-hash array, not shingle strings: the md5
    projection must be materialized ONCE in its own select — inlined
    under each of the k array_min(transform(...)) calls it would be an
    interpreted (HOFs don't codegen or CSE) k× re-derivation, and the
    16-way-duplicated md5 subtree bloats the plan enough to slow
    compile too."""
    sigs = []
    for a, b in perm_constants(k):
        # close over the constants OUTSIDE the lambda — a two-parameter
        # lambda would be read by F.transform as (element, index)
        av, bv = F.lit(a).cast("long"), F.lit(b).cast("long")
        sigs.append(
            F.array_min(F.transform(hashes, lambda h: (av * h + bv) % MERSENNE31))
        )
    return F.array(*sigs)


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """MinHash signature straight from shingle strings (one md5 per
    shingle). Prefer ``shingled`` / ``minhash_signature_from_hashes``
    in pipelines — this form re-derives the md5 array under every
    permutation unless the optimizer saves it."""
    return minhash_signature_from_hashes(
        F.transform(shingles, shingle_base_hash), k
    )


def band_hashes(sig: Column, bands: int = 4, rows: int = 4) -> Column:
    """LSH banding: band i's key is the md5 of its signature slice."""
    return F.array(
        *[
            F.md5(
                F.array_join(
                    F.transform(F.slice(sig, i * rows + 1, rows), lambda x: x.cast("string")),
                    "|",
                )
            )
            for i in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return (inter.cast("double") / union.cast("double"))


def cap_hot_buckets(
    df: DataFrame, key_cols: list[str], cap: int | None
) -> DataFrame:
    """Drop rows whose bucket key holds more than ``cap`` members.

    Standard LSH practice: a degenerate band key (empty/boilerplate
    text at corpus scale) otherwise yields O(n²) candidate rows inside
    that one bucket BEFORE any prefilter runs — AQE skew-join splits
    the partition but not the row count. Members of an over-cap bucket
    almost certainly share other, selective band keys (a true near-dup
    pair collides in ~every band), so recall loss is confined to
    boilerplate. Dropped keys are observable via
    ``dropped_bucket_keys`` (same aggregation, inverted filter)."""
    if cap is None:
        return df
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_bucket_n"))
    ok = counts.filter(F.col("_bucket_n") <= cap).select(*key_cols)
    return df.join(ok, key_cols, "left_semi")


def dropped_bucket_keys(
    df: DataFrame, key_cols: list[str], cap: int
) -> DataFrame:
    """The bucket keys (with sizes) that ``cap_hot_buckets`` removes —
    run this alongside a capped dedup pass to LOG what was skipped
    instead of silently truncating coverage."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > cap)
    )


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the hash-heavy projection runs on all cores: small inputs
    (a single parquet row group) arrive as 1-2 partitions and would
    serialize the md5 work. At cluster scale the input is already
    well-partitioned and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingled(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, k: int = 16, bands: int = 4, rows: int = 4,
) -> DataFrame:
    """(id, hashed shingle set, minhash signature, band hashes) per
    document.

    ``sh`` carries the 32-bit md5-derived shingle hashes (longs), not
    the strings: each stage lives in its own projection so the md5
    array is computed exactly once (HOF expressions neither codegen
    nor CSE), the cached/verify-joined payload is 8 B per shingle
    instead of a string, and downstream Jaccard over the hash sets is
    identical to string-set Jaccard up to md5-prefix collisions
    (~2^-32 per pair — and both engines hash identically, so the
    oracle comparison is exact either way)."""
    df = _spread(df)
    # normalize in its OWN projection: char_shingles' lambda slices the
    # string per shingle, so the regex normalize must be a materialized
    # attribute, not inlined into the lambda body (O(len^2) otherwise)
    base = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("_norm"),
    )
    out = base.select("id", char_shingles(F.col("_norm"), n).alias("_shs"))
    out = out.select("id", F.transform("_shs", shingle_base_hash).alias("sh"))
    out = out.select(
        "id", "sh", minhash_signature_from_hashes(F.col("sh"), k).alias("sig")
    )
    return out.withColumn("bh", band_hashes(F.col("sig"), bands, rows))


def estimated_jaccard(sig_a: Column, sig_b: Column, k: int) -> Column:
    """MinHash estimate: fraction of agreeing signature positions."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree.cast("double") / F.lit(float(k))


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, k: int = 16, bands: int = 4, rows: int = 4,
    threshold: float = 0.5, est_prefilter: float = 0.25,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact jaccard >= threshold).

    Three-stage funnel, each stage cheaper per-candidate than the next
    is expensive:
    0. hot-bucket cap — band keys with > ``max_bucket_size`` members
       are dropped before the self-join (no O(n²) blowup on a
       degenerate key; see ``cap_hot_buckets``);
    1. banded LSH candidates — shuffle carries (id, band_hash) only;
    2. signature-estimate pre-filter — joins the small (k×32B)
       signature arrays and drops the low-similarity mass before any
       shingle array moves (template-heavy corpora generate degenerate
       buckets whose pairs would otherwise dominate the exact stage);
    3. exact Jaccard on the surviving pairs' shingle sets.
    The plan contains no cartesian product (asserted in tests)."""
    # the shingle/signature projection feeds several plan branches
    # (band self-join sides + the verify joins); persist AND materialize
    # eagerly — a lazy persist lets the self-join's parallel branches
    # race the cache and double-compute the md5 work (observed as 4x
    # run-to-run bench variance)
    sh = tracked_persist(shingled(df, id_col, text_col, n, k, bands, rows))
    sh.count()
    bandsdf = sh.select(
        "id", F.posexplode("bh").alias("band_idx", "band_hash")
    )
    bandsdf = cap_hot_buckets(bandsdf, ["band_idx", "band_hash"], max_bucket_size)
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
    if est_prefilter * k > rows:
        # the estimate stage can only prune when its cutoff exceeds the
        # banding floor: one band collision already guarantees rows/k
        # agreeing positions, so est >= rows/k holds for EVERY banded
        # candidate by construction. At the defaults (0.25 = 4/16) the
        # stage was a provable no-op whose two signature joins cost
        # ~55 of 61 s at sf1 (13.3M candidates, zero dropped) — skip it
        # and let the exact stage see the same pair set either way.
        sigs = sh.select("id", "sig")
        cand = (
            cand.join(sigs.withColumnsRenamed({"id": "id_a", "sig": "sig_a"}), "id_a")
            .join(sigs.withColumnsRenamed({"id": "id_b", "sig": "sig_b"}), "id_b")
            .filter(
                estimated_jaccard(F.col("sig_a"), F.col("sig_b"), k)
                >= est_prefilter
            )
            .select("id_a", "id_b")
        )
    # exact stage: dedupe each shingle multiset ONCE per document and
    # carry its size, so the per-pair work is a single array_intersect
    # — |A∪B| = |A|+|B|-|A∩B| replaces array_union, which would
    # otherwise ALLOCATE a deduped union array per candidate pair just
    # to take its size (measured ~25% of the exact stage at sf1's
    # 13.3M candidates)
    sets_ = sh.select(
        "id",
        F.array_distinct("sh").alias("shd"),
        F.size(F.array_distinct("sh")).alias("n_sh"),
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    out = (
        cand.join(
            sets_.withColumnsRenamed(
                {"id": "id_a", "shd": "sh_a", "n_sh": "n_a"}
            ),
            "id_a",
        )
        .join(
            sets_.withColumnsRenamed(
                {"id": "id_b", "shd": "sh_b", "n_sh": "n_b"}
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.col("n_a") + F.col("n_b") - inter).cast("double")
            ).alias("jaccard"),
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
    toks = _spread(df).select(
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
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by banded SimHash: candidates share at
    least one 15-bit band of the 60-bit fingerprint; verification is
    the Hamming distance (bit_count of xor). Band keys over
    ``max_bucket_size`` are dropped before the self-join
    (``cap_hot_buckets``)."""
    # persist+materialize: the band self-join reads the fingerprint
    # frame twice, and its explode+60-vote aggregation is the cost
    sh = tracked_persist(simhash(df, id_col, text_col))
    sh.count()
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
    bandsdf = cap_hot_buckets(bandsdf, ["band_idx", "band_key"], max_bucket_size)
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
        # verify BEFORE dedup (guide §2.3): hamming is a pure function
        # of (id_a, id_b), so filter-then-distinct is row-identical to
        # distinct-then-filter — but the distinct's exchange now
        # carries only verified pairs, not every banding candidate
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve duplicate PAIRS into duplicate CLUSTERS: connected
    components by min-label propagation — the step that turns LSH
    output into "keep one document per group" (cluster_id = smallest
    doc id in the component, so the keeper is the label itself).

    Each iteration is one shuffle (edges ⋈ labels, then a min-combine);
    propagation converges in O(graph diameter) rounds — near-dup
    clusters are dense (diameter 1-2), so 2-3 rounds in practice, with
    ``max_iterations`` as the adversarial-chain bound. Lineage is
    truncated per round (localCheckpoint), the standard guard for
    iterative Spark plans. Returns (id, cluster_id) for every id
    appearing in any pair."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "lbl"
        )
        new = (
            labels.select("id", "lbl")
            .union(prop)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def minhash_lsh_pairs_between(
    df: DataFrame, new_pred: Column, id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5, k: int = 16, bands: int = 4, rows: int = 4,
    threshold: float = 0.5, est_prefilter: float = 0.25,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Incremental near-dup detection: (new_id, idx_id, jaccard) pairs
    between the NEW partition of the corpus (rows where ``new_pred``)
    and the already-INDEXED remainder — the day-2 shape of corpus
    dedup, where a fresh crawl batch is screened against the standing
    signature index instead of re-pairing the whole corpus.

    Identical funnel to ``minhash_lsh_pairs`` (bucket cap → banded
    candidates → signature-estimate prefilter → exact Jaccard) except
    the band join is new x indexed, never new x new or indexed x
    indexed: the join cost scales with |new batch|, not |corpus|. In
    production the indexed side's (id, bands, sig, sh) frame is the
    persisted signature index; here it is derived in the same job so
    the DuckDB oracle can replay both sides."""
    sh = tracked_persist(
        shingled(df, id_col, text_col, n, k, bands, rows).withColumn(
            "is_new", new_pred
        )
    )
    sh.count()
    bandsdf = sh.select(
        "id", "is_new", F.posexplode("bh").alias("band_idx", "band_hash")
    )
    bandsdf = cap_hot_buckets(bandsdf, ["band_idx", "band_hash"], max_bucket_size)
    nb = bandsdf.filter(F.col("is_new")).select(
        F.col("id").alias("new_id"), "band_idx", "band_hash"
    )
    ob = bandsdf.filter(~F.col("is_new")).select(
        F.col("id").alias("idx_id"), "band_idx", "band_hash"
    )
    cand = (
        nb.join(ob, ["band_idx", "band_hash"])
        .select("new_id", "idx_id")
        .distinct()
    )
    if est_prefilter * k > rows:
        # same banding-floor rule as minhash_lsh_pairs: a band
        # collision guarantees rows/k agreement, so a cutoff at or
        # below it prunes nothing — skip the two signature joins
        sigs = sh.select("id", "sig")
        cand = (
            cand.join(sigs.withColumnsRenamed({"id": "new_id", "sig": "sig_a"}), "new_id")
            .join(sigs.withColumnsRenamed({"id": "idx_id", "sig": "sig_b"}), "idx_id")
            .filter(
                estimated_jaccard(F.col("sig_a"), F.col("sig_b"), k)
                >= est_prefilter
            )
            .select("new_id", "idx_id")
        )
    # same per-doc dedup + size-arithmetic union as minhash_lsh_pairs
    sets_ = sh.select(
        "id",
        F.array_distinct("sh").alias("shd"),
        F.size(F.array_distinct("sh")).alias("n_sh"),
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(
            sets_.withColumnsRenamed(
                {"id": "new_id", "shd": "sh_a", "n_sh": "n_a"}
            ),
            "new_id",
        )
        .join(
            sets_.withColumnsRenamed(
                {"id": "idx_id", "shd": "sh_b", "n_sh": "n_b"}
            ),
            "idx_id",
        )
        .select(
            "new_id",
            "idx_id",
            (
                inter.cast("double")
                / (F.col("n_a") + F.col("n_b") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking (Rabin/rsync-style rolling-boundary
    dedup): (id, chunk_no, chunk_md5) per document, with chunk
    boundaries where the TOKEN's 32-bit md5-derived hash ≡ 0 mod
    ``divisor`` — expected chunk length ≈ divisor tokens.

    Boundaries move WITH the content, which is the whole point: a
    one-token insertion at the start of a near-duplicate shifts every
    fixed-chunk boundary (zero shared chunks for
    ``fdedup_shared_chunk_pairs``) but leaves every content-defined
    boundary after the edit in place, so the shifted copy still
    shares all chunks past the first boundary.

    Scale shape: posexplode + one window per (doc) partition for the
    running boundary count + one (doc, chunk) aggregation — shuffles
    carry (doc_id, pos, token) then 16-byte chunk digests; chunk
    contents never join anything."""
    from pyspark.sql import Window as PWindow

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    boundary = (shingle_base_hash(F.col("tok")) % divisor == 0).cast("int")
    w = PWindow.partitionBy("id").orderBy("pos").rowsBetween(
        PWindow.unboundedPreceding, PWindow.currentRow
    )
    numbered = toks.withColumn("chunk_no", F.sum(boundary).over(w))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
        lambda s: s["tok"],
    )
    return numbered.groupBy("id", "chunk_no").agg(
        F.md5(F.array_join(ordered, " ")).alias("chunk_md5")
    )


def word_ngrams(words: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a MATERIALIZED word-array attribute.

    ``words`` must be an aliased ``split(...)`` column, not an inline
    split expression: the lambda reads ``element_at(words, ...)`` per
    gram, so an inlined split would re-tokenize the document once per
    gram (the plan_audit HOF-recompute gate catches the inlined form
    on the executed plan). Word grams draw from a combinatorially
    larger space than character shingles (vocab^n vs alphabet^n), so
    their document frequencies are heavy-tailed — the regime prefix
    filtering needs. Arrays shorter than n words yield an empty set."""
    grams = F.transform(
        F.slice(words, 1, F.greatest(F.size(words) - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", x, *[F.element_at(words, i + j + 2) for j in range(n - 1)]
        ),
    )
    return F.array_distinct(grams)


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    token_mode: str = "word3",
) -> DataFrame:
    """Exact set-similarity join via prefix filtering (AllPairs /
    PPJoin family, Bayardo et al. 2007): (id_a, id_b, jaccard) for
    every pair with Jaccard >= ``threshold`` — NO false negatives,
    unlike the probabilistic MinHash-LSH path.

    Principle: order each doc's shingle set rarest-token-first (global
    document frequency ascending); two sets with Jaccard >= t MUST
    share a token within each other's first |x| - ceil(t*|x|) + 1
    tokens, so the equi-join runs only over those prefixes. The skew
    that kills naive token joins is structurally absent here: frequent
    tokens sort to the END of every doc and never enter a prefix, so
    per-token candidate lists stay small without a lossy hot-bucket
    cap — which is what makes this the exact-recall complement to
    minhash_lsh_pairs at corpus scale.

    Shape: one token projection (persisted, reused thrice), one
    (token -> df) aggregation, one prefix self-join, one verify join
    over candidates only.

    ``token_mode``: 'word3' (default) joins on word-3-gram sets —
    the heavy-tailed token space where the prefix bound actually
    prunes; 'char5' joins on the character-5-shingle sets shared with
    the MinHash family (same similarity definition, so its output is
    provably a superset of the LSH pairs — see the recall test), at
    the cost of a dense-df token space on short texts.
    """
    t = float(threshold)
    # each derivation stage in its own projection (norm → words →
    # grams): the gram lambdas slice per element, so their inputs must
    # be materialized attributes, never inlined normalize/split trees
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("_norm"),
    )
    if token_mode == "word3":
        words = base.select("id", F.split(F.col("_norm"), " ").alias("_w"))
        tokenized = words.select(
            "id", word_ngrams(F.col("_w"), 3).alias("_toks")
        )
    else:
        tokenized = base.select(
            "id", char_shingles(F.col("_norm"), n).alias("_toks")
        )
    docs = tracked_persist(
        tokenized.select(
            "id",
            F.transform(F.col("_toks"), shingle_base_hash).alias("sh"),
        )
    )
    tok = docs.select("id", F.size("sh").alias("sz"), F.explode("sh").alias("h"))
    dfc = tok.groupBy("h").agg(F.count(F.lit(1)).alias("dfc"))
    w = PWindow.partitionBy("id").orderBy("dfc", "h")
    pref = (
        tok.join(dfc, "h")
        .withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1)
        )
        .select("id", "h")
    )
    a = pref.select(F.col("id").alias("id_a"), "h")
    b = pref.select(F.col("id").alias("id_b"), "h")
    cand = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    xa = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    xb = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(xa, "id_a")
        .join(xb, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


def exact_substring_spans(
    norm: DataFrame,
    w: int,
    id_col: str = "doc_id",
    text_col: str = "t",
    stride: int = 1,
) -> DataFrame:
    """Maximal duplicated-substring spans (the ExactSubstr core): for a
    frame of (id, normalized text), find every maximal character span
    whose W-char windows all appear verbatim in >= 2 distinct docs, and
    report per-doc span count / duplicated chars / fraction.

    Pipeline: windows built as ONE per-doc array then exploded — each
    output row carries (pos, 16-byte md5), never a copy of the text
    (the naive explode+substring form duplicates the full text per
    window, W× the shuffle payload); duplicated-window detection in ONE
    shuffle and ONE pass via dense_rank + running max on the hash
    partitioning (a groupBy+semi-join computes the window table twice,
    and persisting ~1 row/char is wrong at the 100-TB tier); span merge
    is the gaps-and-islands running MAX(end) on a doc partitioning —
    never a global sort."""
    from pyspark.sql import Window

    tcol = F.col(text_col)
    # h = 48-bit md5 prefix as BIGINT, not the 32-char hex string: the
    # window table is ~1 row/char and shuffles on h, so key width IS
    # the network bill (measured 59.7 -> 26 MB shuffled at sf0.1,
    # tools/shuffle_budget.py). Both engines take the same prefix of
    # the same md5, so duplicate decisions stay in lockstep even at
    # the ~3e-3 corpus-wide collision odds; a 100-TB corpus (~1e14
    # windows) would widen to the full 16-byte digest.
    # stride > 1 samples every stride-th window: the window table (and
    # its shuffle, the cost driver at 43:1 vs input per
    # tools/shuffle_budget.py) shrinks by 1/stride; any shared
    # substring of length >= w + stride - 1 still produces a sampled
    # duplicated window in both docs, so long boilerplate/copy spans
    # keep full recall and only near-threshold (length ~w) spans fade
    # — the Lee et al. suffix-array variant has no such knob.
    wins = F.transform(
        F.sequence(F.lit(1), F.length(tcol) - (w - 1), F.lit(stride)),
        lambda i: F.struct(
            i.alias("p"),
            F.conv(
                F.substring(F.md5(tcol.substr(i, F.lit(w))), 1, 12), 16, 10
            )
            .cast("long")
            .alias("h"),
        ),
    )
    win = (
        norm.filter(F.length(text_col) >= w)
        .select(id_col, F.explode(wins).alias("z"))
        .select(id_col, F.col("z.p").alias("p"), F.col("z.h").alias("h"))
    )
    w_h = Window.partitionBy("h").orderBy(id_col)
    w_hall = Window.partitionBy("h").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    spans = (
        win.withColumn("dr", F.dense_rank().over(w_h))
        .withColumn("nd", F.max("dr").over(w_hall))
        .filter(F.col("nd") >= 2)
        .select(id_col, "p", (F.col("p") + (w - 1)).alias("e"))
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = spans.withColumn(
        "is_new",
        (
            F.col("p") > F.coalesce(F.max("e").over(w_prev), F.lit(-1))
        ).cast("int"),
    ).withColumn("isl", F.sum("is_new").over(w_run))
    merged = islands.groupBy(id_col, "isl").agg(
        F.min("p").alias("s"), F.max("e").alias("e")
    )
    perdoc = merged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"),
    )
    return norm.join(perdoc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("dup_chars"), F.lit(0)).cast("long").alias("dup_chars"),
        F.length(text_col).cast("long").alias("n_chars"),
        # empty-text guard: a zero-length doc has zero duplicated
        # fraction, not a divide-by-zero (ANSI mode throws otherwise —
        # caught by the brute-force property test)
        F.when(
            F.length(text_col) > 0,
            F.coalesce(F.col("dup_chars"), F.lit(0)).cast("double")
            / F.length(text_col),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
