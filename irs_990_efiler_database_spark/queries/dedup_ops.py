"""Deduplication operators over `documents` (north-star surface).

Exact dedup is a hash-groupBy. Fuzzy dedup (MinHash-LSH, SimHash,
n-gram Jaccard) lives in ``operators.dedup`` and is surfaced here with
md5-derived hashing so the DuckDB oracle reproduces every value
bit-for-bit — the oracle SQL below re-implements each pipeline stage
in DuckDB list-lambda SQL.

The fixture corpus has no organic near-duplicates at small SF, so the
fuzzy queries run over ``documents`` augmented with deterministic
mutated copies (doc_id + 1_000_000, suffix-append) — both engines
apply the same augmentation, and the known pairs prove the pipeline
finds what it should.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..catalog import load_table
from ..operators.dedup import (
    MERSENNE31,
    SIMHASH_BITS,
    char_shingles,
    minhash_lsh_pairs,
    minhash_lsh_pairs_between,
    normalize_text,
    perm_constants,
    shingled,
    simhash,
    simhash_pairs,
)
from . import register

_NORM = normalize_text


@register(
    "dedup_exact_groups",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, FALSE AS synthetic FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, TRUE AS synthetic
      FROM documents WHERE doc_id < 25
    )
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS group_size,
           MAX(synthetic) AS has_synthetic
    FROM corpus
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups (has_synthetic column flags injected
    gate copies): normalized-text hash → min-id representative.
    Scale: one shuffle on the 16-byte digest.

    The corpus is augmented with EXACT copies of doc_id < 25 under
    offset ids (both sides identically), so duplicate groups exist by
    construction at every SF — the generated documents table has zero
    natural exact duplicates below sf0.1, which made this gate row
    vacuously green (0 rows vs 0 rows) in driver rounds (VERDICT r6
    what's-wrong #3). Every group containing an injected copy is
    LABELED via ``has_synthetic`` (ADVICE r7: a catalog consumer must
    be able to tell fabricated gate groups from organic corpus
    duplicates — at small SF all groups are synthetic; any organic
    group at larger SF surfaces with has_synthetic = false)."""
    # rebalance=False: first op is a digest groupBy over cheap per-row
    # work — the scan rebalance only inflates partial-agg output
    # (measured 0.38 s -> 0.57 s at sf0.1)
    d = load_table(spark, sf_dir, "documents", rebalance=False).select(
        "doc_id", "text", F.lit(False).alias("synthetic")
    )
    corpus = d.unionAll(
        d.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            F.lit(True).alias("synthetic"),
        )
    )
    return (
        corpus.select(
            "doc_id", "synthetic", F.md5(_NORM(F.col("text"))).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.max("synthetic").alias("has_synthetic"),
        )
        .filter(F.col("group_size") > 1)
    )


@register(
    "dedup_exact_keep",
    oracle="""
    SELECT COUNT(*) AS n_kept
    FROM (
      SELECT MIN(doc_id)
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    )
    """,
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving-document count after exact dedup."""
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    return (
        d.select("doc_id", F.md5(_NORM(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep"))
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# ------------------------------------------------------------- fuzzy

# shared synthetic near-dup corpus + MinHash SQL templates now live in
# dedup_shared (round-11: breaks the dedup_ops<->dedup_eval cycle);
# re-imported here so existing import paths (tests pin _augmented etc.)
# keep working
from .dedup_shared import (  # noqa: E402
    _K,
    _ROWS,
    _SQL_BANDS,
    _SQL_BASE,
    _SQL_HASHED,
    _SQL_MH_PAIRS,
    _SQL_SHINGLES,
    _SQL_SIG,
    _SUFFIX,
    _augmented,
)

@register(
    "fdedup_minhash_signature",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}
    SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
           sig[1] AS sig_0, sig[2] AS sig_1
    FROM sig WHERE doc_id < 100
    """,
)
def fdedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle count + MinHash signature head — verifies
    the zero-shuffle shingle/minhash projection stage."""
    sh = shingled(_augmented(spark, sf_dir))
    return sh.filter(F.col("id") < 100).select(
        F.col("id").alias("doc_id"),
        F.size("sh").cast("long").alias("n_shingles"),
        F.col("sig")[0].alias("sig_0"),
        F.col("sig")[1].alias("sig_1"),
    )


@register(
    "fdedup_lsh_buckets",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS}
    SELECT CAST(band_idx AS BIGINT) AS band_idx, band_hash,
           COUNT(*) AS n_docs
    FROM bands
    GROUP BY 1, 2
    HAVING COUNT(*) > 1
    """,
)
def fdedup_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision buckets of the LSH banding stage — the only shuffle in
    candidate generation carries (doc_id, band_hash), never text.

    The (id, bh) projection is persisted before the posexplode:
    projection collapse would otherwise inline the whole interpreted
    shingle->minhash->band HOF tree INTO the Generate and re-evaluate
    it per exploded row (measured 92 s -> ~3 s at sf0.01 — same class
    as the round-3 base-hash and boilerplate fixes). The persist is
    LAZY — the InMemoryRelation boundary alone blocks the collapse;
    the first consuming action pays the one materialization, so
    plan-only consumers (plan_audit) pay nothing."""
    sh = tracked_persist(shingled(_augmented(spark, sf_dir)).select("id", "bh"))
    return (
        sh.select("id", F.posexplode("bh").alias("band_idx", "band_hash"))
        .groupBy(F.col("band_idx").cast("long").alias("band_idx"), "band_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )




@register(
    "fdedup_minhash_pairs",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    {_SQL_MH_PAIRS}
    SELECT id_a, id_b, jaccard FROM mhpairs
    """,
)
def fdedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: banded candidates →
    signature-estimate pre-filter → exact n-gram-Jaccard ≥ 0.5. No
    cartesian product in the plan (asserted in tests)."""
    return minhash_lsh_pairs(_augmented(spark, sf_dir), threshold=0.5)


_SQL_TOKHASH = """
  toks AS (
    SELECT doc_id,
           CAST(concat('0x', substring(md5(unnest(string_split(t, ' '))), 1, 15))
                AS BIGINT) AS h
    FROM norm
  )
"""
_SQL_VOTES = ", ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_SQL_SIMHASH_ACC = " + ".join(
    f"CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
    for b in range(SIMHASH_BITS)
)
_SQL_SIMHASH = f"""
  votes AS (
    SELECT doc_id, {_SQL_VOTES} FROM toks GROUP BY doc_id
  ),
  sim AS (
    SELECT doc_id, {_SQL_SIMHASH_ACC} AS simhash FROM votes
  )
"""


@register(
    "fdedup_simhash",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_TOKHASH}, {_SQL_SIMHASH}
    SELECT doc_id, simhash FROM sim WHERE doc_id < 100
    """,
)
def fdedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints (token-hash bit votes via one
    map-side-combined grouped aggregation)."""
    out = simhash(_augmented(spark, sf_dir))
    return out.filter(F.col("id") < 100).select(
        F.col("id").alias("doc_id"), "simhash"
    )


_SQL_SIM_BANDS = f"""
  simbands AS (
    SELECT doc_id, simhash,
           generate_subscripts([
             (simhash >> 0) & 32767, (simhash >> 15) & 32767,
             (simhash >> 30) & 32767, (simhash >> 45) & 32767], 1) - 1 AS band_idx,
           unnest([
             (simhash >> 0) & 32767, (simhash >> 15) & 32767,
             (simhash >> 30) & 32767, (simhash >> 45) & 32767]) AS band_key
    FROM sim
  ),
  oks AS (
    SELECT band_idx, band_key FROM simbands
    GROUP BY band_idx, band_key HAVING COUNT(*) <= 1000
  ),
  csimbands AS (
    SELECT s.doc_id, s.simhash, s.band_idx, s.band_key
    FROM simbands s JOIN oks USING (band_idx, band_key)
  )
"""
# csimbands mirrors simhash_pairs' max_bucket_size=1000 cap — oracle
# and operator drop the same over-cap band keys at any SF.


@register(
    "fdedup_simhash_pairs",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_TOKHASH}, {_SQL_SIMHASH}, {_SQL_SIM_BANDS}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM csimbands a
    JOIN csimbands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def fdedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-SimHash near-dup pairs: candidates share a 15-bit band;
    verification = Hamming distance ≤ 6."""
    return simhash_pairs(_augmented(spark, sf_dir))


@register(
    "fdedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_HASHED}
    SELECT x.doc_id AS id_a, y.doc_id AS id_b,
           CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)) AS jaccard
    FROM hashed x
    JOIN hashed y
      ON y.doc_id = x.doc_id + 1000000
    """,
)
def fdedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard on the known original→mutated pairs over the
    md5-hashed shingle sets (identical to string-set Jaccard up to
    2^-32 collisions; both engines hash identically) — pins the
    Jaccard arithmetic itself on non-trivial values."""
    sh = shingled(_augmented(spark, sf_dir)).select("id", "sh")
    a = sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"})
    b = sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"})
    return a.join(
        b, F.col("id_b") == F.col("id_a") + 1_000_000
    ).select(
        "id_a",
        "id_b",
        (
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double")
        ).alias("jaccard"),
    )


@register(
    "fdedup_minhash_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM cbands a
      JOIN cbands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
      WHERE CAST(list_sum(list_transform(generate_series(1, {_K}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / {_K}.0 >= 0.25
    ),
    goodpairs AS (
      SELECT c.id_a, c.id_b
      FROM est c
      JOIN hashed x ON x.doc_id = c.id_a
      JOIN hashed y ON y.doc_id = c.id_b
      WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
               / len(list_distinct(x.hs || y.hs)) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM goodpairs
      UNION
      SELECT id_b, id_a FROM goodpairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(lbl) AS cluster_id
    FROM reach
    GROUP BY id
    """,
)
def fdedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: the verified MinHash-LSH pairs resolved into
    connected components (cluster_id = smallest member id = the
    keeper). The Spark side iterates min-label propagation to a
    fixpoint; the oracle computes the same components with a recursive
    transitive-closure CTE — two entirely different algorithms must
    agree on every membership."""
    from ..operators.dedup import connected_components

    pairs = minhash_lsh_pairs(_augmented(spark, sf_dir), threshold=0.5)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


@register(
    "match_blocked_name_pairs",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk
      FROM customer
    ),
    ok AS (
      SELECT blk FROM c GROUP BY blk HAVING COUNT(*) <= 1000
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN ok USING (blk) JOIN c b
      ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def match_blocked_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity matching) — the org-name matching task
    the 990 ecosystem runs constantly, as blocking + verify: candidate
    pairs must share a 16-char name-prefix block (an equi-join, so the
    shuffle carries (block, id, name) and candidates are bounded per
    block — never all-pairs), then exact edit-distance ≤ 1 verifies.
    The same funnel shape as the LSH dedup paths, keyed on a domain
    blocking rule instead of a hash. Real org names are the skewed
    case ("THE UNITED WAY OF…" blocks), so the blocking key runs
    behind the same hot-bucket cap as every LSH candidate generator:
    one degenerate prefix can otherwise cost O(n²) candidates × an
    O(len²) edit distance. The oracle applies the identical cap, so
    operator and oracle agree by construction at any SF; dropped
    blocks are observable via ``dropped_bucket_keys``."""
    c = load_table(spark, sf_dir, "customer")
    return blocked_name_pairs(
        c, id_col="c_custkey", name_col="c_name", block_len=16,
        max_block_size=1000,
    )


def blocked_name_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_len: int = 16,
    max_dist: int = 1,
    max_block_size: int | None = 1000,
) -> DataFrame:
    """Blocking + verify record-linkage core: prefix-block equi-join
    (shuffle carries only (block, id, name)) behind ``cap_hot_buckets``
    so a degenerate block never costs O(n²) edit distances, then exact
    ``levenshtein`` verify on the surviving candidates."""
    from ..operators.dedup import cap_hot_buckets

    c = records.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        F.substring(name_col, 1, block_len).alias("blk"),
    )
    c = cap_hot_buckets(c, ["blk"], max_block_size)
    a = c.select(
        F.col("_id").alias("id_a"), F.col("_name").alias("name_a"), "blk"
    )
    b = c.select(
        F.col("_id").alias("id_b"), F.col("_name").alias("name_b"), "blk"
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= max_dist)
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )


@register(
    "fdedup_incremental_new_docs",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS idx_id
      FROM cbands n
      JOIN cbands o
        ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
      WHERE n.doc_id >= 1000000 AND o.doc_id < 1000000
    ),
    est AS (
      SELECT c.new_id, c.idx_id
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.new_id
      JOIN sig sb ON sb.doc_id = c.idx_id
      WHERE CAST(list_sum(list_transform(generate_series(1, {_K}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / {_K}.0 >= 0.25
    )
    SELECT c.new_id, c.idx_id,
           CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)) AS jaccard
    FROM est c
    JOIN hashed x ON x.doc_id = c.new_id
    JOIN hashed y ON y.doc_id = c.idx_id
    WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)) >= 0.5
    """,
)
def fdedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the augmented near-copies (doc_id >= 1e6)
    play the role of a fresh crawl batch screened against the standing
    corpus — band join is strictly new x indexed, so cost scales with
    the batch, not the corpus (operators.dedup.minhash_lsh_pairs_between)."""
    return minhash_lsh_pairs_between(
        _augmented(spark, sf_dir), F.col("id") >= 1_000_000
    )


@register(
    "fdedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM cbands a
      JOIN cbands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
      WHERE CAST(list_sum(list_transform(generate_series(1, {_K}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / {_K}.0 >= 0.25
    ),
    goodpairs AS (
      SELECT c.id_a, c.id_b
      FROM est c
      JOIN hashed x ON x.doc_id = c.id_a
      JOIN hashed y ON y.doc_id = c.id_b
      WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
               / len(list_distinct(x.hs || y.hs)) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM goodpairs
      UNION
      SELECT id_b, id_a FROM goodpairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    members AS (
      SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
    ),
    q AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_words
      FROM base
    ),
    ranked AS (
      SELECT m.cluster_id, m.doc_id, q.n_words,
             ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                                ORDER BY q.n_words DESC, m.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY m.cluster_id) AS cluster_size
      FROM members m JOIN q ON q.doc_id = m.doc_id
    )
    SELECT cluster_id, doc_id AS keeper_id,
           CAST(n_words AS BIGINT) AS keeper_n_words,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM ranked WHERE rn = 1
    """,
)
def fdedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: near-dup clusters (min-label
    connected components over verified MinHash pairs) composed with a
    quality signal — each cluster keeps its LONGEST member (word
    count, tie-broken by id), the standard keep-best policy of a
    dedup pipeline. One extra shuffle on cluster_id over the cluster
    memberships; the quality signal is a row-local projection."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components

    aug = _augmented(spark, sf_dir)
    pairs = minhash_lsh_pairs(aug, threshold=0.5)
    members = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    q = aug.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), "doc_id"
    )
    ranked = (
        members.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("keeper_id"),
        F.col("n_words").cast("long").alias("keeper_n_words"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


@register(
    "fdedup_cdc_chunk_pairs",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    t AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM w, unnest(generate_series(1, len(toks))) AS u(i)
    ),
    numbered AS (
      SELECT doc_id, pos, tok,
             SUM(CASE WHEN CAST(concat('0x', substring(md5(tok), 1, 8))
                           AS BIGINT) % 64 = 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS chunk_no
      FROM t
    ),
    chunks AS (
      SELECT doc_id, chunk_no,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
      FROM numbered GROUP BY doc_id, chunk_no
    ),
    ok AS (
      SELECT chunk_md5 FROM chunks GROUP BY chunk_md5 HAVING COUNT(*) <= 1000
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS shared_chunks
    FROM chunks a
    JOIN ok USING (chunk_md5)
    JOIN chunks b ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def fdedup_cdc_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup (rolling-hash boundaries — the
    rsync/Rabin fingerprint family): documents sharing any identical
    chunk, where boundaries fall on tokens whose 32-bit hash ≡ 0 mod
    64. The shift-robust complement of fdedup_shared_chunk_pairs:
    a one-token insertion shifts every FIXED chunk boundary (zero
    shared fixed chunks) but leaves content-defined boundaries after
    the edit untouched. Same digest-only funnel: hot-chunk cap, md5
    equi-join, never text."""
    from ..operators.dedup import cap_hot_buckets, cdc_chunks

    d = load_table(spark, sf_dir, "documents")
    c = cdc_chunks(d).select(F.col("id").alias("doc_id"), "chunk_md5")
    c = cap_hot_buckets(c, ["chunk_md5"], 1000)
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_md5") == F.col("b.chunk_md5"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )


@register(
    "fdedup_shared_chunk_pairs",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             md5(unnest(list_transform(
               generate_series(0, CAST(ceil(len(toks) / 50.0) AS BIGINT) - 1),
               j -> array_to_string(toks[j*50+1 : j*50+50], ' ')))) AS chunk_md5
      FROM w
    ),
    ok AS (
      SELECT chunk_md5 FROM c GROUP BY chunk_md5 HAVING COUNT(*) <= 1000
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS shared_chunks
    FROM c a
    JOIN ok USING (chunk_md5)
    JOIN c b ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def fdedup_shared_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication at chunk granularity: documents
    sharing any identical 50-token chunk (the chunker's md5 keys are
    the join keys, so the shuffle carries 16-byte digests — never
    text) with the standard hot-bucket cap before the self-join. This
    is the suffix-array-free approximation of exact substring dedup
    that training pipelines run at corpus scale."""
    from ..operators.dedup import cap_hot_buckets
    from .text_retrieval import text_chunk_fixed

    c = text_chunk_fixed(spark, sf_dir).select("doc_id", "chunk_md5")
    c = cap_hot_buckets(c, ["chunk_md5"], 1000)
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_md5") == F.col("b.chunk_md5"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )


@register(
    "fdedup_containment_pairs",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM cbands a
      JOIN cbands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / least(len(list_distinct(x.hs)), len(list_distinct(y.hs))),
             6) AS containment
    FROM cand c
    JOIN hashed x ON x.doc_id = c.id_a
    JOIN hashed y ON y.doc_id = c.id_b
    WHERE round(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / least(len(list_distinct(x.hs)), len(list_distinct(y.hs))),
             6) >= 0.9
    """,
)
def fdedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap-coefficient) near-dup pairs: |A∩B| over
    the SMALLER shingle set — the measure that catches a document
    embedded inside a longer one (quote-and-extend spam, page + nav
    chrome), which symmetric Jaccard under-scores. Same funnel as the
    LSH paths: capped banded candidates, exact verify on the hashed
    shingle sets only for surviving pairs. The augmented suffix-copies
    are near-fully contained in their originals, so the planted truth
    set separates containment from Jaccard."""
    from ..operators.dedup import cap_hot_buckets, shingled

    sh = tracked_persist(shingled(_augmented(spark, sf_dir)))  # lazy barrier
    bands = sh.select("id", F.posexplode("bh").alias("band_idx", "band_hash"))
    bands = cap_hot_buckets(bands, ["band_idx", "band_hash"], 1000)
    a, b = bands.alias("a"), bands.alias("b")
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
    containment = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.least(
            F.size(F.array_distinct("sh_a")), F.size(F.array_distinct("sh_b"))
        ),
        6,
    )
    return (
        cand.join(sets_.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sets_.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .select("id_a", "id_b", containment.alias("containment"))
        .filter(F.col("containment") >= 0.9)
    )


@register(
    "match_multipass_blocking",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             substring(c_name, 1, 16) AS blk_a,
             concat(CAST(c_nationkey AS VARCHAR), '|',
                    CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR))
               AS blk_b
      FROM customer
    ),
    ok_a AS (SELECT blk_a FROM c GROUP BY blk_a HAVING COUNT(*) <= 1000),
    ok_b AS (SELECT blk_b FROM c GROUP BY blk_b HAVING COUNT(*) <= 1000),
    cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM c a JOIN ok_a USING (blk_a)
      JOIN c b ON a.blk_a = b.blk_a AND a.c_custkey < b.c_custkey
      UNION
      SELECT a.c_custkey, b.c_custkey
      FROM c a JOIN ok_b USING (blk_b)
      JOIN c b ON a.blk_b = b.blk_b AND a.c_custkey < b.c_custkey
    )
    SELECT cand.id_a, cand.id_b,
           CAST(levenshtein(x.c_name, y.c_name) AS BIGINT) AS dist
    FROM cand
    JOIN c x ON x.c_custkey = cand.id_a
    JOIN c y ON y.c_custkey = cand.id_b
    WHERE levenshtein(x.c_name, y.c_name) <= 1
    """,
)
def match_multipass_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass blocking for record linkage: real-world blocking
    keys miss pairs (a typo in the first character defeats a prefix
    block), so production linkage runs SEVERAL independent blocking
    passes — here name-prefix AND (nation, balance-band) — unions the
    candidate sets (dedup by pair), and verifies once. Recall is the
    union of the passes' recalls while cost stays sum-of-blocked-joins
    (each behind the standard hot-bucket cap), never all-pairs."""
    from ..operators.dedup import cap_hot_buckets

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.substring("c_name", 1, 16).alias("blk_a"),
        F.concat_ws(
            "|",
            F.col("c_nationkey").cast("string"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").cast("string"),
        ).alias("blk_b"),
    )

    def blocked(col: str) -> DataFrame:
        side = cap_hot_buckets(c.select("c_custkey", col), [col], 1000)
        a = side.select(F.col("c_custkey").alias("id_a"), col)
        b = side.select(F.col("c_custkey").alias("id_b"), col)
        return (
            a.join(b, col)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )

    cand = blocked("blk_a").unionByName(blocked("blk_b")).distinct()
    names = c.select("c_custkey", "c_name")
    return (
        cand.join(
            names.withColumnsRenamed(
                {"c_custkey": "id_a", "c_name": "name_a"}
            ),
            "id_a",
        )
        .join(
            names.withColumnsRenamed(
                {"c_custkey": "id_b", "c_name": "name_b"}
            ),
            "id_b",
        )
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
    )


@register(
    "fdedup_eval_metrics",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM cbands a
      JOIN cbands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
      WHERE CAST(list_sum(list_transform(generate_series(1, {_K}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / {_K}.0 >= 0.25
    ),
    pred AS (
      SELECT c.id_a, c.id_b
      FROM est c
      JOIN hashed x ON x.doc_id = c.id_a
      JOIN hashed y ON y.doc_id = c.id_b
      WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
               / len(list_distinct(x.hs || y.hs)) >= 0.5
    ),
    truth AS (
      SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
      FROM documents WHERE doc_id < 25
    ),
    tp AS (
      SELECT COUNT(*) AS n FROM pred JOIN truth USING (id_a, id_b)
    )
    SELECT CAST((SELECT COUNT(*) FROM pred) AS BIGINT) AS n_pred,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST(tp.n AS BIGINT) AS n_tp,
           CAST(tp.n AS DOUBLE) / (SELECT COUNT(*) FROM pred)
             AS precision_vs_planted,
           CAST(tp.n AS DOUBLE) / (SELECT COUNT(*) FROM truth) AS recall
    FROM tp
    """,
)
def fdedup_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation harness: the MinHash-LSH pipeline
    scored against the PLANTED truth set (the 25 known suffix-mutated
    copies) — recall tells you the funnel's candidate generation +
    verify thresholds keep the pairs they must; 'precision vs planted'
    is a lower bound (organic near-dups in the corpus count against
    it, legitimately). The measure-your-own-pipeline query every
    production dedup deployment runs on a labeled sample before
    touching thresholds. Counts are exact integers; the two final
    ratios are single double divisions."""
    pred = minhash_lsh_pairs(_augmented(spark, sf_dir), threshold=0.5).select(
        "id_a", "id_b"
    )
    d = load_table(spark, sf_dir, "documents")
    truth = d.filter(F.col("doc_id") < 25).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1_000_000).alias("id_b"),
    )
    n_pred = pred.agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    n_tp = pred.join(truth, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_tp")
    )
    return (
        n_pred.crossJoin(n_truth)
        .crossJoin(n_tp)
        .select(
            "n_pred",
            "n_truth",
            "n_tp",
            (F.col("n_tp").cast("double") / F.col("n_pred")).alias(
                "precision_vs_planted"
            ),
            (F.col("n_tp").cast("double") / F.col("n_truth")).alias("recall"),
        )
    )


@register(
    "fdedup_prefix_filter_pairs",
    oracle=f"""
    WITH {_SQL_BASE},
    toksw AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
      FROM toksw
    ),
    hashed AS (
      SELECT doc_id,
             list_transform(gs,
               s -> CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT)) AS hs
      FROM g
    ),
    tok AS (
      SELECT doc_id, len(hs) AS sz, unnest(hs) AS h FROM hashed
    ),
    dfc AS (SELECT h, COUNT(*) AS dfc FROM tok GROUP BY 1),
    pos AS (
      SELECT t.doc_id, t.h, t.sz,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY d.dfc, t.h) AS pos
      FROM tok t JOIN dfc d USING (h)
    ),
    pref AS (
      SELECT doc_id, h FROM pos
      WHERE pos <= sz - CAST(CEIL(0.5 * sz) AS BIGINT) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)) AS jaccard
    FROM cand c
    JOIN hashed x ON x.doc_id = c.id_a
    JOIN hashed y ON y.doc_id = c.id_b
    WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)) >= 0.5
    """,
)
def fdedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-recall near-dup pairs via prefix filtering (AllPairs /
    PPJoin): the deterministic complement to the MinHash-LSH path —
    same (id_a, id_b, jaccard >= 0.5) contract, but candidates come
    from a rarest-token-first prefix join with a no-false-negative
    guarantee instead of probabilistic banding. Tokens are word
    3-grams (heavy-tailed dfs — the regime where the prefix bound
    prunes; the char-shingle mode is exercised by the LSH-superset
    recall test). Skew-safe without a bucket cap: frequent tokens
    sort to the end of every prefix order and never generate
    candidates (operators.dedup.prefix_filter_pairs)."""
    from ..operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(_augmented(spark, sf_dir))


@register(
    "fdedup_cleaned_corpus",
    oracle=f"""
    WITH RECURSIVE {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM cbands a
      JOIN cbands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
      WHERE CAST(list_sum(list_transform(generate_series(1, {_K}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / {_K}.0 >= 0.25
    ),
    goodpairs AS (
      SELECT c.id_a, c.id_b
      FROM est c
      JOIN hashed x ON x.doc_id = c.id_a
      JOIN hashed y ON y.doc_id = c.id_b
      WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
               / len(list_distinct(x.hs || y.hs)) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM goodpairs
      UNION
      SELECT id_b, id_a FROM goodpairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ),
    members AS (
      SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
    ),
    q AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_words
      FROM base
    ),
    ranked AS (
      SELECT m.cluster_id, m.doc_id, q.n_words,
             ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                                ORDER BY q.n_words DESC, m.doc_id) AS rn
      FROM members m JOIN q ON q.doc_id = m.doc_id
    )
    SELECT b.doc_id,
           CASE WHEN r.doc_id IS NULL THEN 'unique'
                ELSE 'canonical' END AS status
    FROM base b
    LEFT JOIN ranked r ON r.doc_id = b.doc_id
    WHERE r.doc_id IS NULL OR r.rn = 1
    """,
)
def fdedup_cleaned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's final artifact: the KEPT corpus. Composes
    the whole funnel end-to-end — LSH candidates → verified pairs →
    connected components → keep-longest canonical — and emits every
    surviving doc_id tagged 'unique' (never clustered) or 'canonical'
    (its cluster's keeper); non-canonical near-dups are dropped. This
    is the frame a training pipeline actually materializes; the pair /
    cluster / keeper queries are its audit trail. One extra anti-join
    against the bounded cluster-membership frame on top of the
    canonical pass."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components

    aug = _augmented(spark, sf_dir)
    pairs = minhash_lsh_pairs(aug, threshold=0.5)
    members = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    q = aug.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), "doc_id"
    )
    ranked = members.join(q, "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        aug.select("doc_id")
        .join(ranked.select("doc_id", "rn"), "doc_id", "left")
        .filter(F.col("rn").isNull() | (F.col("rn") == 1))
        .select(
            "doc_id",
            F.when(F.col("rn").isNull(), F.lit("unique"))
            .otherwise(F.lit("canonical"))
            .alias("status"),
        )
    )



@register(
    "fdedup_repetition_removal",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    pr AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1),
               j -> array_to_string(toks[j*10+1 : j*10+10], ' ')) AS ps
      FROM w
    ),
    aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN list_append(ps, ps[1])
                  ELSE ps END AS ps
      FROM pr
    ),
    ex AS (
      SELECT doc_id, i - 1 AS para_ix, md5(ps[i]) AS pmd5
      FROM aug, unnest(generate_series(1, len(ps))) AS g(i)
    ),
    marked AS (
      SELECT doc_id, para_ix, pmd5,
             row_number() OVER (PARTITION BY doc_id, pmd5
                                ORDER BY para_ix) AS rn
      FROM ex
    )
    SELECT doc_id,
           COUNT(*) AS n_paras,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(string_agg(CASE WHEN rn = 1 THEN pmd5 END, chr(10)
                          ORDER BY para_ix)) AS cleaned_fp,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS rep_ratio
    FROM marked
    GROUP BY doc_id
    """,
)
def fdedup_repetition_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition removal — the intra-doc complement of
    the cross-doc dedup family (boilerplate paragraphs, scraper echo,
    chorus/header repeats): segment each doc into 10-token paragraphs,
    drop every paragraph already seen earlier in the SAME doc (keep
    first occurrence, preserve order), and emit per-doc metrics plus a
    fingerprint of the cleaned sequence. The fixture corpus has no
    organic intra-doc repeats at small SF, so docs with doc_id % 5 == 0
    get their first paragraph re-appended (same augmentation in the
    oracle) — those must come back with n_removed >= 1 and a cleaned_fp
    equal to the unaugmented sequence's.

    Scale shape: paragraph construction is row-local HOFs; the
    keep-first decision shuffles (doc_id, md5(paragraph)) digests —
    never text — partitioned by a key that embeds doc_id, so no hot
    key can exist; the rebuild groups by doc_id carrying 32-char
    digests. cleaned_fp is the md5 over KEPT paragraph digests in
    order (digest-of-digests), so no stage rematerializes document
    text. Reference analog: none (the R pipeline has no intra-doc
    text hygiene); modeled on the paragraph-dedup stage of public LLM
    corpus pipelines."""
    # rebalance=False: paragraph digests shuffle immediately (window on
    # doc_id-embedded keys); measured 0.64 s -> 0.88 s with the rebalance
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    tk = F.col("toks")
    # tk is referenced both in the sequence bound and the lambda, so
    # CollapseProject cannot inline the split into the HOF body (the
    # plan-audit recompute gate enforces this; same shape as
    # text_retrieval.text_chunk_fixed)
    n_paras = F.ceil(F.size(tk) / F.lit(10.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_paras - 1),
        lambda j: F.concat_ws(" ", F.slice(tk, j * 10 + 1, 10)),
    )
    p0 = w.select("doc_id", F.posexplode(paras).alias("para_ix", "para"))
    # fixture augmentation only (not part of the operator): re-append
    # paragraph 0 as an extra exploded ROW — array surgery on the
    # paras expression would chain projections that Catalyst collapses
    # into the lambda, re-evaluating the split per element
    inject = w.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        n_paras.alias("para_ix"),
        F.concat_ws(" ", F.slice(tk, 1, 10)).alias("para"),
    )
    p = p0.unionByName(inject).select(
        "doc_id", "para_ix", F.md5("para").alias("pmd5")
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id", "pmd5").orderBy("para_ix")
    )
    marked = p.withColumn("rn", rn)
    kept_fp = F.md5(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1, F.struct("para_ix", "pmd5")
                        )
                    )
                ),
                lambda s: s["pmd5"],
            ),
        )
    )
    agg = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        kept_fp.alias("cleaned_fp"),
    )
    return agg.select(
        "doc_id",
        "n_paras",
        "n_removed",
        "cleaned_fp",
        (F.col("n_removed").cast("double") / F.col("n_paras")).alias(
            "rep_ratio"
        ),
    )


@register(
    "fdedup_repetition_cleaned",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    pr AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1),
               j -> array_to_string(toks[j*10+1 : j*10+10], ' ')) AS ps
      FROM w
    ),
    aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN list_append(ps, ps[1])
                  ELSE ps END AS ps
      FROM pr
    ),
    ex AS (
      SELECT doc_id, i - 1 AS para_ix, ps[i] AS para
      FROM aug, unnest(generate_series(1, len(ps))) AS g(i)
    ),
    marked AS (
      SELECT doc_id, para_ix, para,
             row_number() OVER (PARTITION BY doc_id, md5(para)
                                ORDER BY para_ix) AS rn
      FROM ex
    )
    SELECT doc_id, para_ix, para FROM marked WHERE rn = 1
    """,
)
def fdedup_repetition_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLEANED corpus rows from within-doc repetition removal —
    the companion to ``fdedup_repetition_removal``, which gates the
    per-doc metrics + fingerprint but not the output table itself
    (VERDICT r12 next-round #6; same relationship
    ``fdedup_cleaned_corpus`` has to the cross-doc dedup family): every
    KEPT paragraph with its original position and text, hash-gated.

    Scale shape: unlike the metrics query (digest-only shuffles), this
    query's OUTPUT is the paragraph text, so text moves through the
    keep-first window exactly once — the unavoidable materialization
    cost of producing a cleaned corpus; the window key still embeds
    doc_id, so no hot key can exist."""
    # rebalance=False: paragraph digests shuffle immediately (window on
    # doc_id-embedded keys); measured 0.64 s -> 0.88 s with the rebalance
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    tk = F.col("toks")
    n_paras = F.ceil(F.size(tk) / F.lit(10.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_paras - 1),
        lambda j: F.concat_ws(" ", F.slice(tk, j * 10 + 1, 10)),
    )
    p0 = w.select("doc_id", F.posexplode(paras).alias("para_ix", "para"))
    # same fixture augmentation as the metrics query (and its oracle)
    inject = w.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        n_paras.alias("para_ix"),
        F.concat_ws(" ", F.slice(tk, 1, 10)).alias("para"),
    )
    p = p0.unionByName(inject)
    rn = F.row_number().over(
        Window.partitionBy("doc_id", F.md5("para")).orderBy("para_ix")
    )
    return (
        p.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("para_ix").cast("long"), "para")
    )


# round-11 split: the evaluation/linkage-model sub-family moved to
# dedup_eval — re-exported here so import paths and registered names
# are unchanged (this import runs LAST so the shared corpus/SQL
# helpers above already exist when dedup_eval imports them back)
from .dedup_eval import *  # noqa: E402,F401,F403
from .dedup_eval import _ESS_W  # noqa: E402,F401  (underscore skips *)
