"""Dedup EVALUATION + record-linkage-model operators (round-11 split
of the 1,750-line dedup_ops module: this file carries the
LSH-parameter S-curve sweep, cluster-size histogram, SoftDeDup
reweighting, ExactSubstr spans, cross-split leakage audit and the
Fellegi-Sunter linkage model. dedup_ops keeps the candidate-generation
/ clustering / canonicalization surface and re-exports this module, so
registered names and import paths are unchanged. The shared synthetic
near-dup corpus + MinHash SQL templates live in ``dedup_shared`` and
are imported from there; neither sub-family module imports the other
at module top — the layering ``test_module_imports`` guards, because a
tail star-import of a partially-initialized sibling binds nothing,
silently.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..catalog import load_table
from ..operators.dedup import minhash_lsh_pairs
from . import register
from .dedup_shared import (
    _K,
    _NORM,
    _SQL_BANDS,
    _SQL_BASE,
    _SQL_MH_PAIRS,
    _SQL_SHINGLES,
    _SQL_SIG,
    _augmented,
)

def _sweep_band_sql(bands: int, rows: int) -> str:
    """Band-hash CTE body for a (bands, rows) config over the shared
    16-element signature, as DuckDB SQL."""
    elems = ", ".join(
        f"md5(array_to_string(sig[{i * rows + 1}:{i * rows + rows}], '|'))"
        for i in range(bands)
    )
    return f"""
      SELECT doc_id,
             generate_subscripts([{elems}], 1) - 1 AS band_idx,
             unnest([{elems}]) AS band_hash
      FROM sig
    """


@register(
    "fdedup_lsh_param_sweep",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG},
    b2 AS ({_sweep_band_sql(2, 8)}),
    b4 AS ({_sweep_band_sql(4, 4)}),
    b8 AS ({_sweep_band_sql(8, 2)}),
    c2 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM b2 a
      JOIN b2 b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
    ),
    c4 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM b4 a
      JOIN b4 b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
    ),
    c8 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM b8 a
      JOIN b8 b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
    )
    SELECT 2 AS bands, 8 AS rows_per_band,
           (SELECT COUNT(*) FROM c2) AS n_candidates,
           (SELECT COUNT(*) FROM c2
            WHERE id_b = id_a + 1000000) AS n_planted_found
    UNION ALL
    SELECT 4, 4, (SELECT COUNT(*) FROM c4),
           (SELECT COUNT(*) FROM c4 WHERE id_b = id_a + 1000000)
    UNION ALL
    SELECT 8, 2, (SELECT COUNT(*) FROM c8),
           (SELECT COUNT(*) FROM c8 WHERE id_b = id_a + 1000000)
    """,
)
def fdedup_lsh_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve tuning in one pass: the SAME 16-hash MinHash
    signature sliced three ways — (2 bands x 8 rows), (4 x 4),
    (8 x 2) — each reporting candidate volume and planted-pair recall.
    More, narrower bands push the S-curve left (higher recall, more
    candidates); this is the measurement that picks production (b, r)
    for a target similarity threshold. One signature computation
    feeds all three configs (persisted; banding is a projection), so
    the sweep costs one corpus scan plus three capped band joins."""
    from ..operators.dedup import band_hashes, cap_hot_buckets, shingled

    sh = tracked_persist(shingled(_augmented(spark, sf_dir)).select("id", "sig"))
    out = None
    for bands, rows in ((2, 8), (4, 4), (8, 2)):
        bd = sh.select(
            "id",
            F.posexplode(band_hashes(F.col("sig"), bands, rows)).alias(
                "band_idx", "band_hash"
            ),
        )
        bd = cap_hot_buckets(bd, ["band_idx", "band_hash"], None)
        a = bd.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
        b = bd.select(F.col("id").alias("id_b"), "band_idx", "band_hash")
        cand = (
            a.join(b, ["band_idx", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        row = cand.agg(
            F.lit(bands).cast("int").alias("bands"),
            F.lit(rows).cast("int").alias("rows_per_band"),
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                (F.col("id_b") == F.col("id_a") + 1_000_000).cast("long")
            ).alias("n_planted_found"),
        ).select("bands", "rows_per_band", "n_candidates", "n_planted_found")
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "fdedup_cluster_size_histogram",
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
    sizes AS (
      SELECT cluster_id, COUNT(*) AS sz FROM members GROUP BY 1
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
)
def fdedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-structure fingerprint: the distribution of near-dup
    cluster sizes (how much of the corpus lives in pairs vs larger
    duplicate families) — the first chart a dedup report shows, and
    the input to removal-budget planning. Frequencies of the bounded
    cluster-membership frame; everything upstream is the shared LSH
    funnel."""
    from pyspark.sql import functions as _F

    from ..operators.dedup import connected_components

    pairs = minhash_lsh_pairs(_augmented(spark, sf_dir), threshold=0.5)
    members = connected_components(pairs)
    sizes = members.groupBy("cluster_id").agg(
        _F.count(_F.lit(1)).alias("sz")
    )
    return sizes.groupBy(
        _F.col("sz").cast("long").alias("cluster_size")
    ).agg(
        _F.count(_F.lit(1)).cast("long").alias("n_clusters"),
        _F.sum("sz").cast("long").alias("n_docs"),
    )


@register(
    "fdedup_soft_reweight",
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
    sizes AS (
      SELECT cluster_id, COUNT(*) AS cluster_size FROM members GROUP BY 1
    )
    SELECT base.doc_id,
           COALESCE(m.cluster_id, base.doc_id) AS cluster_id,
           CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
           1.0 / COALESCE(s.cluster_size, 1) AS weight
    FROM base
    LEFT JOIN members m ON m.doc_id = base.doc_id
    LEFT JOIN sizes s ON s.cluster_id = m.cluster_id
    """,
)
def fdedup_soft_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup: instead of DROPPING near-duplicates, every document
    keeps weight 1/|cluster| (singletons keep 1.0) — the
    training-loss reweighting alternative to hard dedup (each
    duplicated content unit contributes one document's worth of
    gradient in expectation, without discarding the stylistic
    variation across copies). Composes the verified MinHash-LSH pairs
    → connected components → cluster sizes, then a LEFT join back to
    the corpus; the weight is one exact integer division. Same scale
    posture as the cluster pipeline it reuses (banded candidates,
    capped buckets, one shuffle per CC round); the reweight join
    broadcasts the (tiny) cluster-membership frame."""
    from ..operators.dedup import connected_components

    corpus = _augmented(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, threshold=0.5)
    members = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    mem = members.join(F.broadcast(sizes), "cluster_id")
    return (
        corpus.select("doc_id")
        .join(F.broadcast(mem), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
            (
                F.lit(1.0)
                / F.coalesce(F.col("cluster_size"), F.lit(1))
            ).alias("weight"),
        )
    )


# ------------------------------------------------- exact substrings

_ESS_W = 30  # window width (chars); Lee et al. use 50 tokens at CC scale


@register(
    "fdedup_exact_substring_spans",
    oracle=f"""
    WITH {_SQL_BASE},
    win AS (
      SELECT doc_id, i AS p, i + {_ESS_W - 1} AS e,
             CAST(concat('0x',
                  substring(md5(substring(t, i, {_ESS_W})), 1, 12))
                  AS BIGINT) AS h
      FROM norm, unnest(generate_series(1, len(t) - {_ESS_W - 1})) AS g(i)
      WHERE len(t) >= {_ESS_W}
    ),
    duph AS (
      SELECT h FROM win GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    spans AS (
      SELECT w.doc_id, w.p, w.e FROM win w JOIN duph USING (h)
    ),
    flagged AS (
      SELECT doc_id, p, e,
             CASE WHEN p > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS is_new
      FROM spans
    ),
    islands AS (
      SELECT doc_id, p, e,
             SUM(is_new) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS UNBOUNDED PRECEDING) AS isl
      FROM flagged
    ),
    merged AS (
      SELECT doc_id, isl, MIN(p) AS s, MAX(e) AS e
      FROM islands GROUP BY 1, 2
    ),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s + 1) AS dup_chars
      FROM merged GROUP BY 1
    )
    SELECT n.doc_id,
           CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(p.dup_chars, 0) AS BIGINT) AS dup_chars,
           CAST(len(n.t) AS BIGINT) AS n_chars,
           CASE WHEN len(n.t) > 0
                THEN CAST(COALESCE(p.dup_chars, 0) AS DOUBLE) / len(n.t)
                ELSE 0.0 END AS dup_frac
    FROM norm n LEFT JOIN perdoc p USING (doc_id)
    """,
)
def fdedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): find every maximal span of
    text that appears verbatim in >= 2 distinct documents, and report
    the per-document duplicated-character fraction — the statistic the
    span-removal pass is driven by.

    The reference algorithm builds a corpus suffix array; the
    cluster-native formulation here is the rolling-window hash join:
    every W-char window is hashed (one md5, 16-byte key), windows
    whose hash occurs in >= 2 docs are "duplicated", and overlapping
    duplicated windows are merged into maximal spans with a
    gaps-and-islands pass (running MAX(end) over a doc-partitioned
    window). Scale shape: the window table is ~1 row/char — the same
    amplification as char-shingle MinHash — aggregated by a 16-byte
    key with map-side combine; the span merge is a doc-partitioned
    (never global) sort; no pair join anywhere, so a phrase shared by
    a million docs costs one hash group, not a million-squared pair
    set. Stride can be raised above 1 to trade recall for cost at
    the 100-TB tier."""
    from ..operators.dedup import _spread, exact_substring_spans

    corpus = _spread(_augmented(spark, sf_dir))
    norm = corpus.select("doc_id", _NORM(F.col("text")).alias("t"))
    return exact_substring_spans(norm, _ESS_W)


# ------------------------------------------------- cross-split leakage

_SQL_SPLIT_OF = """
    CASE WHEN CAST(concat('0x', substring(md5(CAST({c} AS VARCHAR)), 1, 8))
              AS BIGINT) %% 100 < 90 THEN 'train'
         WHEN CAST(concat('0x', substring(md5(CAST({c} AS VARCHAR)), 1, 8))
              AS BIGINT) %% 100 < 95 THEN 'validation'
         ELSE 'test' END
""".replace("%%", "%")


@register(
    "fdedup_cross_split_leakage",
    oracle=f"""
    WITH {_SQL_BASE}, {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
    {_SQL_MH_PAIRS},
    labeled AS (
      SELECT LEAST({_SQL_SPLIT_OF.format(c="id_a")},
                   {_SQL_SPLIT_OF.format(c="id_b")}) AS split_lo,
             GREATEST({_SQL_SPLIT_OF.format(c="id_a")},
                      {_SQL_SPLIT_OF.format(c="id_b")}) AS split_hi
      FROM mhpairs
    )
    SELECT split_lo, split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END AS INT)
             AS is_leak
    FROM labeled
    GROUP BY 1, 2
    """,
)
def fdedup_cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: count near-duplicate pairs (MinHash-LSH,
    Jaccard >= 0.5) that STRADDLE the deterministic train/validation/test
    hash split — the check that catches what per-split dedup cannot: a
    document deduplicated within train can still have a near-copy in
    test, silently inflating eval scores (the contamination mechanism
    Lee et al. 2021 and the GPT-3 appendix both document). Run this
    BEFORE freezing a split; any is_leak=1 row is a pair to collapse or
    re-split.

    Scale shape: the pair set is the already-bucketed LSH join (never
    all-pairs); split labels are pure md5 expressions on the pair ids —
    no join against a split table — and the output aggregates to at
    most 6 split-pair rows."""
    from .dedup_ops import fdedup_minhash_pairs  # lazy: sibling module

    pairs = fdedup_minhash_pairs(spark, sf_dir)

    def split_of(c: F.Column) -> F.Column:
        b = (
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 100
        )
        return (
            F.when(b < 90, F.lit("train"))
            .when(b < 95, F.lit("validation"))
            .otherwise(F.lit("test"))
        )

    sa, sb = split_of(F.col("id_a")), split_of(F.col("id_b"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_lo"),
            F.greatest(sa, sb).alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            (F.col("split_lo") != F.col("split_hi")).cast("int").alias("is_leak"),
        )
    )


@register(
    "match_fellegi_sunter",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey AS nat, c_mktsegment AS seg,
             CAST(floor(c_acctbal / 100.0) AS BIGINT) AS balb
      FROM customer
    ),
    nfrq AS (SELECT nat, COUNT(*) AS cnt FROM c GROUP BY nat),
    sfrq AS (SELECT seg, COUNT(*) AS cnt FROM c GROUP BY seg),
    u AS (
      SELECT (SELECT COUNT(*) FROM c) AS n,
             (SELECT SUM(cnt * cnt) FROM nfrq) AS ssq_nat,
             (SELECT SUM(cnt * cnt) FROM sfrq) AS ssq_seg
    ),
    ok AS (
      SELECT balb FROM c GROUP BY balb HAVING COUNT(*) <= 1000
    ),
    pairs AS (
      SELECT CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END AS agree_nat,
             CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS agree_seg
      FROM c a JOIN ok USING (balb) JOIN c b
        ON a.balb = b.balb AND a.c_custkey < b.c_custkey
    ),
    pat AS (
      SELECT agree_nat, agree_seg, COUNT(*) AS n_pairs
      FROM pairs GROUP BY agree_nat, agree_seg
    )
    SELECT CAST(agree_nat AS INTEGER) AS agree_nat,
           CAST(agree_seg AS INTEGER) AS agree_seg,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round(CAST(ssq_nat AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS u_nat,
           round(CAST(ssq_seg AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS u_seg,
           round(
             (CASE WHEN agree_nat = 1
               THEN log2(0.95 / round(CAST(ssq_nat AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9))
               ELSE log2(0.05 / (1.0 - round(CAST(ssq_nat AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9)))
              END)
             + (CASE WHEN agree_seg = 1
               THEN log2(0.95 / round(CAST(ssq_seg AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9))
               ELSE log2(0.05 / (1.0 - round(CAST(ssq_seg AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9)))
              END), 6) AS pattern_weight
    FROM pat, u
    """,
)
def match_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter (1969) probabilistic record-linkage weights: the
    agreement-pattern table for balance-bucket-blocked customer pairs,
    scored with log2(m/u) per agreeing field and log2((1−m)/(1−u)) per
    disagreeing field. The u-probabilities (chance agreement between
    NON-matches) come from the data exactly — u_f = Σ_v cnt_v² / N²,
    the collision probability of the field's empirical distribution —
    while m is the standard declared prior (0.95); the pattern weight
    is the evidence (in bits) a pair's agreement vector contributes
    toward match status. This is the scoring layer the blocked /
    multipass linkage queries feed in a production linkage pipeline
    (reference context: the 990 ecosystem's org-name matching).

    Determinism: u-probabilities are one double division of exact
    integer sums ROUNDED to 9 places before entering log2, and the
    weight expression has one fixed operation order, so the doubles
    hash identically on both engines. Scale shape: two vocab-bounded
    frequency aggregations + a 1-row u-frame broadcast; candidate
    pairs are block-bounded (``cap_hot_buckets`` on the balance
    bucket, same cap in the oracle) and collapse immediately to a
    ≤4-row pattern aggregate — the pair frame never materializes
    wider than (agree, agree)."""
    from ..operators.dedup import cap_hot_buckets

    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey",
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 100.0).cast("long").alias("balb"),
    )
    n1 = c.agg(F.count(F.lit(1)).alias("n"))
    ssq_nat = (
        c.groupBy("nat")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("ssq_nat"))
    )
    ssq_seg = (
        c.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("ssq_seg"))
    )
    u = n1.crossJoin(ssq_nat).crossJoin(ssq_seg)

    capped = cap_hot_buckets(c, ["balb"], 1000)
    a = capped.select(
        F.col("c_custkey").alias("ka"),
        F.col("nat").alias("nat_a"),
        F.col("seg").alias("seg_a"),
        "balb",
    )
    b = capped.select(
        F.col("c_custkey").alias("kb"),
        F.col("nat").alias("nat_b"),
        F.col("seg").alias("seg_b"),
        "balb",
    )
    pat = (
        a.join(b, "balb")
        .filter(F.col("ka") < F.col("kb"))
        .select(
            F.when(F.col("nat_a") == F.col("nat_b"), 1)
            .otherwise(0)
            .alias("agree_nat"),
            F.when(F.col("seg_a") == F.col("seg_b"), 1)
            .otherwise(0)
            .alias("agree_seg"),
        )
        .groupBy("agree_nat", "agree_seg")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    nd = F.col("n").cast("double")
    u_nat = F.round(F.col("ssq_nat").cast("double") / (nd * nd), 9)
    u_seg = F.round(F.col("ssq_seg").cast("double") / (nd * nd), 9)
    w_nat = F.when(F.col("agree_nat") == 1, F.log2(0.95 / u_nat)).otherwise(
        F.log2(0.05 / (1.0 - u_nat))
    )
    w_seg = F.when(F.col("agree_seg") == 1, F.log2(0.95 / u_seg)).otherwise(
        F.log2(0.05 / (1.0 - u_seg))
    )
    return pat.crossJoin(F.broadcast(u)).select(
        F.col("agree_nat").cast("int").alias("agree_nat"),
        F.col("agree_seg").cast("int").alias("agree_seg"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        u_nat.alias("u_nat"),
        u_seg.alias("u_seg"),
        F.round(w_nat + w_seg, 6).alias("pattern_weight"),
    )
