"""Dataset-assembly operators over `documents` — splits, sampling,
mixing weights, epoch shuffles, packing, shards, dataset cards (VERDICT
r9 #7 split; see text_ops for the aggregator). All native Column
expressions (codegen'd); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register



@register(
    "pipeline_training_data_prep",
    oracle=r"""
    WITH q AS (
      SELECT doc_id, text,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) BETWEEN 20 AND 1000
    ), keyed AS (
      SELECT doc_id, n_tokens,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS digest
      FROM q
    )
    SELECT digest,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_dups,
           arg_min(n_tokens, doc_id) AS n_tokens
    FROM keyed
    GROUP BY digest
    """,
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep: quality gate (token-length
    window) → normalize → exact dedup keeping the lowest doc_id —
    the composed shape of a pretraining corpus cleaning job. Scale:
    the filter prunes before any shuffle; the only shuffle carries
    (digest, doc_id, n_tokens) — 48 B/doc, never text."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    q = d.select("doc_id", "text", toks.alias("n_tokens")).filter(
        F.col("n_tokens").between(20, 1000)
    )
    digest = F.md5(
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    )
    keyed = q.select("doc_id", "n_tokens", digest.alias("digest"))
    return keyed.groupBy("digest").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_dups"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )


@register(
    "text_hash_split",
    oracle="""
    SELECT doc_id,
           CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS bucket,
           CASE WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 90 THEN 'train'
                WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 95 THEN 'validation'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment: md5 of the
    document key → bucket 0-99 → 90/5/5 split. Hash-based (not
    random) so the split is stable across runs, machines, and
    re-partitions — the property a training pipeline needs for
    reproducible holdout sets. Pure projection: no shuffle, no state."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


@register(
    "doc_pack_token_budget",
    oracle=r"""
    WITH sized AS (
      SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), placed AS (
      SELECT source, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0)
                  AS BIGINT) AS bin
      FROM sized
    )
    SELECT source, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM placed
    GROUP BY source, bin
    """,
)
def doc_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents in doc_id order and cut
    the stream into 2048-token shards — each document's shard is the
    one its FIRST token lands in (concat-and-chunk, the standard
    pretraining packing). Partitioned by `source` so the running sum
    parallelizes per source shard instead of one global window — the
    100 TB formulation (a global order would serialize the cumsum)."""
    from pyspark.sql import Window

    # rebalance=False: one cheap size(split()) projection then a window
    # shuffle (measured 0.33 s -> 0.47 s with the scan rebalance)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    sized = d.select("source", "doc_id", n_tok.alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    placed = sized.withColumn(
        "bin", F.floor(start / F.lit(2048.0)).cast("long")
    )
    return placed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "doc_sample_stratified",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN CAST(concat('0x',
                  substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY lang
    """,
)
def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: a 10% hash-sample per
    language stratum, reported as sampled-vs-total counts. The same
    md5-bucket trick as text_hash_split, so the sample is reproducible
    and join-stable (sampling twice yields the same rows — unlike
    rand()-based sampling, which can't be audited after the fact)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(bucket == 0, 1).otherwise(0)).cast("long").alias("n_sampled"),
    )


@register(
    "doc_balance_per_source",
    oracle="""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS rk
      FROM documents
    )
    WHERE rk <= 20
    """,
)
def doc_balance_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-balanced resampling: cap every source at K=20 documents,
    picked by md5 order — the deterministic, join-free version of the
    per-domain/per-language quota pass that keeps one giant crawl
    source from dominating a training mix. One shuffle on the source
    key; the md5 ranking makes the sample reproducible across runs
    and engines (no rand())."""
    from pyspark.sql import Window

    # rebalance=False: source-partitioned window first, trivial per-row
    # work (r15 interleaved A/B: 0.38 s ON -> 0.20 s OFF at sf0.1)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
    )


@register(
    "doc_mixing_weights",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n,
             CAST(round(sqrt(CAST(COUNT(*) AS DOUBLE)), 9)
                  AS DECIMAL(24,12)) AS wt
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(wt) AS t FROM s)
    SELECT s.source, s.n,
           CAST(s.wt AS DOUBLE) / CAST(tot.t AS DOUBLE) AS weight,
           CAST(floor(CAST(s.wt AS DOUBLE) / CAST(tot.t AS DOUBLE) * 10000)
                AS BIGINT) AS docs_in_10k_sample
    FROM s CROSS JOIN tot
    """,
)
def doc_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the T5/LLaMA data-mixing
    recipe, alpha = 0.5): sampling weight per source proportional to
    n^alpha — upweights small sources relative to proportional
    sampling without letting any source dominate. One count
    aggregation; the sqrt weights round to 9 dp then sum in DECIMAL so
    the normalizing total is order-free; each source's weight and its
    allocation in a 10k-doc sample are fixed-order double ops."""
    # rebalance=False: groupBy(source) count is the first operation,
    # zero per-row work (r15 interleaved A/B: 0.66 s ON -> 0.43 s OFF)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).select(
        "source",
        "n",
        F.round(F.sqrt(F.col("n").cast("double")), 9)
        .cast("decimal(24,12)")
        .alias("wt"),
    )
    tot = s.agg(F.sum("wt").alias("t"))
    weight = F.col("wt").cast("double") / F.col("t").cast("double")
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        weight.alias("weight"),
        F.floor(weight * 10000).cast("long").alias("docs_in_10k_sample"),
    )


@register(
    "doc_shuffle_epoch",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5('ep7:' || CAST(doc_id AS VARCHAR)) AS ord_key
      FROM documents
    ),
    placed AS (
      SELECT doc_id,
             CAST(concat('0x', substring(ord_key, 1, 8)) AS BIGINT) % 8
               AS shard,
             ord_key
      FROM keyed
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_key, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM placed
    """,
)
def doc_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch-level corpus shuffle: every document gets a
    pseudo-random order key md5(seed || id), an 8-way shard from the
    key's head, and a position within its shard — the deterministic
    global shuffle a training run needs so that every re-run (and
    every resumed run) reads the identical byte order. Changing the
    epoch seed re-deals the whole ordering; nothing depends on input
    partitioning. The within-shard rank is the only ordered step and
    ranks 1/8th of the corpus per partition — shard count scales with
    corpus size to bound it."""
    # rebalance=False: shard-partitioned window first, md5-only per-row
    # work (r15 interleaved A/B: 0.31 s ON -> 0.23 s OFF at sf0.1)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    key = F.md5(F.concat(F.lit("ep7:"), F.col("doc_id").cast("string")))
    placed = d.select(
        "doc_id",
        (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 8
        ).alias("shard"),
        key.alias("ord_key"),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return placed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


@register(
    "doc_epoch_upsample",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n,
             CAST(round(sqrt(CAST(COUNT(*) AS DOUBLE)), 9)
                  AS DECIMAL(24,12)) AS wt
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(wt) AS t FROM s),
    rates AS (
      -- target share / natural share: how many times each source's
      -- docs appear in the mixed epoch (scaled so the corpus-average
      -- rate is ~1)
      SELECT s.source,
             (CAST(s.wt AS DOUBLE) / CAST(tot.t AS DOUBLE))
               * (SELECT SUM(n) FROM s) / s.n AS rate
      FROM s CROSS JOIN tot
    ),
    decided AS (
      SELECT d.doc_id, r.rate,
             CAST(floor(r.rate) AS BIGINT)
             + CASE WHEN CAST(concat('0x',
                      substring(md5('up7:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 1000000
                    < CAST(floor((r.rate - floor(r.rate)) * 1000000) AS BIGINT)
               THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN rates r USING (source)
    )
    SELECT doc_id, n_copies,
           CAST(unnest(generate_series(1, CAST(n_copies AS INTEGER)))
                AS BIGINT) AS copy_idx
    FROM decided
    WHERE n_copies > 0
    """,
)
def doc_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-driven epoch upsampling: each source's temperature
    mixing rate (n^0.5 share over natural share) becomes per-document
    copy counts — floor(rate) guaranteed copies plus one stochastic
    copy with probability frac(rate), decided by a seeded md5 coin so
    the epoch is bit-reproducible. Emits (doc_id, copy_idx) rows: the
    materialized upsampled epoch that downstream shuffling/packing
    consumes. Pure projection + sequence-explode; the expansion
    factor is the mixing rate itself."""
    # rebalance=False: groupBy(source) count is the first operation,
    # zero per-row work (r15 interleaved A/B: 0.68 s ON -> 0.49 s OFF)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).select(
        "source",
        "n",
        F.round(F.sqrt(F.col("n").cast("double")), 9)
        .cast("decimal(24,12)")
        .alias("wt"),
    )
    tot = s.agg(
        F.sum("wt").alias("t"), F.sum("n").alias("total_n")
    )
    rates = s.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            (F.col("wt").cast("double") / F.col("t").cast("double"))
            * F.col("total_n")
            / F.col("n")
        ).alias("rate"),
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("up7:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    frac_scaled = F.floor(
        (F.col("rate") - F.floor(F.col("rate"))) * 1_000_000
    ).cast("long")
    decided = (
        d.join(rates, "source")
        .select(
            "doc_id",
            (
                F.floor("rate").cast("long")
                + F.when(coin < frac_scaled, 1).otherwise(0)
            ).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 0)
    )
    return decided.select(
        "doc_id",
        "n_copies",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
        ).alias("copy_idx"),
    )


@register(
    "doc_token_equal_shards",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id, w,
             SUM(w) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - w AS cume,
             SUM(w) OVER () AS total
      FROM w
    )
    SELECT CAST(LEAST(7, (cume * 8) // total) AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS total_tokens
    FROM c
    GROUP BY 1
    """,
)
def doc_token_equal_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-TOKEN corpus sharding (8 shards): documents in doc_id
    order are cut where the cumulative token count crosses each 1/8
    boundary — the split a training pipeline actually needs (equal-doc
    ntile gives wildly uneven token shards under length skew). Runs on
    the DISTRIBUTED weighted ntile (``operators.ntile.
    exact_weighted_ntile``: range-partitioned running weights +
    broadcast offsets, exact integer boundary rule, no unbounded
    window); the oracle states the same rule as one cumulative-sum
    window."""
    from ..operators.ntile import exact_weighted_ntile

    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("w"),
    )
    sharded = exact_weighted_ntile(w, 8, "w", ["doc_id"], "shard")
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("total_tokens"),
    )


@register(
    "doc_dsir_importance_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    words AS (
      SELECT doc_id, lang, unnest(toks) AS w FROM toks
    ),
    db AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substring(md5(w), 1, 8)) AS BIGINT) % 256
               AS bucket,
             COUNT(*) AS n
      FROM words GROUP BY 1, 2, 3
    ),
    gb AS (
      SELECT bucket,
             SUM(n) AS r_b,
             SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS t_b
      FROM db GROUP BY 1
    ),
    tot AS (
      SELECT SUM(r_b) AS r_tot, SUM(t_b) AS t_tot FROM gb
    ),
    terms AS (
      SELECT db.doc_id, db.n,
             CAST(round(
               db.n * (ln(CAST(gb.t_b + 1 AS DOUBLE) / (tot.t_tot + 256))
                       - ln(CAST(gb.r_b + 1 AS DOUBLE) / (tot.r_tot + 256))),
               12) AS DECIMAL(28,12)) AS term
      FROM db JOIN gb USING (bucket) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(term) AS DOUBLE) AS dsir_logweight
    FROM terms GROUP BY doc_id
    """,
)
def doc_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, Data Selection
    via Importance Resampling): per-document log importance =
    Σ_features n_f · (log p_target(f) − log p_raw(f)) over hashed
    unigram features (256 md5 buckets), target = the English slice of
    the corpus, add-1 smoothing on both distributions. The pipeline a
    pretraining team runs to upsample target-like data out of a raw
    crawl.

    Scale shape: one explode → (doc, bucket) count aggregation
    (map-side combined); the GLOBAL bucket table is 256 rows —
    broadcast back; per-(doc,bucket) log-ratio terms are rounded to
    DECIMAL(28,12) before the per-doc sum, so the reduction is
    associative and partitioning-invariant (the payload-entropy
    discipline). No per-row Python, no full-corpus shuffle beyond the
    count aggregation."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    words = toks.select(
        "doc_id", "lang", F.explode("toks").alias("w")
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 256
    )
    db = words.groupBy("doc_id", "lang", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    glob = db.groupBy("bucket").agg(
        F.sum("n").alias("r_b"),
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0)).alias(
            "t_b"
        ),
    )
    tot = glob.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    terms = (
        db.join(F.broadcast(glob), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n",
            F.round(
                F.col("n")
                * (
                    F.log(
                        (F.col("t_b") + 1).cast("double")
                        / (F.col("t_tot") + 256)
                    )
                    - F.log(
                        (F.col("r_b") + 1).cast("double")
                        / (F.col("r_tot") + 256)
                    )
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("term"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum("term").cast("double").alias("dsir_logweight"),
    )


@register(
    "doc_dataset_card_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, lang,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    fpc AS (SELECT fp, COUNT(*) AS c FROM d GROUP BY fp)
    SELECT d.source, d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d.n_tokens)
                AS BIGINT) AS p50_tokens,
           CAST(MIN(d.n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(d.n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dup_docs,
           CAST(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS exact_dup_frac
    FROM d JOIN fpc f USING (fp)
    GROUP BY d.source, d.lang
    """,
)
def doc_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card table (Gebru et al., "Datasheets for
    Datasets"): per (source, language) stratum — document and token
    counts, exact token-length quartile/min/max, and the
    exact-duplicate exposure (documents whose normalized fingerprint
    occurs more than once ANYWHERE in the corpus, not just within the
    stratum — cross-source duplication is precisely what a per-source
    report would otherwise hide). Every corpus release publishes this
    table; here it is one query over the raw documents.

    Scale shape: one tokenize+fingerprint projection; the duplicate
    exposure is a 16-byte-key count aggregate joined back by
    fingerprint; percentiles are exact ordered-set aggregates per
    stratum — one shuffle on the (source, lang) key, no global
    sort."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_tokens"),
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
        ).alias("fp"),
    )
    fpc = base.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    j = base.join(fpc, "fp")
    j.createOrReplaceTempView("_card_base")
    return spark.sql(
        """
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)
                    AS BIGINT) AS p50_tokens,
               CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
               CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exact_dup_docs,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS exact_dup_frac
        FROM _card_base
        GROUP BY source, lang
        """
    )
