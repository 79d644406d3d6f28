"""Text-analysis operators over the `documents` table (north-star
training-data-pipeline surface): token counting, quality scoring,
fingerprinting, language-ID. All native Column expressions (codegen'd);
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..catalog import load_table
from . import register


def _spread_docs(d: DataFrame) -> DataFrame:
    """Spread the documents frame across cores before interpreted
    HOF-lambda work (the documents table arrives as 1-2 parquet
    partitions at test SF; a no-op on a well-partitioned corpus)."""
    from ..operators.dedup import _spread

    return _spread(d)


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(length(text) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')) AS chars_per_token
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + chars/token ratio (quality signal)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (F.length("text").cast("double") / toks).alias("chars_per_token"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           round(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS space_ratio,
           CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 20 AND 1000
                THEN 1 ELSE 0 END AS len_ok
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: space density + length gate —
    the shape of a pretraining quality filter."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    spaces = F.length(F.regexp_replace("text", "[^ ]", "")).cast("double")
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.round(spaces / F.length("text"), 6).alias("space_ratio"),
        F.when(toks.between(20, 1000), 1).otherwise(0).alias("len_ok"),
    )


_STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "la", "los", "y", "es", "un", "una"),
}


def _sql_lang_scores() -> str:
    parts = []
    for lang, words in _STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"len(list_filter(toks, t -> t IN ({lst}))) AS s_{lang}"
        )
    return ", ".join(parts)


@register(
    "text_lang_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    scores AS (
      SELECT doc_id, {_sql_lang_scores()} FROM toks
    )
    SELECT doc_id,
           CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
           CAST(s_fr AS BIGINT) AS s_fr, CAST(s_es AS BIGINT) AS s_es,
           CASE
             WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es'
           END AS lang_pred
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: per-language stopword hit counts
    over the token stream, argmax with a deterministic preference
    order — the shape of a fastText-style lang filter, as pure
    codegen'd expressions."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    scores = {}
    for lang, words in _STOPWORDS.items():
        ws = [F.lit(w) for w in words]
        scores[lang] = F.size(
            F.filter(toks, lambda t: t.isin([w for w in _STOPWORDS[lang]]))
        ).cast("long")
    s = {k: F.col(f"s_{k}") for k in _STOPWORDS}
    pred = (
        F.when(
            (s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["es"] == 0),
            F.lit("unknown"),
        )
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return d.select(
        "doc_id", *[scores[k].alias(f"s_{k}") for k in _STOPWORDS]
    ).withColumn("lang_pred", pred)


_BPE_PATTERN = r"'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"
_BPE_SQL = _BPE_PATTERN.replace("'", "''")


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pretokenizer counting: regex word/number/punct
    pieces (the token-budget estimator of a training pipeline) next to
    plain whitespace tokens."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_ws_tokens"),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    )
    WHERE rnk <= 3 AND doc_id < 50
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: map-side-combined tf, a
    broadcastable df dimension, smoothed idf (rounded — ln() is not
    correctly-rounded across libms), window top-k."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = toks.select(F.count_distinct("doc_id").alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "term", "tfidf", "rnk")
    )


@register(
    "text_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top word-bigrams (n-gram frequency analysis):
    per-row bigram construction, map-side-combined counting, top-k.

    Two-projection build (the _with_3grams pattern): the token split
    materializes into its own column first, then the n-gram lambda
    slices the attribute. Interpreted HOF lambdas re-evaluate computed
    argument expressions per element — building grams straight off
    split() re-ran the regex once per token (the 27x class documented
    in BENCH_NOTES round 5)."""
    d = load_table(spark, sf_dir, "documents")
    w = _spread_docs(d).select(
        F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    return (
        _exploded_2grams(w)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercased
    text (portable across engines, unlike murmur3)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return d.select("doc_id", F.md5(norm).alias("fp"))


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
    "text_decontaminate_13gram",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+12], ' ') AS g
      FROM toks, UNNEST(range(1, len(t) - 11)) AS u(i)
    ),
    e AS (SELECT doc_id, g FROM grams WHERE doc_id < 50),
    c AS (SELECT doc_id, g FROM grams WHERE doc_id >= 50)
    SELECT e.doc_id AS eval_id, c.doc_id AS corpus_id,
           COUNT(*) AS shared_13grams
    FROM e JOIN c USING (g)
    GROUP BY 1, 2
    """,
)
def text_decontaminate_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    13-gram (word-level) with the eval set (here: doc_id < 50), with
    the count of distinct shared 13-grams per (eval, corpus) pair —
    the standard n-gram-overlap contamination check run before
    training.

    Scale shape: the eval set is bounded by definition (benchmark
    suites, not the corpus), so its distinct 13-grams BROADCAST; the
    corpus side streams map-side through the hash join — no shuffle of
    corpus text, never all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    # explode-positions form: the token split materializes below the
    # Generate and each 13-gram is one codegen'd slice of the carried
    # array — no HOF lambda, so nothing for CollapseProject to inline
    # back into a per-element recompute (plan_audit gate (d)). The
    # within-doc dedup the old array_distinct did moves to ONE distinct
    # over the post-join survivors — shared 13-grams are the rare
    # exception, so that shuffle is negligible vs deduping the corpus.
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    inst = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.when(
                F.size("t") >= 13, F.sequence(F.lit(1), F.size("t") - 12)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    ).select(
        "doc_id", F.array_join(F.slice("t", F.col("pos"), 13), " ").alias("g")
    )
    ev = (
        inst.filter(F.col("doc_id") < 50)
        .select(F.col("doc_id").alias("eval_id"), "g")
        .distinct()
    )
    corp = inst.filter(F.col("doc_id") >= 50).select(
        F.col("doc_id").alias("corpus_id"), "g"
    )
    return (
        corp.join(F.broadcast(ev), "g")
        .select("eval_id", "corpus_id", "g")
        .distinct()
        .groupBy("eval_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("shared_13grams"))
    )


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

    d = load_table(spark, sf_dir, "documents")
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


_GOPHER_STOPWORDS = ["the", "a", "of", "to", "and", "in", "for", "is"]


def _exploded_2grams(toks_frame: DataFrame) -> DataFrame:
    """One row per word-2-gram INSTANCE from a frame carrying a
    materialized ``toks`` array column. The toks attribute is
    referenced ≥3 times (size bound + slice lambda), so CollapseProject
    keeps the split materialized and the Generate-inlined lambda
    touches only the attribute — gate-(d) clean (shared by
    text_top_bigrams and text_pmi_collocations so a future HOF-shape
    fix can't drift between them)."""
    tk = F.col("toks")
    grams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_frame.select(F.explode(grams).alias("bigram"))


def _with_3grams(d: DataFrame) -> DataFrame:
    """(doc_id, g3: array of word 3-grams), built in TWO projections:
    the token split materializes first, then the n-gram lambda slices
    it. Higher-order-function lambdas are interpreted and re-evaluate
    their argument expression per element — building the grams straight
    off the split() re-ran the regex three times per gram and measured
    27x slower at sf0.1 (16.1s -> 0.6s; same lesson as the minhash
    base-hash materialization, BENCH_NOTES round 3). The input is also
    spread across cores first: the documents table arrives as 1-2
    parquet partitions at test SF and the interpreted n-gram lambda
    would otherwise run single-threaded (same rationale as the dedup
    module's _spread; a no-op on a well-partitioned corpus)."""
    from ..operators.dedup import _spread

    w = _spread(d).select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    tk = F.col("toks")
    g3 = F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 2),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return w.select("doc_id", g3.alias("g3"))


def _exploded_3grams(d: DataFrame) -> DataFrame:
    """(doc_id, g) — one row per word-3-gram INSTANCE, via the
    explode-positions form: tokens materialize below the Generate,
    positions explode, each gram is one codegen'd ``slice`` of the
    carried array. Use THIS (not ``explode(_with_3grams(...))``) when
    the grams feed an explode: a Generate over the single-use gram
    array re-inlines the transform lambda — split included — into a
    per-element recompute (caught by plan_audit gate (d); measured
    27× on this exact query family)."""
    from ..operators.dedup import _spread

    w = _spread(d).select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    return w.select(
        "doc_id",
        "toks",
        F.explode(
            F.when(
                F.size("toks") >= 3, F.sequence(F.lit(1), F.size("toks") - 2)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    ).select(
        "doc_id", F.concat_ws(" ", F.slice("toks", F.col("pos"), 3)).alias("g")
    )


@register(
    "text_gopher_quality",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
               / len(toks) AS mean_word_len,
             CAST(len(list_intersect(toks,
               ['the','a','of','to','and','in','for','is'])) AS BIGINT)
               AS stop_hits
      FROM w
    )
    SELECT doc_id, n_words, mean_word_len, stop_hits,
           CASE WHEN n_words >= 30 AND n_words <= 100000
                 AND mean_word_len >= 3.8 AND mean_word_len <= 10.0
                 AND stop_hits >= 2
                THEN TRUE ELSE FALSE END AS keep
    FROM sig
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    standard LLM-corpus filter): word-count bounds, mean-word-length
    band, and a minimum count of distinct required stopwords. All
    native array expressions — one projection, zero shuffles, zero
    Python — so at 100 TB this runs at parquet-scan speed and the keep
    flag prunes the corpus before any shuffle-bearing stage."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    sig = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast(
                "double"
            )
            / F.size(toks)
        ).alias("mean_word_len"),
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]))
        )
        .cast("long")
        .alias("stop_hits"),
    )
    keep = (
        (F.col("n_words") >= 30)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3.8)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("stop_hits") >= 2)
    )
    return sig.select("doc_id", "n_words", "mean_word_len", "stop_hits", keep.alias("keep"))


@register(
    "text_dup_ngram_fraction",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(toks) - 2),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS g3
      FROM w
    )
    SELECT doc_id,
           CAST(len(g3) AS BIGINT) AS n_ngrams,
           CAST(len(list_distinct(g3)) AS BIGINT) AS n_distinct,
           CASE WHEN len(g3) = 0 THEN 0.0
                ELSE CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
           END AS dup_frac
    FROM g
    """,
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score: the fraction of word 3-grams
    that are repeats of an earlier 3-gram in the same document —
    Gopher's duplicated-n-gram-fraction signal for boilerplate/spam
    removal. The n-gram list never leaves the row (no explode, no
    shuffle): built with sequence+transform, measured with
    array_distinct, all inside one codegen'd projection."""
    d = load_table(spark, sf_dir, "documents")
    g = _with_3grams(d)
    return g.select(
        "doc_id",
        F.size("g3").cast("long").alias("n_ngrams"),
        F.size(F.array_distinct("g3")).cast("long").alias("n_distinct"),
        F.when(F.size("g3") == 0, F.lit(0.0))
        .otherwise(
            (F.size("g3") - F.size(F.array_distinct("g3"))).cast("double")
            / F.size("g3")
        )
        .alias("dup_frac"),
    )


@register(
    "text_chunk_fixed",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             generate_subscripts(list_transform(
               generate_series(0, CAST(ceil(len(toks) / 50.0) AS BIGINT) - 1),
               j -> array_to_string(toks[j*50+1 : j*50+50], ' ')), 1) - 1
               AS chunk_ix,
             unnest(list_transform(
               generate_series(0, CAST(ceil(len(toks) / 50.0) AS BIGINT) - 1),
               j -> array_to_string(toks[j*50+1 : j*50+50], ' '))) AS chunk
      FROM w
    )
    SELECT doc_id, CAST(chunk_ix AS BIGINT) AS chunk_ix,
           CAST(len(string_split_regex(chunk, '\s+')) AS BIGINT) AS n_tokens,
           md5(chunk) AS chunk_md5
    FROM c
    """,
)
def text_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size sequence chunking (50 whitespace tokens per chunk) —
    the context-window segmentation step of a training pipeline. Chunks
    are built row-locally with sequence+transform+slice and only then
    exploded, so the shuffle-free scan emits (doc_id, chunk_ix, token
    count, md5) — the md5 stands in for the chunk payload to keep the
    gated result narrow. A Python-UDTF twin of this operator is parity-
    tested in tests/test_udtf.py (API surface); this native form is the
    scale path."""
    d = load_table(spark, sf_dir, "documents")
    # materialize the split before the lambda references it (HOF
    # lambdas re-evaluate outer computed expressions per element)
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    tk = F.col("toks")
    n_chunks = F.ceil(F.size(tk) / F.lit(50.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.concat_ws(" ", F.slice(tk, j * 50 + 1, 50)),
    )
    c = w.select("doc_id", F.posexplode(chunks).alias("chunk_ix", "chunk"))
    return c.select(
        "doc_id",
        F.col("chunk_ix").cast("long").alias("chunk_ix"),
        F.size(F.split("chunk", r"\s+")).cast("long").alias("n_tokens"),
        F.md5("chunk").alias("chunk_md5"),
    )


@register(
    "text_conjunctive_search",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS t
      FROM documents
    )
    SELECT doc_id
    FROM toks
    WHERE list_contains(t, 'spark') AND list_contains(t, 'window')
    """,
)
def text_conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search (docs containing ALL query terms) —
    the lookup side of an inverted index. Expressed as row-local
    membership tests (array_contains over the distinct token set), so
    the scan streams with zero shuffle and the filter pushes into the
    projection; at 100 TB the same query runs against the posting-list
    table the explode+groupBy build would materialize."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
    return (
        d.select("doc_id", toks.alias("t"))
        .filter(F.array_contains("t", "spark") & F.array_contains("t", "window"))
        .select("doc_id")
    )


@register(
    "text_boilerplate_ngrams",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(
               unnest(list_transform(generate_series(1, len(toks) - 2),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
             ), 1, 12)) AS BIGINT) AS gh
      FROM w
    ),
    bp AS (
      SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 5
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
    b AS (
      SELECT g.doc_id, COUNT(*) AS n_boiler
      FROM g JOIN bp USING (gh) GROUP BY g.doc_id
    )
    SELECT tot.doc_id,
           tot.n_grams,
           coalesce(b.n_boiler, 0) AS n_boiler,
           CAST(coalesce(b.n_boiler, 0) AS DOUBLE) / tot.n_grams AS boiler_frac,
           CAST(coalesce(b.n_boiler, 0) AS DOUBLE) / tot.n_grams >= 0.1
             AS flagged
    FROM tot LEFT JOIN b ON tot.doc_id = b.doc_id
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection (the cross-document twin of
    text_dup_ngram_fraction): word 3-grams appearing >= 5 times across
    the corpus are 'boilerplate'; each document reports what fraction
    of its 3-gram instances are boilerplate and a flag at 10%. Two
    grouped aggregations over the exploded grams plus one key-only
    join — the boilerplate set joins by gram hash, deliberately NOT
    broadcast (it grows with the corpus; AQE picks the strategy).

    Gram instances come from the explode-POSITIONS form, not
    explode(_with_3grams(...)): a Generate over the single-use gram
    array inlines the whole lambda (split included) back into a
    per-element recompute — the r5 'fixed' plan had silently
    regressed; plan_audit gate (d) now proves this plan clean."""
    d = load_table(spark, sf_dir, "documents")
    # gram key = 48-bit md5 prefix as BIGINT, not the gram string: the
    # (doc, gram) aggregate and the boilerplate join shuffle on this
    # key, so key width is the network bill (same rule as the minhash
    # shingle hashes and the ExactSubstr window keys; the oracle takes
    # the identical prefix so grouping stays in lockstep even under
    # collisions).
    g = _exploded_3grams(d).select(
        "doc_id",
        F.conv(F.substring(F.md5("g"), 1, 12), 16, 10)
        .cast("long")
        .alias("g3"),
    )
    # one aggregation on (doc_id, g3) feeds all three branches.
    # ReusedExchange can NOT deduplicate them: per-branch column
    # pruning narrows each subtree differently, so the plans are not
    # canonically equal and the explode would run three times
    # (verified with .explain: 3x Generate, 0 reuse). Persist the
    # 48-bytes-per-gram aggregate instead — same eager persist+count
    # pattern as the LSH builders, and at 100 TB this frame is
    # |distinct(doc,gram)| rows, far smaller than the corpus.
    gc = tracked_persist(
        g.groupBy("doc_id", "g3").agg(F.count(F.lit(1)).alias("cnt"))
    )
    gc.count()
    bp = (
        gc.groupBy("g3")
        .agg(F.sum("cnt").alias("c"))
        .filter(F.col("c") >= 5)
        .select("g3")
    )
    tot = gc.groupBy("doc_id").agg(F.sum("cnt").cast("long").alias("n_grams"))
    b = (
        gc.join(bp, "g3")
        .groupBy("doc_id")
        .agg(F.sum("cnt").cast("long").alias("n_boiler"))
    )
    frac = F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double") / F.col("n_grams")
    return (
        tot.join(b, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            frac.alias("boiler_frac"),
            (frac >= 0.1).alias("flagged"),
        )
    )


_PII_SUFFIX = " contact alex.rivers@example.org or call 555-201-3344 ssn 523-44-1987"
_PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id < 50
                  THEN concat(text, '{_PII_SUFFIX}') ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT)
             AS n_ssns,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '{_PII_EMAIL}', '[EMAIL]', 'g'),
                 '{_PII_SSN}', '[SSN]', 'g'),
                 '{_PII_PHONE}', '[PHONE]', 'g')) AS redacted_fp
    FROM aug
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the compliance pass every training
    pipeline runs before a corpus ships: emails, SSNs, and US phone
    numbers are counted and replaced with typed placeholders, all as
    native regexp expressions (zero Python in the row path, zero
    shuffle — a pure projection that scales with the scan). The
    fixture corpus carries no organic PII, so documents < 50 get a
    deterministic planted suffix in BOTH engines; the md5 of the
    redacted text proves the replacement bytes match exactly, not just
    the counts. SSNs (3-2-4) redact before phones (3-3-4) so the
    patterns never shadow each other."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") < 50, F.concat(F.col("text"), F.lit(_PII_SUFFIX))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "[EMAIL]"),
            _PII_SSN,
            "[SSN]",
        ),
        _PII_PHONE,
        "[PHONE]",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_SSN), F.lit(0)))
        .cast("long")
        .alias("n_ssns"),
        F.md5(red).alias("redacted_fp"),
    )


@register(
    "text_lm_unigram_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ),
    total AS (SELECT SUM(cnt) AS n FROM freq),
    scored AS (
      SELECT t.doc_id,
             CAST(round(log(CAST(f.cnt AS DOUBLE) / total.n), 9)
                  AS DECIMAL(24,12)) AS lp
      FROM toks t JOIN freq f USING (tok) CROSS JOIN total
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def text_lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style proxy for
    'does this document read like the corpus': every token instance
    scores log10(corpus_freq/corpus_total) and the document reports
    the mean. Out-of-distribution junk scores low. Scale shape: one
    token-count aggregation builds the LM (shuffle carries (token,
    count)), the corpus total is a one-row broadcast, the score join
    is key-only on the token, and per-token logprobs round to 9 dp
    then accumulate as DECIMAL so the per-doc mean is order-free —
    bit-identical under any shuffle order."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n"))
    lp = F.round(
        F.log10(F.col("cnt").cast("double") / F.col("n")), 9
    ).cast("decimal(24,12)")
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
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

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
    )


@register(
    "doc_quality_deciles",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT SUM(cnt) AS n FROM freq),
    scored AS (
      SELECT t.doc_id,
             CAST(round(log(CAST(f.cnt AS DOUBLE) / total.n), 9)
                  AS DECIMAL(24,12)) AS lp
      FROM toks t JOIN freq f USING (tok) CROSS JOIN total
    ),
    docscore AS (
      SELECT doc_id,
             round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
      FROM scored GROUP BY doc_id
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(avg_logprob) AS lo,
           MAX(avg_logprob) AS hi
    FROM (
      SELECT doc_id, avg_logprob,
             NTILE(10) OVER (ORDER BY avg_logprob, doc_id) AS decile
      FROM docscore
    )
    GROUP BY decile
    """,
)
def doc_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum bucketing: documents ranked by their unigram
    LM score and cut into NTILE deciles — the binning step before
    quality-weighted sampling or curriculum ordering of a training
    mix. The decile cut uses the DISTRIBUTED exact-ntile operator
    (``operators.ntile.exact_ntile``: range-partitioned local ranks +
    broadcast offsets — no single-partition window), bit-identical to
    the oracle's global NTILE; the mergeable binned-quantile sketch
    (`sketch_binned_quantiles`) remains the approximate alternative.

    The score frame is tracked-persisted: exact_ntile's range sampler
    and rank pass would otherwise each re-derive the full LM pipeline
    (token explode + freq join + doc agg) — the r5 widest-plan finding
    (14 shuffles / 6 scans); caching the ~1-row-per-doc scores frame
    collapses the rederivations to one."""
    from ..caching import tracked_persist
    from ..operators.ntile import exact_ntile

    scores = tracked_persist(
        text_lm_unigram_score(spark, sf_dir).select("doc_id", "avg_logprob")
    )
    return (
        exact_ntile(scores, 10, ["avg_logprob", "doc_id"], "decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("avg_logprob").alias("lo"),
            F.max("avg_logprob").alias("hi"),
        )
    )


@register(
    "text_inverted_postings",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    )
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc,
           md5(array_to_string(list(doc_id ORDER BY doc_id), ',')) AS postings_md5
    FROM dt
    GROUP BY tok
    HAVING COUNT(*) >= 50
    """,
)
def text_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the posting lists behind any
    at-scale conjunctive/boolean search (the scan-per-query
    `text_conjunctive_search` is the no-index baseline; this is the
    build-once index): distinct (doc, token) pairs shuffle once on the
    token, each token's postings emerge sorted (array_sort inside the
    row — collect_list order is shuffle-dependent) and are fingerprinted
    so the full list content sits under the hash gate without shipping
    giant rows. Common tokens only (df ≥ 50) keeps the gated output
    bounded; the md5 proves the COMPLETE postings list matches."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).distinct()
    postings = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return (
        dt.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.md5(postings).alias("postings_md5"),
        )
        .filter(F.col("df") >= 50)
    )


@register(
    "text_grouped_ols_fit",
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS x,
             CAST(length(text) AS BIGINT) AS y
      FROM documents
    ),
    s AS (
      SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM m GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx) AS slope,
           (CAST(sy AS DOUBLE)
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM s
    """,
)
def text_grouped_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` surface (the per-group model-fit
    slot: one pandas frame per group, scikit-style code inside): OLS
    of chars-per-doc against tokens-per-doc fitted per source. The
    moment sums accumulate as int64 inside each pandas group (token
    and char counts are integers, so the sums are EXACT) and the
    closed-form slope/intercept are two double divisions — which is
    what lets a SQL oracle replay a Python-fitted model bit-for-bit.
    Scale: one shuffle on the group key, Arrow both directions, group
    size bounded by the per-source corpus."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("x"),
        F.length("text").cast("long").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        x = pdf["x"].to_numpy(dtype="int64")
        y = pdf["y"].to_numpy(dtype="int64")
        sx, sy = int(x.sum()), int(y.sum())
        sxy, sxx = int((x * y).sum()), int((x * x).sum())
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * sx) / n
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n": [n],
                # no rounding: both engines derive these doubles from
                # IDENTICAL exact-integer moments, so they are
                # bit-equal — rounding would only introduce tie-rule
                # divergence (Python banker's vs SQL half-away)
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return d.groupBy("source").applyInPandas(
        fit, "source string, n long, slope double, intercept double"
    )


@register(
    "text_lang_label_audit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    scores AS (
      SELECT doc_id, lang, {_sql_lang_scores()} FROM toks
    ),
    pred AS (
      SELECT doc_id, lang AS lang_claimed,
             CASE
               WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
               WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr >= s_es THEN 'fr'
               ELSE 'es'
             END AS lang_pred
      FROM scores
    )
    SELECT lang_claimed, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN lang_claimed = lang_pred THEN TRUE ELSE FALSE END
             AS agree
    FROM pred
    GROUP BY 1, 2
    """,
)
def text_lang_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: the corpus's CLAIMED language column
    cross-tabulated against the detector's prediction — the confusion
    matrix every pipeline builds before trusting upstream metadata
    (mislabeled language is a classic silent training-data defect).
    Pure composition: the lang-ID projection feeds one small
    (claimed × predicted) aggregation."""
    pred = text_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_claimed")
    )
    return (
        d.join(pred, "doc_id")
        .groupBy("lang_claimed", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "agree", F.col("lang_claimed") == F.col("lang_pred")
        )
    )


@register(
    "text_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    uni AS (SELECT unnest(t) AS w FROM toks),
    ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
    nu AS (SELECT COUNT(*) AS n FROM uni),
    bi AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    ),
    nb AS (SELECT COUNT(*) AS n FROM bi),
    bcnt AS (
      SELECT bigram, COUNT(*) AS c FROM bi GROUP BY 1 HAVING COUNT(*) >= 5
    )
    SELECT b.bigram, b.c AS n_pair,
           round(ln((CAST(b.c AS DOUBLE) / nb.n)
                    / ((CAST(cx.c AS DOUBLE) / nu.n)
                       * (CAST(cy.c AS DOUBLE) / nu.n))), 6) AS pmi
    FROM bcnt b
    JOIN ucnt cx ON cx.w = split_part(b.bigram, ' ', 1)
    JOIN ucnt cy ON cy.w = split_part(b.bigram, ' ', 2)
    CROSS JOIN nu CROSS JOIN nb
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information for adjacent word pairs — the
    collocation / multi-word-expression detector a tokenizer-training
    or phrase-mining pass runs over a corpus: PMI = ln(p(x,y) /
    (p(x)p(y))) with probabilities from exact unigram/bigram counts.

    Scale shape: two map-side-combined count aggregations (unigrams,
    bigrams) over one tokenization, then the >= 5-count bigram frame
    joins the vocabulary-bounded unigram counts twice (AQE picks
    broadcast when the vocab is small); the corpus totals ride in as
    1-row cross joins. The PMI double is computed with one fixed op
    order from exact integer counts on both engines, rounded once.
    """
    d = load_table(spark, sf_dir, "documents")
    w0 = _spread_docs(d).select(
        F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    bi = _exploded_2grams(w0)
    uni = w0.select(F.explode(F.col("toks")).alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uni.agg(F.count(F.lit(1)).alias("nu"))
    nb = bi.agg(F.count(F.lit(1)).alias("nb"))
    bcnt = (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    cx = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("cx"))
    cy = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("cy"))
    joined = (
        bcnt.withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(nu)
        .crossJoin(nb)
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") / F.col("nb"))
            / (
                (F.col("cx").cast("double") / F.col("nu"))
                * (F.col("cy").cast("double") / F.col("nu"))
            )
        ),
        6,
    )
    return joined.select("bigram", "n_pair", pmi.alias("pmi"))


@register(
    "text_bm25_search",
    oracle="""
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
    df AS (
      SELECT SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      FROM tf
    ),
    scored AS (
      SELECT t.doc_id, t.tf1, t.tf2,
             ln((c.n_docs - d.df1 + 0.5) / (d.df1 + 0.5) + 1)
               * (t.tf1 * 2.2)
               / (t.tf1 + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl))
             + ln((c.n_docs - d.df2 + 0.5) / (d.df2 + 0.5) + 1)
               * (t.tf2 * 2.2)
               / (t.tf2 + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl)) AS score_raw
      FROM tf t
      JOIN dl l USING (doc_id)
      CROSS JOIN corpus c CROSS JOIN df d
      WHERE t.tf1 + t.tf2 > 0
    )
    SELECT doc_id, tf1, tf2, score FROM (
      SELECT doc_id, tf1, tf2, round(score_raw, 6) AS score,
             ROW_NUMBER() OVER (ORDER BY round(score_raw, 6) DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for the fixed query {spark, join}
    (k1=1.2, b=0.75, Lucene idf): per-doc term frequencies and doc
    length come from ONE token aggregation; N/avgdl/df are one-row
    broadcasts; the score is a fixed-order double expression, so both
    engines rank identically (doc_id breaks exact ties).

    Scale shape: no per-term join chain — term tfs are conditional
    sums in the same groupBy, so adding query terms adds columns, not
    shuffles. The full-corpus scoring is one scan + one doc-key
    aggregation; top-k is the bounded window over scored docs only."""
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

    def leg(tf, dfc):
        idf = F.log(
            (F.col("n_docs") - F.col(dfc) + 0.5) / (F.col(dfc) + 0.5) + 1
        )
        return (
            idf
            * (F.col(tf) * 2.2)
            / (
                F.col(tf)
                + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
            )
        )

    scored = (
        per_doc.filter(F.col("tf1") + F.col("tf2") > 0)
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "tf1",
            "tf2",
            # rounded once: ln() differs in the last ulp across libm
            # implementations, and the rounded value is also the sort
            # key so both engines rank identically
            F.round(leg("tf1", "df1") + leg("tf2", "df2"), 6).alias("score"),
        )
    )
    # global top-k via orderBy+limit: Spark plans TakeOrderedAndProject
    # (per-partition top-k + k-row merge) — never a single-partition
    # window sort over every matching doc
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "tf1", "tf2", "score")
    )


@register(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i])) AS w1,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i+1])) AS w2
      FROM toks
    ),
    uni AS (SELECT doc_id, unnest(t) AS w FROM toks),
    cuni AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
    vocab AS (SELECT COUNT(*) AS v FROM cuni),
    cbi AS (SELECT w1, w2, COUNT(*) AS c FROM bi GROUP BY 1, 2),
    scored AS (
      SELECT b.doc_id,
             CAST(round(log(CAST(cb.c + 1 AS DOUBLE) / (cu.c + vb.v)), 9)
                  AS DECIMAL(24,12)) AS lp
      FROM bi b
      JOIN cbi cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
      JOIN cuni cu ON cu.w = b.w1
      CROSS JOIN vocab vb
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-1 smoothing — the
    next-order upgrade of text_lm_unigram_score: every adjacent pair
    scores log10((c(w1,w2)+1)/(c(w1)+V)) against corpus statistics,
    and the document reports the mean conditional logprob (low =
    incoherent word order, the signal the unigram model cannot see).

    Scale shape: two count aggregations (bigram, unigram) off one
    tokenization, vocabulary size as a one-row broadcast, score join
    keyed on the bigram, per-pair logprobs rounded to 9 dp and
    accumulated in DECIMAL — order-free under any shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim("text")), r"\s+")
    docs = d.select("doc_id", t.alias("t"))
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(
                    F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))
                ).alias("w1"),
                F.slice(
                    F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))
                ).alias("w2"),
            )
        ).alias("z"),
    ).select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    uni = docs.select(F.explode("t").alias("w"))
    cuni = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    vocab = cuni.agg(F.count(F.lit(1)).alias("v"))
    cbi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    lp = F.round(
        F.log10(
            (F.col("cb") + 1).cast("double") / (F.col("cu") + F.col("v"))
        ),
        9,
    ).cast("decimal(24,12)")
    return (
        pairs.join(cbi, ["w1", "w2"])
        .join(cuni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
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
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      FROM toks
    ),
    df AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY 1)
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty
    FROM grams gr JOIN df USING (g)
    GROUP BY gr.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    3-grams that appear NOWHERE else in the corpus (df = 1) — the
    complement of the boilerplate fraction, used to up-rank diverse
    documents in curriculum selection. One gram-df aggregation joined
    back on the gram key (the text_boilerplate_ngrams shape); the
    ratio is one double division of exact counts."""
    d = load_table(spark, sf_dir, "documents")
    grams = tracked_persist(
        _with_3grams(d).select("doc_id", F.array_distinct("g3").alias("gs"))
    ).select("doc_id", F.explode("gs").alias("g"))
    dfc = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(dfc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
            (
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH vocab AS (
      SELECT tok, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
      ) GROUP BY 1
    ),
    ranked AS (
      SELECT freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
      FROM vocab
    ),
    pts AS (
      SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
             CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS HUGEINT) AS y
      FROM ranked
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_vocab,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope,
           (CAST(sy AS DOUBLE) / n
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE))
              * (CAST(sx AS DOUBLE) / n)) / 1000000 AS intercept_ln
    FROM m
"""
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope
    of ln(freq) ~ ln(rank) (natural text sits near -1; synthetic or
    templated corpora deviate — a corpus-health fingerprint). The
    log points quantize to exact micro-units (round * 1e6 -> integer)
    so the OLS moments accumulate in wide integers — order-free — and
    the slope is scale-invariant under the quantization. Vocabulary
    ranks come from the DISTRIBUTED exact ranker
    (``operators.ntile.global_row_number``: range-partitioned local
    ranks + broadcast offsets), so no single-partition window runs
    even over the frequency table."""
    from ..operators.ntile import global_row_number

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_row_number(
        vocab, [F.col("freq").desc(), F.col("tok")], "rank"
    )
    pts = ranked.select(
        F.round(F.log(F.col("freq").cast("double")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("y"),
        F.round(F.log(F.col("rank").cast("double")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("x"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    return m.select(
        F.col("n").cast("long").alias("n_vocab"),
        slope.alias("zipf_slope"),
        (
            (
                F.col("sy").cast("double") / F.col("n")
                - slope * (F.col("sx").cast("double") / F.col("n"))
            )
            / 1_000_000
        ).alias("intercept_ln"),
    )


@register(
    "text_winnow_fingerprints",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i AS pos,
             CAST(concat('0x', substring(md5(
               array_to_string(toks[i:i+2], ' ')), 1, 8)) AS BIGINT) AS h,
             len(toks) - 2 AS n_grams
      FROM w, unnest(generate_series(1, len(toks) - 2)) AS u(i)
      WHERE len(toks) >= 3
    ),
    wins AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
             n_grams
      FROM g
    ),
    fp AS (
      SELECT DISTINCT doc_id, wmin
      FROM wins WHERE pos <= n_grams - 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fp,
           md5(array_to_string(list(wmin ORDER BY wmin), ',')) AS fp_md5
    FROM fp GROUP BY doc_id
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003 — the
    MOSS local-fingerprint algorithm): hash every word 3-gram, slide a
    window of w=4 consecutive gram hashes, keep each window's MINIMUM
    — the guarantee is that any shared substring of length ≥ w+k-1
    tokens yields at least one shared fingerprint, with ~2/(w+1)
    selection density. Output per doc: fingerprint count + an md5 over
    the sorted fingerprint set (the complete set sits under the hash
    gate without shipping giant rows).

    Scale shape: explode-positions grams (no HOF), one bounded
    per-doc ordered window (ROWS CURRENT..w-1 FOLLOWING — frame size
    4, partitioned by doc), one distinct + one aggregation; shuffles
    carry (doc, pos, 8-byte hash)."""
    from pyspark.sql import Window as PWindow

    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 3)
    g = w.select(
        "doc_id",
        "toks",
        (F.size("toks") - 2).alias("n_grams"),
        F.explode(F.sequence(F.lit(1), F.size("toks") - 2)).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        "n_grams",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos"), 3))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    win = PWindow.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    fp = (
        g.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - 3)
        .select("doc_id", "wmin")
        .distinct()
    )
    ordered = F.array_sort(F.collect_list("wmin"))
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.md5(
            F.array_join(
                F.transform(ordered, lambda x: x.cast("string")), ","
            )
        ).alias("fp_md5"),
    )


@register(
    "text_kwic_concordance",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    hits AS (
      SELECT doc_id, t, i
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)
      WHERE t[i] = 'spark'
    )
    SELECT doc_id, CAST(i AS BIGINT) AS position,
           coalesce(array_to_string(t[greatest(i - 3, 1):i - 1], ' '), '')
             AS left_ctx,
           coalesce(array_to_string(t[i + 1:least(i + 3, len(t))], ' '), '')
             AS right_ctx
    FROM hits
    """,
)
def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) concordance: every occurrence of the
    term with its ±3-token context — the corpus-inspection tool behind
    tokenizer debugging and annotation sampling. posexplode finds hit
    positions; contexts are row-local array slices (clamped at doc
    edges), so the only shuffle is whatever the consumer adds."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim("text")), r"\s+")
    toks = d.select("doc_id", t.alias("t"))
    hits = toks.select(
        "doc_id", "t", F.posexplode("t").alias("p0", "tok")
    ).filter(F.col("tok") == "spark")
    i = F.col("p0") + 1  # 1-based position to mirror SQL slices
    left = F.slice(
        F.col("t"),
        F.greatest(i - 3, F.lit(1)),
        F.greatest(i - F.greatest(i - 3, F.lit(1)), F.lit(0)),
    )
    right_start = i + 1
    right_len = F.greatest(
        F.least(i + 3, F.size("t")) - right_start + 1, F.lit(0)
    )
    right = F.slice(F.col("t"), right_start, right_len)
    return hits.select(
        "doc_id",
        i.cast("long").alias("position"),
        F.concat_ws(" ", left).alias("left_ctx"),
        F.concat_ws(" ", right).alias("right_ctx"),
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


_CHAR3_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", "er "),
    "de": ("der", "und", "sch", "ein", "ich", "cht"),
    "fr": ("les", "ent", "de ", "que", "eur", "ais"),
    "es": ("de ", "la ", "os ", "que", "ent", "cio"),
}


def _sql_char3_scores() -> str:
    parts = []
    for lang, grams in _CHAR3_PROFILES.items():
        lst = ", ".join("'" + g.replace("'", "''") + "'" for g in grams)
        parts.append(f"len(list_filter(tris, t -> t IN ({lst}))) AS s_{lang}")
    return ", ".join(parts)


@register(
    "text_char_trigram_lang_id",
    oracle=f"""
    WITH lo AS (
      SELECT doc_id, lower(trim(text)) AS lo FROM documents
    ),
    tri AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(lo) - 2, 0)),
               i -> substr(lo, i, 3)) AS tris
      FROM lo
    ),
    scores AS (
      SELECT doc_id, {_sql_char3_scores()} FROM tri
    )
    SELECT doc_id,
           CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
           CAST(s_fr AS BIGINT) AS s_fr, CAST(s_es AS BIGINT) AS s_es,
           CASE
             WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es'
           END AS lang_pred
    FROM scores
    """,
)
def text_char_trigram_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-TRIGRAM language ID — the n-gram-profile heuristic
    (Cavnar-Trenkle) next to the stopword-profile text_lang_id:
    works on languages without whitespace-stable stopwords and on
    short/fragmentary text. The lowered text is materialized in its
    OWN projection before the trigram HOF (the _with_3grams
    two-projection discipline — the lambda touches only attribute
    columns, so nothing recomputes per element), trigrams come from
    one native transform over sequence(1, len-2), and per-language
    scores are size(filter(...)) membership counts — all codegen'd,
    zero Python in the row path, scales with the scan."""
    d = load_table(spark, sf_dir, "documents")
    lo = d.select("doc_id", F.lower(F.trim("text")).alias("lo"))
    tris_expr = F.when(
        F.length("lo") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length("lo") - 2),
            lambda i: F.col("lo").substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = lo.select("doc_id", tris_expr.alias("tris"))
    def _score(grams: tuple) -> "F.Column":
        return F.size(
            F.filter(F.col("tris"), lambda t: t.isin(list(grams)))
        ).cast("long")

    scores = tri.select(
        "doc_id",
        *[
            _score(grams).alias(f"s_{lang}")
            for lang, grams in _CHAR3_PROFILES.items()
        ],
    )
    s = {k: F.col(f"s_{k}") for k in _CHAR3_PROFILES}
    pred = (
        F.when(
            (s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["es"] == 0),
            F.lit("unknown"),
        )
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return scores.withColumn("lang_pred", pred)


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


_KN_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i])) AS w1,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i+1])) AS w2
      FROM toks
    ),
    cbi AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(cb) AS ctx, COUNT(*) AS nf FROM cbi GROUP BY 1),
    bwd AS (SELECT w2, COUNT(*) AS nb FROM cbi GROUP BY 1),
    tot AS (SELECT COUNT(*) AS tt FROM cbi),
    scored AS (
      SELECT b.doc_id,
             CAST(round(log(
               (GREATEST(CAST(cb.cb AS DOUBLE) - 0.75, 0)
                + (0.75 * cx.nf) * (CAST(bw.nb AS DOUBLE) / tv.tt))
               / cx.ctx), 9) AS DECIMAL(24,12)) AS lp
      FROM bi b
      JOIN cbi cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
      JOIN ctx cx ON cx.w1 = b.w1
      JOIN bwd bw ON bw.w2 = b.w2
      CROSS JOIN tot tv
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_kn_logprob
    FROM scored
    GROUP BY doc_id
    """


@register("text_kneser_ney_bigram_score", oracle=_KN_ORACLE)
def text_kneser_ney_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999's interpolated form, absolute discount
    D = 0.75) — the smoothing that add-1 ('text_bigram_lm_score')
    approximates badly: probability mass discounted from observed
    bigrams is redistributed by CONTINUATION probability (how many
    distinct contexts a word follows), not raw frequency, so
    high-frequency-but-fixed collocates ('francisco') stop stealing
    mass from genuinely versatile words.

      P(w2|w1) = (max(c(w1,w2)-D, 0) + D·N1+(w1,·)·P_cont(w2)) / c(w1·)
      P_cont(w2) = N1+(·,w2) / |distinct bigram types|

    Scale shape: one tokenization feeds one bigram count; the three KN
    statistics (context totals + fan-out by w1, continuation fan-in by
    w2, one-row type total) are aggregations OVER the bigram-type
    table — vocabulary-bounded, far smaller than the corpus. Scoring
    joins on w1/w2 keys; per-term logprobs round to 9 dp and
    accumulate in DECIMAL, so the document average is order-free under
    any shuffle. Probability arithmetic is fixed-order IEEE double ops
    written identically in the DuckDB oracle — bit-reproducible."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim("text")), r"\s+")
    docs = d.select("doc_id", t.alias("t"))
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(
                    F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))
                ).alias("w1"),
                F.slice(
                    F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))
                ).alias("w2"),
            )
        ).alias("z"),
    ).select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    cbi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    ctx = cbi.groupBy("w1").agg(
        F.sum("cb").alias("ctx"), F.count(F.lit(1)).alias("nf")
    )
    bwd = cbi.groupBy("w2").agg(F.count(F.lit(1)).alias("nb"))
    tot = cbi.agg(F.count(F.lit(1)).alias("tt"))
    p = (
        F.greatest(F.col("cb").cast("double") - 0.75, F.lit(0.0))
        + (F.lit(0.75) * F.col("nf")) * (F.col("nb").cast("double") / F.col("tt"))
    ) / F.col("ctx")
    lp = F.round(F.log10(p), 9).cast("decimal(24,12)")
    return (
        pairs.join(cbi, ["w1", "w2"])
        .join(ctx, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_kn_logprob"),
        )
    )


@register(
    "text_ccnet_perplexity_buckets",
    oracle=f"""
    WITH kn AS ({_KN_ORACLE}),
    langd AS (
      SELECT d.doc_id, d.lang, k.avg_kn_logprob
      FROM documents d JOIN kn k ON k.doc_id = d.doc_id
    ),
    bucketed AS (
      SELECT lang, avg_kn_logprob,
             NTILE(3) OVER (PARTITION BY lang
                            ORDER BY avg_kn_logprob DESC, doc_id) AS bucket
      FROM langd
    )
    SELECT lang, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(avg_kn_logprob AS DECIMAL(24,12)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_logprob
    FROM bucketed
    GROUP BY 1, 2
    """,
)
def text_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    each language, rank documents by language-model score and split
    them into head / middle / tail tertiles (bucket 1 = most fluent) —
    the filtering stage CCNet, RedPajama and friends use to keep the
    head+middle of the crawl and drop or down-weight the tail. The LM
    is the interpolated Kneser-Ney bigram model from
    text_kneser_ney_bigram_score, composed as a frame (the engine's
    query builders are ordinary DataFrame functions — composition
    costs nothing).

    Scale shape: scoring is the KN plan (vocabulary-bounded joins);
    bucketing is an NTILE over a lang-PARTITIONED window — per-language
    sort, never global. At 100-TB-per-language scale the window swaps
    for the distributed exact ranker (operators/ntile.py) keyed by
    lang without changing semantics; ties break on doc_id so both
    engines assign identical tertiles. Output is 3 rows per language."""
    d = load_table(spark, sf_dir, "documents")
    kn = text_kneser_ney_bigram_score(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("avg_kn_logprob").desc(), "doc_id"
    )
    return (
        d.select("doc_id", "lang")
        .join(kn, "doc_id")
        .withColumn("bucket", F.ntile(3).over(w))
        .groupBy("lang", F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("avg_kn_logprob").cast("decimal(24,12)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_logprob"),
        )
    )


_RAKE_STOP = "('the','a','of','to','and','in','for','is')"


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split_regex(lower(trim(text)),
                                                    '\\s+'), 1) AS pos,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    marked AS (
      SELECT doc_id, pos, w,
             CASE WHEN w IN {_RAKE_STOP} THEN 1 ELSE 0 END AS stop
      FROM toks
    ),
    runs AS (
      SELECT doc_id, pos, w,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id, stop
                                      ORDER BY pos) AS grp
      FROM marked WHERE stop = 0
    ),
    phrases AS (
      SELECT doc_id, grp,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM runs GROUP BY doc_id, grp
    ),
    pwords AS (
      SELECT doc_id, grp, plen, unnest(string_split(phrase, ' ')) AS w,
             phrase
      FROM phrases
    ),
    wstats AS (
      SELECT w, COUNT(*) AS freq, SUM(plen) AS degree
      FROM pwords GROUP BY w
    ),
    scored AS (
      SELECT p.phrase,
             SUM(CAST(round(CAST(s.degree AS DOUBLE) / s.freq, 9)
                      AS DECIMAL(24,12))) AS sc
      FROM pwords p JOIN wstats s USING (w)
      GROUP BY p.doc_id, p.grp, p.phrase
    ),
    agg AS (
      SELECT phrase,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             round(CAST(MIN(sc) AS DOUBLE), 6) AS rake_score
      FROM scored GROUP BY phrase
    )
    SELECT phrase, n_occurrences, rake_score FROM (
      SELECT phrase, n_occurrences, rake_score,
             ROW_NUMBER() OVER (ORDER BY rake_score DESC, phrase) AS rn
      FROM agg
    ) WHERE rn <= 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (gaps-and-islands on the
    token position minus a per-(doc, stop-class) row_number); each
    word's degree = Σ length of phrases containing it and freq = its
    phrase-occurrence count; a phrase scores Σ degree(w)/freq(w) over
    its words, and the corpus's top-20 phrases emerge. Per-word ratios
    round to 9 dp and accumulate in DECIMAL so phrase scores are
    order-free; identical phrase texts share one score by construction
    (MIN is a no-op collapse mirrored by both engines).

    Scale shape: tokenization explodes once; the islands window is
    doc-partitioned; word statistics are a vocabulary-bounded
    aggregation joined back by word key; the final top-20 is a
    TakeOrdered over the |distinct phrases| frame. The stopword table
    inlines here (8 words) and would broadcast at dictionary scale."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "pos0", "w"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    stops = [s.strip("'") for s in _RAKE_STOP.strip("()").split(",")]
    marked = toks.withColumn(
        "stop", F.col("w").isin(stops).cast("int")
    )
    w_run = Window.partitionBy("doc_id", "stop").orderBy("pos")
    runs = marked.filter(F.col("stop") == 0).withColumn(
        "grp", F.col("pos") - F.row_number().over(w_run)
    )
    phrases = runs.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    pwords = phrases.select(
        "doc_id",
        "grp",
        "plen",
        "phrase",
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wstats = pwords.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    scored = (
        pwords.join(wstats, "w")
        .select(
            "doc_id",
            "grp",
            "phrase",
            F.round(F.col("degree").cast("double") / F.col("freq"), 9)
            .cast("decimal(24,12)")
            .alias("term"),
        )
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("term").alias("sc"))
    )
    agg = scored.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.round(F.min("sc").cast("double"), 6).alias("rake_score"),
    )
    w_top = Window.orderBy(  # bounded-window: input is the aggregated distinct-phrase frame; row_number + filter <= 20 compiles to TakeOrderedAndProject
        F.col("rake_score").desc(), "phrase"
    )
    return (
        agg.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 20)
        .select("phrase", "n_occurrences", "rake_score")
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


_SB_ALPHA = 0.4

_SB_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 < 50 AS is_train,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    tri AS (
      SELECT doc_id, is_train,
             unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i])) AS w1,
             unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i+1])) AS w2,
             unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i+2])) AS w3
      FROM toks
    ),
    uni AS (
      SELECT doc_id, is_train, unnest(t) AS w FROM toks
    ),
    c3 AS (SELECT w1, w2, w3, COUNT(*) AS c FROM tri WHERE is_train
           GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM (
             SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(t) - 1),
                           i -> t[i])) AS w1,
                    unnest(list_transform(generate_series(1, len(t) - 1),
                           i -> t[i+1])) AS w2
             FROM toks WHERE is_train
           ) GROUP BY 1, 2),
    c1 AS (SELECT w, COUNT(*) AS c FROM uni WHERE is_train GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM uni WHERE is_train),
    scored AS (
      SELECT q.doc_id,
             CAST(round(log(
               CASE
                 WHEN t3.c IS NOT NULL AND b12.c IS NOT NULL
                   THEN CAST(t3.c AS DOUBLE) / b12.c
                 WHEN b23.c IS NOT NULL AND u2.c IS NOT NULL
                   THEN {_SB_ALPHA} * (CAST(b23.c AS DOUBLE) / u2.c)
                 WHEN u3.c IS NOT NULL
                   THEN {_SB_ALPHA} * {_SB_ALPHA}
                        * (CAST(u3.c AS DOUBLE) / tv.n)
                 ELSE {_SB_ALPHA} * {_SB_ALPHA} * (1.0 / tv.n)
               END), 9) AS DECIMAL(24,12)) AS lp
      FROM tri q
      LEFT JOIN c3 t3 ON t3.w1 = q.w1 AND t3.w2 = q.w2 AND t3.w3 = q.w3
      LEFT JOIN c2 b12 ON b12.w1 = q.w1 AND b12.w2 = q.w2
      LEFT JOIN c2 b23 ON b23.w1 = q.w2 AND b23.w2 = q.w3
      LEFT JOIN c1 u2 ON u2.w = q.w2
      LEFT JOIN c1 u3 ON u3.w = q.w3
      CROSS JOIN tot tv
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_sb_logprob
    FROM scored
    GROUP BY doc_id
"""


@register("text_stupid_backoff_score", oracle=_SB_ORACLE)
def text_stupid_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff trigram scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the smoothing Google
    built for corpora too big to Kneser-Ney): score = c3/c2 when the
    trigram is KNOWN, else alpha * bigram ratio, else alpha^2 * unigram
    ratio, alpha = 0.4, no normalization anywhere — which is exactly
    what makes it embarrassingly distributable: every level is a pure
    count ratio, no discount mass bookkeeping.

    The LM trains on the 50% md5-split half of the corpus and scores
    EVERY document, so held-out documents genuinely exercise the
    backoff chain (a same-corpus LM would always hit the trigram
    level). Scale shape: three count tables off one tokenization, five
    vocabulary-bounded left joins keyed on words, per-term logs
    rounded to 9 dp and decimal-accumulated."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim("text")), r"\s+")
    is_train = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
        < 50
    )
    docs = d.select("doc_id", is_train.alias("is_train"), t.alias("t"))

    def grams(n: int, src: DataFrame) -> DataFrame:
        cols = [
            F.slice(
                F.col("t"), i + 1, F.greatest(F.size("t") - (n - 1), F.lit(0))
            ).alias(f"a{i}")
            for i in range(n)
        ]
        z = src.select("doc_id", "is_train", F.explode(F.arrays_zip(*cols)).alias("z"))
        return z.select(
            "doc_id",
            "is_train",
            *[F.col(f"z.a{i}").alias(f"w{i + 1}") for i in range(n)],
        )

    tri = grams(3, docs)
    train_tri = tri.filter("is_train")
    c3 = train_tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    bi = grams(2, docs).filter("is_train")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    uni = docs.filter("is_train").select(F.explode("t").alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.count(F.lit(1)).alias("n"))

    c2_12 = c2.select(
        F.col("w1"), F.col("w2"), F.col("c").alias("c12")
    )
    c2_23 = c2.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c").alias("c23")
    )
    c1_2 = c1.select(F.col("w").alias("w2"), F.col("c").alias("cu2"))
    c1_3 = c1.select(F.col("w").alias("w3"), F.col("c").alias("cu3"))
    score = (
        F.when(
            F.col("c3").isNotNull() & F.col("c12").isNotNull(),
            F.col("c3").cast("double") / F.col("c12"),
        )
        .when(
            F.col("c23").isNotNull() & F.col("cu2").isNotNull(),
            F.lit(_SB_ALPHA) * (F.col("c23").cast("double") / F.col("cu2")),
        )
        .when(
            F.col("cu3").isNotNull(),
            F.lit(_SB_ALPHA)
            * F.lit(_SB_ALPHA)
            * (F.col("cu3").cast("double") / F.col("n")),
        )
        .otherwise(
            F.lit(_SB_ALPHA) * F.lit(_SB_ALPHA) * (F.lit(1.0) / F.col("n"))
        )
    )
    lp = F.round(F.log10(score), 9).cast("decimal(24,12)")
    return (
        tri.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2_12, ["w1", "w2"], "left")
        .join(c2_23, ["w2", "w3"], "left")
        .join(c1_2, "w2", "left")
        .join(c1_3, "w3", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_sb_logprob"),
        )
    )


_BORDA_STOPS = "('the','a','of','to','and','in','for','is')"


@register(
    "doc_quality_rank_fusion",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             w -> w IN {_BORDA_STOPS})) AS n_stop,
             CAST(len(list_distinct(string_split_regex(lower(trim(text)),
                                                       '\\s+'))) AS DOUBLE)
               / len(string_split_regex(lower(trim(text)), '\\s+')) AS ttr
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tokens, n_stop, ttr,
             ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS r_tokens,
             ROW_NUMBER() OVER (ORDER BY n_stop DESC, doc_id) AS r_stop,
             ROW_NUMBER() OVER (ORDER BY ttr DESC, doc_id) AS r_ttr
      FROM sig
    )
    SELECT doc_id,
           CAST(r_tokens AS BIGINT) AS r_tokens,
           CAST(r_stop AS BIGINT) AS r_stop,
           CAST(r_ttr AS BIGINT) AS r_ttr,
           CAST(r_tokens + r_stop + r_ttr AS BIGINT) AS borda,
           CAST(ROW_NUMBER() OVER (
             ORDER BY r_tokens + r_stop + r_ttr, doc_id) AS BIGINT)
             AS fused_rank
    FROM ranked
    """,
)
def doc_quality_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count rank fusion over three quality signals (token
    count, stopword evidence, type-token ratio) — ensemble filtering:
    no single heuristic decides, documents are ordered by the SUM of
    their per-signal ranks (the rank-fusion rule RRF generalizes; the
    same fusion a curation pipeline applies across quality
    classifiers). All four global rankings run on the distributed
    exact ranker (range shuffle + broadcast offsets — never a
    single-partition window), with doc_id tiebreaks so both engines
    rank identically; the fused frame is one three-way join on
    doc_id."""
    from ..operators.ntile import global_row_number

    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim("text")), r"\s+")
    stops = [s.strip("'") for s in _BORDA_STOPS.strip("()").split(",")]
    sig = d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.filter(t, lambda w: w.isin(stops))).alias("n_stop"),
        (
            F.size(F.array_distinct(t)).cast("double") / F.size(t)
        ).alias("ttr"),
    )
    r1 = global_row_number(
        sig, [F.col("n_tokens").desc(), F.col("doc_id")], "r_tokens"
    ).select("doc_id", "r_tokens")
    r2 = global_row_number(
        sig, [F.col("n_stop").desc(), F.col("doc_id")], "r_stop"
    ).select("doc_id", "r_stop")
    r3 = global_row_number(
        sig, [F.col("ttr").desc(), F.col("doc_id")], "r_ttr"
    ).select("doc_id", "r_ttr")
    fused = (
        r1.join(r2, "doc_id")
        .join(r3, "doc_id")
        .withColumn(
            "borda", F.col("r_tokens") + F.col("r_stop") + F.col("r_ttr")
        )
    )
    out = global_row_number(
        fused, [F.col("borda"), F.col("doc_id")], "fused_rank"
    )
    return out.select(
        "doc_id",
        F.col("r_tokens").cast("long").alias("r_tokens"),
        F.col("r_stop").cast("long").alias("r_stop"),
        F.col("r_ttr").cast("long").alias("r_ttr"),
        F.col("borda").cast("long").alias("borda"),
        F.col("fused_rank").cast("long").alias("fused_rank"),
    )


_BD_WORDS = 2080          # 2080 words x 63 usable bits = 131,040 bits
_BD_HASHES = 3


def _bd_hash_sql(i: int) -> str:
    return (
        f"CAST(concat('0x', substring(md5(CAST({i} AS VARCHAR) || '#' || g),"
        f" 1, 12)) AS BIGINT) % {_BD_WORDS * 63}"
    )


@register(
    "text_decontaminate_bloom",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+12], ' ') AS g
      FROM toks, UNNEST(range(1, len(t) - 11)) AS u(i)
    ),
    e AS (SELECT DISTINCT g FROM grams WHERE doc_id < 50),
    bits AS (
      SELECT pos // 63 AS word, 1::BIGINT << (pos % 63) AS mask
      FROM (
        SELECT unnest([{", ".join(_bd_hash_sql(i) for i in range(_BD_HASHES))}]) AS pos
        FROM e
      )
    ),
    filt AS (SELECT word, bit_or(mask) AS bm FROM bits GROUP BY 1),
    c AS (SELECT doc_id, g FROM grams WHERE doc_id >= 50),
    probes AS (
      SELECT doc_id, g, pos // 63 AS word, 1::BIGINT << (pos % 63) AS mask
      FROM (
        SELECT doc_id, g,
               unnest([{", ".join(_bd_hash_sql(i) for i in range(_BD_HASHES))}]) AS pos
        FROM c
      )
    ),
    hit AS (
      SELECT p.doc_id, p.g,
             CAST(bool_and(COALESCE(f.bm, 0) & p.mask <> 0) AS INT)
               AS bloom_hit
      FROM probes p LEFT JOIN filt f USING (word)
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT h.doc_id, h.g, h.bloom_hit,
             CAST(h.g IN (SELECT g FROM e) AS INT) AS true_hit
      FROM hit h
    )
    SELECT doc_id AS corpus_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_flagged,
           CAST(SUM(true_hit) AS BIGINT) AS n_true_shared,
           CAST(SUM(CASE WHEN bloom_hit = 1 AND true_hit = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM truth
    GROUP BY doc_id
    """,
)
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screened decontamination (the Dolma mechanism): the eval
    set's distinct 13-grams build a 131k-bit Bloom filter AS A FRAME
    (one row per 63-bit word — the filter never concentrates on the
    driver or a single row), and every corpus 13-gram probes it with
    three md5-derived positions. The exact membership check runs
    alongside, so the output carries the measured false-positive count
    per document — the number that tells you whether the configured
    bits/key budget is adequate BEFORE you trust the screen at 100 TB
    (the exact join is the audit; in production only flagged docs pay
    it). Scale shape: the filter frame broadcasts (~2 KB); corpus
    grams stream map-side through the probe join; the per-gram
    verdict is a 3-row bool_and."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    inst = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.when(
                F.size("t") >= 13, F.sequence(F.lit(1), F.size("t") - 12)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    ).select(
        "doc_id",
        F.array_join(F.slice(F.col("t"), F.col("i"), 13), " ").alias("g"),
    )
    grams = inst.distinct()
    e = grams.filter(F.col("doc_id") < 50).select("g").distinct()

    def positions(df):
        pos = F.explode(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("#", F.lit(str(i)), F.col("g"))),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % (_BD_WORDS * 63)
                    for i in range(_BD_HASHES)
                ]
            )
        ).alias("pos")
        return df.select("*", pos).select(
            *df.columns,
            (F.col("pos") / 63).cast("long").alias("word"),
            # shiftleft's python wrapper only takes a literal shift —
            # the SQL form accepts a column
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias(
                "mask"
            ),
        )

    filt = (
        positions(e)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bm"))
    )
    c = grams.filter(F.col("doc_id") >= 50)
    hit = (
        positions(c)
        .join(F.broadcast(filt), "word", "left")
        .groupBy("doc_id", "g")
        .agg(
            F.min(
                (
                    F.coalesce(F.col("bm"), F.lit(0)).bitwiseAND(
                        F.col("mask")
                    )
                    != 0
                ).cast("int")
            ).alias("bloom_hit")
        )
    )
    truth = hit.join(
        e.select(F.col("g"), F.lit(1).alias("true_hit")), "g", "left"
    ).select(
        "doc_id",
        "bloom_hit",
        F.coalesce(F.col("true_hit"), F.lit(0)).alias("true_hit"),
    )
    return truth.groupBy(F.col("doc_id").alias("corpus_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("bloom_hit").cast("long").alias("n_bloom_flagged"),
        F.sum("true_hit").cast("long").alias("n_true_shared"),
        F.sum(
            F.when((F.col("bloom_hit") == 1) & (F.col("true_hit") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
    )


@register(
    "doc_length_kl_by_source",
    oracle="""
    WITH d AS (
      SELECT source,
             LEAST(len(string_split_regex(lower(trim(text)), '\\s+')) // 10,
                   30) AS bin
      FROM documents
    ),
    per AS (SELECT source, bin, COUNT(*) AS q FROM d GROUP BY 1, 2),
    stot AS (SELECT source, SUM(q) AS nq FROM per GROUP BY 1),
    corp AS (SELECT bin, COUNT(*) AS p FROM d GROUP BY 1),
    ctot AS (SELECT COUNT(*) AS np FROM d),
    terms AS (
      SELECT per.source,
             CAST(round(
               (CAST(per.q AS DOUBLE) / st.nq)
               * ln((CAST(per.q AS DOUBLE) / st.nq)
                    / (CAST(c.p AS DOUBLE) / ct.np)), 9)
               AS DECIMAL(24,12)) AS t
      FROM per
      JOIN stot st USING (source)
      JOIN corp c USING (bin)
      CROSS JOIN ctot ct
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           round(CAST(SUM(t) AS DOUBLE), 6) AS kl_nats
    FROM terms
    GROUP BY source
    """,
)
def doc_length_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-distribution drift: KL(source || corpus) over
    binned token counts (width-10 bins capped at 30) — the
    one-number-per-source screen for 'does this source's document
    shape diverge from the mix' that a curation pipeline tracks across
    snapshots, complementing the value-distribution drift (KS/PSI) and
    embedding drift (MMD) monitors. Bin histograms are two integer
    aggregations; per-bin KL terms are fixed-order doubles rounded to
    9 dp and decimal-accumulated, so each source's divergence is
    order-free. Bins present in a source are present in the corpus by
    containment, so no zero-denominator guard is needed."""
    d = load_table(spark, sf_dir, "documents")
    binc = F.least(
        (F.size(F.split(F.lower(F.trim("text")), r"\s+")) / 10).cast("long"),
        F.lit(30),
    )
    base = d.select("source", binc.alias("bin"))
    per = base.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("q"))
    stot = per.groupBy("source").agg(F.sum("q").alias("nq"))
    corp = base.groupBy("bin").agg(F.count(F.lit(1)).alias("p"))
    ctot = base.agg(F.count(F.lit(1)).alias("np"))
    qf = F.col("q").cast("double") / F.col("nq")
    pf = F.col("p").cast("double") / F.col("np")
    term = F.round(qf * F.log(qf / pf), 9).cast("decimal(24,12)")
    return (
        per.join(stot, "source")
        .join(corp, "bin")
        .crossJoin(F.broadcast(ctot))
        .select("source", term.alias("t"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.round(F.sum("t").cast("double"), 6).alias("kl_nats"),
        )
    )


@register(
    "doc_tokenizer_fertility_by_lang",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_tok,
             octet_length(encode(text)) AS n_bytes,
             len(string_split_regex(trim(text), '\\s+')) AS n_words
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
           round(CAST(SUM(n_tok) AS DOUBLE) / SUM(n_words), 6)
             AS tokens_per_word,
           round(CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_tok), 6)
             AS bytes_per_token
    FROM d
    GROUP BY lang
    """,
)
def doc_tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility audit per language: tokens-per-word and
    bytes-per-token under the GPT-2-style pretokenizer — the equity
    metric a multilingual pipeline tracks (a language whose fertility
    runs 2× pays twice the context budget and twice the training cost
    for the same text; tokenizer papers report exactly this table).
    One projection computing three integer lengths per document plus a
    per-language aggregation of exact integer sums; the two ratios are
    single fixed-order double divisions."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)).alias(
            "n_tok"
        ),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
    )
    return base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
        F.round(
            F.sum("n_tok").cast("double") / F.sum("n_words"), 6
        ).alias("tokens_per_word"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_tok"), 6
        ).alias("bytes_per_token"),
    )


@register(
    "doc_quality_quantile_normalize",
    oracle="""
    WITH src AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    pooled AS (
      SELECT n_chars AS pooled_val,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents),
    idx AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN ns = 1 THEN (n + 1) // 2
                  ELSE (r - 1) * (n - 1) // (ns - 1) + 1
             END AS i
      FROM src, tot
    )
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(pooled_val AS BIGINT) AS norm_chars
    FROM idx JOIN pooled ON pooled.rn = idx.i
    """,
)
def doc_quality_quantile_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact quantile normalization of a per-document signal ACROSS
    sources — the alignment step before mixing corpora by a quality
    or length score: source A's 90th percentile maps to the POOLED
    90th-percentile value, so a threshold or temperature computed on
    the pooled distribution means the same thing for every source
    (a score of "200 chars" from a tweet corpus and a book corpus are
    not comparable; their quantiles are). Classic rank-based quantile
    normalization (Bolstad et al. 2003), exact: within-source rank r
    of n_s maps to pooled order statistic at index
    (r−1)(N−1) div (n_s−1) + 1 — all integer arithmetic, no
    interpolation drift.

    Scale shape: the within-source ranks come from windows PARTITIONED
    BY source (distributed); the pooled order statistics come from the
    distributed exact ranker (``global_row_number``: one range shuffle
    + broadcast offsets — never a single-partition window); the lookup
    is an equi-join on the mapped index."""
    from ..operators.ntile import global_row_number

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    src = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("ns"),
    )
    pooled = global_row_number(
        d.select("n_chars", "doc_id"), ["n_chars", "doc_id"], "rn"
    ).select(F.col("n_chars").alias("pooled_val"), F.col("rn").alias("rn"))
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    idx = src.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("ns") == 1,
            F.expr("(n + 1) div 2"),
        )
        .otherwise(F.expr("(r - 1) * (n - 1) div (ns - 1) + 1"))
        .alias("i"),
    )
    return idx.join(pooled, idx.i == pooled.rn).select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("pooled_val").cast("long").alias("norm_chars"),
    )
