"""Quality-scoring / language-ID / PII / decontamination operators
over `documents` (VERDICT r9 #7 split; see text_ops for the aggregator).
All native Column expressions (codegen'd); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..catalog import load_table
from . import register
from .text_lm import (
    _KN_ORACLE,
    _with_3grams,
    text_kneser_ney_bigram_score,
    text_lm_unigram_score,
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


_GOPHER_STOPWORDS = ["the", "a", "of", "to", "and", "in", "for", "is"]


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
    # persisted: the three rankers below each consume sig, and the
    # HOF-heavy signal projection (tokenize + stopword filter +
    # array_distinct per doc) otherwise re-runs once per ranker
    from ..caching import tracked_persist

    sig = tracked_persist(
        d.select(
            "doc_id",
            F.size(t).alias("n_tokens"),
            F.size(F.filter(t, lambda w: w.isin(stops))).alias("n_stop"),
            (
                F.size(F.array_distinct(t)).cast("double") / F.size(t)
            ).alias("ttr"),
        )
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

    # rebalance=False: window/rank-bound, cheap per-row work (measured
    # 0.77 s -> 1.08 s with the scan rebalance)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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
