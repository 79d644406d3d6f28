"""Language-model / tokenization text operators over `documents`
(VERDICT r9 #7 split: n-gram LMs, BPE counting, token stats, Zipf/PMI;
the other sub-families live in text_quality / text_retrieval /
text_datasets, with text_ops as the compatibility aggregator). All
native Column expressions (codegen'd); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    # rebalance=False: aggregation-first consumer — the first operation
    # is explode -> groupBy(tok), so the scan rebalance only inflates
    # the map-side partial-aggregation output 32x (the same shape every
    # other opt-out protects). Measured (r14 regression, fixed r15):
    # 0.65 s at r13 -> 1.00-1.07 s with the default rebalance ->
    # interleaved A/B back to the r13 band with the opt-out.
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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
    # rebalance=False: bigram/unigram count aggregations first — the
    # Kneser-Ney shape (r15 interleaved A/B: 3.48 s ON -> 3.01 s OFF)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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

    # rebalance=False: explode -> groupBy(tok), the aggregation-first
    # shape (r15 interleaved A/B: 1.61 s ON -> 1.17 s OFF at sf0.1)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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
    # rebalance=False: every consumer of the persisted bigram frame is
    # a vocabulary-bounded aggregation; the scan rebalance only
    # inflates partial-agg output (measured 1.50 s -> 2.10 s)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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
    # deliberately NOT persisted: the four statistic consumers (ctx,
    # bwd, tot and the scoring join's cbi side) all sit above cbi's
    # (w1, w2) exchange, whose subtree is plan-identical — AQE exchange
    # reuse computes it once at runtime, so the corpus is tokenized
    # exactly twice (cbi build + the scoring join's pairs side), never
    # five times. Persisting `pairs` was measured SLOWER (1.34 s vs
    # 1.15 s interleaved at sf0.1): it trades one tokenization for a
    # corpus-sized materialization — guide §5's memory-pressure side
    # of the caching trade.
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
