"""Retrieval / search / keyword operators over `documents`
(tf-idf, BM25, inverted postings, KWIC, RAKE, chunking; VERDICT r9 #7
split; see text_ops for the aggregator). All native Column expressions
(codegen'd); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register



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

    # rebalance=False: explode -> tf/df count aggregations first (r15
    # interleaved A/B: 2.59 s ON -> 1.28 s OFF at sf0.1 — the largest
    # opt-out win of the audit; the per-term df partial agg inflates
    # 32x under the rebalance)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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
    "text_chunk_overlap",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 64 THEN 1
                  ELSE CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) + 1
             END AS n_chunks
      FROM w
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_ix,
           CAST(i * 48 + 1 AS BIGINT) AS start_tok,
           CAST(len(toks[i*48+1 : i*48+64]) AS BIGINT) AS n_tokens,
           md5(array_to_string(toks[i*48+1 : i*48+64], ' ')) AS chunk_md5
    FROM c, unnest(generate_series(0, n_chunks - 1)) AS g(i)
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (strided) chunking — the RAG / long-context variant
    of ``text_chunk_fixed``: 64-token windows advancing by a 48-token
    stride, so consecutive chunks share a 16-token overlap and no
    retrieval boundary can split an answer span. The final window is
    truncated at the document end but always reaches it (its width is
    17..64 for multi-window docs — 16 shared tokens plus at least one
    new; a doc at or under one window emits exactly one chunk), so
    every token is covered. Like the fixed
    chunker this is built row-locally (sequence+transform+slice, then
    one posexplode): a shuffle-free scan whose output carries md5
    digests, never chunk text — at 100 TB the chunk table is what a
    vector-index build consumes, and it streams map-side."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    tk = F.col("toks")
    n = F.size(tk)
    n_chunks = F.when(n <= 64, F.lit(1)).otherwise(
        F.ceil((n - F.lit(64)) / F.lit(48.0)).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(tk, i * 48 + 1, 64)),
    )
    c = w.select("doc_id", F.posexplode(chunks).alias("chunk_ix", "chunk"))
    return c.select(
        "doc_id",
        F.col("chunk_ix").cast("long").alias("chunk_ix"),
        (F.col("chunk_ix") * 48 + 1).cast("long").alias("start_tok"),
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
    # rebalance=False: explode -> distinct -> per-token aggregation
    # first (r15 interleaved A/B: 0.76 s ON -> 0.63 s OFF at sf0.1)
    d = load_table(spark, sf_dir, "documents", rebalance=False)
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
