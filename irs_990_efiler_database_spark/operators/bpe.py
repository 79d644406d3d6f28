"""Distributed BPE (byte-pair-encoding) vocabulary trainer.

The tokenizer-training counterpart of the engine's token-counting /
packing operators: given a corpus, learn the ``n_merges`` most frequent
adjacent-symbol merges (the core of every BPE/WordPiece-family
tokenizer). Classic trainers are single-machine; at 100 TB the corpus
cannot move, so each Lloyd-style round here is ONE distributed pass:

1. the corpus collapses once to a (word, freq) table — all later
   rounds run over DISTINCT WORDS weighted by frequency, which is
   orders of magnitude smaller than the corpus and independent of
   corpus size for a fixed vocabulary;
2. adjacent symbol pairs explode from each word's symbol array with
   the word's weight, one grouped sum finds the heaviest pair
   (ties: lexicographic, so the result is deterministic), and only
   that ONE row crosses to the driver per round;
3. the merge is applied to the symbol arrays as a native
   ``F.aggregate`` fold (no Python row path), and the loop repeats.

Training mirrors ``similarity.ivf_train``: an offline index-building
job whose output (the ordered merge list) drops into any tokenizer
runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words_with_freq(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq, syms) — the collapsed training table. syms starts
    as the word's character symbols with a terminal marker."""
    w = corpus.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "word"
        )
    ).filter(F.col("word") != "")
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.concat(
                F.split(F.col("word"), ""),
                F.array(F.lit("</w>")),
            ),
        )
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array of "a b" strings for each adjacent symbol pair."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.get(syms, i), F.get(syms, i + 1)),
        )
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Fold the symbol array, replacing every adjacent (a, b) with
    a+b — left-to-right, non-overlapping, exactly the reference BPE
    merge rule — entirely in native expressions."""
    merged = F.lit(a + b)
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, s: Column) -> Column:
        pend = acc["pend"]
        out = acc["out"]
        take_merge = pend.isNotNull() & (pend == a) & (s == F.lit(b))
        return F.when(
            pend.isNull(),
            F.struct(out.alias("out"), s.alias("pend")),
        ).otherwise(
            F.when(
                take_merge,
                F.struct(
                    F.concat(out, F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(out, F.array(pend)).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(syms, acc0, step, finish)


def bpe_train(
    corpus: DataFrame, text_col: str = "text", n_merges: int = 10
) -> list[tuple[str, str]]:
    """Learn the ordered merge list. Returns [(a, b), ...]."""
    words = words_with_freq(corpus, text_col).persist()
    words.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                words.select(
                    "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("pair")
                )
                .groupBy("pair")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["pair"].split(" ", 1)
            merges.append((a, b))
            nxt = words.withColumn(
                "syms", _apply_merge(F.col("syms"), a, b)
            ).persist()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges


def bpe_encode_words(
    corpus: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list: (word, freq, tokens) — the encode
    path, same fold expressions replayed in merge order."""
    words = words_with_freq(corpus, text_col)
    syms = F.col("syms")
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return words.select("word", "freq", syms.alias("tokens"))
