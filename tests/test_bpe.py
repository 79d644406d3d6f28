"""BPE trainer parity: the distributed trainer must learn EXACTLY the
merge sequence a reference single-machine BPE implementation learns on
the same corpus (same tie rule: heaviest pair, then lexicographic)."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from irs_990_efiler_database_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation (Sennrich-style), driver-side."""
    vocab = {
        tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@pytest.mark.slow
def test_bpe_train_matches_reference(spark):
    from irs_990_efiler_database_spark.operators.bpe import (
        bpe_encode_words,
        bpe_train,
    )

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 60)
    got = bpe_train(docs, n_merges=8)

    # reference over the identical word-frequency table
    wf = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].strip().lower().split():
            if w:
                wf[w] += 1
    want = _ref_bpe(dict(wf), 8)
    assert got == [tuple(m) for m in want]

    # the encode path applies the merges: every learned merged symbol
    # must survive into some token — either as the token itself or
    # folded inside a LATER merge's bigger token
    enc = bpe_encode_words(docs, got)
    toks = {
        t for r in enc.select("tokens").collect() for t in r["tokens"]
    }
    for a, b in got:
        assert any((a + b) in t for t in toks), (a, b, sorted(toks)[:20])
