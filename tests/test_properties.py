"""Property-based tests (hypothesis): operators with subtle semantics
are checked against independent pure-Python references on randomized
inputs — the cases fixtures don't think of (NULL payloads, boundary
timestamps, single-row groups, all-rows-one-key)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from irs_990_efiler_database_spark.operators.joins import asof_join

# one Spark round-trip per example — keep the example count modest and
# disable wall-clock-based flakiness knobs
SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_ts = st.integers(min_value=0, max_value=50)
_val = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))

# per key: clicks (ts list, dups fine) + purchases (UNIQUE ts per key —
# the operator's tie order among equal right timestamps is explicitly
# unspecified, matching DuckDB ASOF)
_per_key = st.tuples(
    st.lists(_ts, max_size=6),
    st.dictionaries(_ts, _val, max_size=6),
)
_dataset = st.dictionaries(st.integers(0, 3), _per_key, min_size=1, max_size=4)


def _reference(dataset):
    """Pure-Python as-of: latest purchase at-or-before each click."""
    out = []
    for key, (clicks, purchases) in sorted(dataset.items()):
        for i, ct in enumerate(clicks):
            prior = [pt for pt in purchases if pt <= ct]
            if prior:
                pt = max(prior)
                out.append((key, i, ct, pt, purchases[pt]))
            else:
                out.append((key, i, ct, None, None))
    return sorted(out)


@given(_dataset)
@SETTINGS
@pytest.mark.slow
def test_asof_join_matches_reference(spark, dataset):
    clicks = [
        (k, i, ct)
        for k, (cl, _) in dataset.items()
        for i, ct in enumerate(cl)
    ]
    purchases = [
        (k, pt, v) for k, (_, pu) in dataset.items() for pt, v in pu.items()
    ]
    if not clicks:
        return
    left = spark.createDataFrame(clicks, "k long, click_id long, ts long")
    right = spark.createDataFrame(purchases, "k long, ts long, v long")
    got = sorted(
        (r["k"], r["click_id"], r["ts"], r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, keys=["k"], ts_col="ts", payload_cols=["v"]
        ).collect()
    )
    assert got == _reference(dataset)


_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # key — few values = maximal skew
        st.integers(0, 10**6),  # salt id
        st.decimals(
            min_value=-1000, max_value=1000, places=2, allow_nan=False
        ),
    ),
    min_size=1,
    max_size=40,
)


@given(_rows)
@SETTINGS
@pytest.mark.slow
def test_salted_aggregation_equals_direct(spark, rows):
    from irs_990_efiler_database_spark.operators.skew import salted_sum_count
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, i, str(v)) for k, i, v in rows], "k long, rid long, v string"
    ).select("k", "rid", F.col("v").cast("decimal(18,2)").alias("v"))
    got = {
        r["k"]: (r["sum_value"], r["n"])
        for r in salted_sum_count(
            df, keys=["k"], value=F.col("v"), salt_on="rid", n_salts=4
        ).collect()
    }
    want = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


_vals = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200)


@given(_vals, st.integers(min_value=1, max_value=16))
@SETTINGS
@pytest.mark.slow
def test_kmv_bottom_k_matches_reference(spark, values, k):
    """The KMV synopsis must equal the k smallest distinct reference
    hashes regardless of partitioning, duplication, or k vs
    cardinality."""
    import hashlib

    from pyspark.sql import functions as F  # noqa: F401

    from irs_990_efiler_database_spark.operators.sketch import kmv_bottom_k

    df = spark.createDataFrame([(v,) for v in values], ["v"]).repartition(4)
    got = sorted(r["h"] for r in kmv_bottom_k(df, "v", k).collect())
    want = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in values
        }
    )[:k]
    assert got == want


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),
        min_size=1,
        max_size=300,
    ).filter(lambda s: s.strip()),
    min_size=1,
    max_size=8,
)


@given(_texts)
@SETTINGS
@pytest.mark.slow
def test_chunker_round_trips_tokens(spark, texts):
    """Fixed-size chunking must partition each document's token stream
    exactly: chunk sizes sum to the token count, every chunk except the
    last is full, and re-joining chunks in order restores the token
    sequence."""
    import re

    from pyspark.sql import functions as F

    import irs_990_efiler_database_spark.queries.text_retrieval as text_retrieval

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # the query binds load_table at import; patch the OWNING module's
    # reference (text_retrieval since the r10 sub-family split —
    # patching the text_ops aggregator would be a no-op)
    orig_load = text_retrieval.load_table
    text_retrieval.load_table = lambda _s, _d, _n, **_kw: df
    try:
        out = text_retrieval.text_chunk_fixed(spark, "unused").collect()
    finally:
        text_retrieval.load_table = orig_load
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.strip())
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_ix"])
        assert [r["chunk_ix"] for r in chunks] == list(range(len(chunks)))
        assert sum(r["n_tokens"] for r in chunks) == len(toks)
        assert all(r["n_tokens"] == 50 for r in chunks[:-1])
        assert 1 <= chunks[-1]["n_tokens"] <= 50


# ---- hot-bucket cap invariants -------------------------------------

_bucket_rows = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 5)),  # (id, bucket key)
    min_size=0,
    max_size=60,
)


@given(_bucket_rows, st.integers(1, 8))
@SETTINGS
@pytest.mark.slow
def test_cap_hot_buckets_invariants(spark, rows, cap):
    """(a) no surviving bucket exceeds the cap; (b) every under-cap
    row survives untouched; (c) survivors ∪ dropped-bucket members
    partition the input exactly."""
    from collections import Counter

    from irs_990_efiler_database_spark.operators.dedup import (
        cap_hot_buckets,
        dropped_bucket_keys,
    )

    df = spark.createDataFrame(
        [(i, r, b) for i, (r, b) in enumerate(rows)], "i long, r long, b long"
    )
    kept = cap_hot_buckets(df, ["b"], cap).collect()
    sizes = Counter(b for _, b in rows)
    kept_sizes = Counter(row["b"] for row in kept)
    assert all(n <= cap for n in kept_sizes.values())
    want_kept = {b for b, n in sizes.items() if n <= cap}
    assert set(kept_sizes) == want_kept
    for b in want_kept:
        assert kept_sizes[b] == sizes[b]
    dropped = {
        row["b"]: row["bucket_n"]
        for row in dropped_bucket_keys(df, ["b"], cap).collect()
    }
    assert dropped == {b: n for b, n in sizes.items() if n > cap}
    assert len(kept) + sum(dropped.values()) == len(rows)


# ---- backward as-of tie rule ---------------------------------------

_tie_rows = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 50)),  # (ts, tie id)
    min_size=1,
    max_size=10,
    unique_by=lambda t: t,
)


@given(st.integers(0, 10), _tie_rows)
@SETTINGS
@pytest.mark.slow
def test_asof_backward_tie_col_matches_reference(spark, left_ts, right_rows):
    """With tie_col, the backward as-of must pick the LATEST ts ≤ left
    and, among equal timestamps, the SMALLEST tie value — the oracle's
    ORDER BY ts DESC, tie LIMIT 1."""
    left = spark.createDataFrame([(1, left_ts)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, ts, tid) for ts, tid in right_rows], "k int, ts int, tid int"
    )
    row = asof_join(
        left, right, keys=["k"], ts_col="ts", payload_cols=["tid"],
        tie_col="tid",
    ).first()
    eligible = [(ts, tid) for ts, tid in right_rows if ts <= left_ts]
    if not eligible:
        assert row["asof_tid"] is None
    else:
        best_ts = max(ts for ts, _ in eligible)
        best_tid = min(tid for ts, tid in eligible if ts == best_ts)
        assert (row["asof_ts"], row["asof_tid"]) == (best_ts, best_tid)


# ---- BPE merge fold ------------------------------------------------

_word = st.text(alphabet="ab", min_size=1, max_size=8)


@given(st.lists(_word, min_size=1, max_size=8), st.integers(1, 4))
@SETTINGS
@pytest.mark.slow
def test_bpe_train_matches_reference_on_random_corpora(spark, words, n):
    """The distributed trainer's merge sequence equals the pure-Python
    Sennrich reference on adversarial two-letter corpora (maximal tie
    density — every pair is a near-tie, so the lexicographic rule is
    load-bearing in almost every round)."""
    from collections import Counter

    from irs_990_efiler_database_spark.operators.bpe import bpe_train
    from tests.test_bpe import _ref_bpe

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=n)
    want = _ref_bpe(dict(Counter(words)), n)
    assert got == [tuple(m) for m in want]


# ---- distributed exact ntile ---------------------------------------


@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=60),
    st.integers(1, 12),
    st.integers(1, 6),
)
@SETTINGS
@pytest.mark.slow
def test_exact_ntile_matches_pure_python_ntile(spark, vals, n, parts):
    """exact_ntile equals the ANSI NTILE rule computed in pure Python
    over the sorted (value, id) order — across heavy-tie inputs, n
    above/below the row count, and degenerate partition counts
    (including num_partitions=1 and > rows)."""
    from irs_990_efiler_database_spark.operators.ntile import exact_ntile

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["t"]
        for r in exact_ntile(
            df, n, ["v", "id"], "t", num_partitions=parts
        ).collect()
    }

    order = sorted(rows, key=lambda r: (r[1], r[0]))
    total = len(order)
    low, rem = divmod(total, n)
    want = {}
    for rank, (rid, _) in enumerate(order, start=1):
        if rank <= rem * (low + 1):
            want[rid] = (rank - 1) // (low + 1) + 1
        else:
            want[rid] = rem + (rank - 1 - rem * (low + 1)) // low + 1
    assert got == want


def test_ntile_of_rank_integer_exact_near_2_53(spark):
    """ntile_of_rank must stay exact for totals beyond 2^53, where
    double division mis-assigns boundary ranks (ADVICE r5: the old
    F.floor(total / n) formulation went through a 53-bit mantissa).
    Evaluated over literal (rank, total) rows against the pure-integer
    ANSI rule, pinning every tile boundary around the big-tile cut."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.operators.ntile import ntile_of_rank

    def want(rank, total, n):
        low, rem = divmod(total, n)
        cut = rem * (low + 1)
        if rank <= cut:
            return (rank - 1) // (low + 1) + 1
        return rem + (rank - 1 - cut) // low + 1

    total = (1 << 53) + 3901  # not representable exactly as double
    n = 7
    low, rem = divmod(total, n)
    cut = rem * (low + 1)
    ranks = sorted(
        {
            1, total,
            cut, cut + 1,  # big/small tile boundary
            low + 1, low + 2,  # first tile edge
            cut + low, cut + low + 1,  # first small-tile edge
            (1 << 53) - 1, 1 << 53, (1 << 53) + 1,  # mantissa edge
        }
    )
    df = spark.createDataFrame([(r,) for r in ranks], "rank long")
    got = {
        r["rank"]: r["tile"]
        for r in df.select(
            "rank",
            ntile_of_rank(F.col("rank"), F.lit(total), n).alias("tile"),
        ).collect()
    }
    for r in ranks:
        assert got[r] == want(r, total, n), (r, got[r], want(r, total, n))
    # low = 0 guard: total < n — every rank is its own tile
    small = spark.createDataFrame([(1,), (2,), (3,)], "rank long")
    got_small = {
        r["rank"]: r["tile"]
        for r in small.select(
            "rank", ntile_of_rank(F.col("rank"), F.lit(3), 10).alias("tile")
        ).collect()
    }
    assert got_small == {1: 1, 2: 2, 3: 3}


_ess_doc = st.text(alphabet="abc", min_size=0, max_size=24)
_ess_corpus = st.lists(_ess_doc, min_size=1, max_size=8)


def _ess_reference(docs, w):
    """Brute-force ExactSubstr: duplicated windows by literal substring
    comparison across docs, merged into maximal per-doc spans."""
    from collections import defaultdict

    owners = defaultdict(set)
    for d, s in enumerate(docs):
        for i in range(len(s) - w + 1):
            owners[s[i : i + w]].add(d)
    out = {}
    for d, s in enumerate(docs):
        spans = []
        for i in range(len(s) - w + 1):
            if len(owners[s[i : i + w]]) >= 2:
                b, e = i, i + w - 1
                if spans and b <= spans[-1][1] + 1 and b <= spans[-1][1]:
                    spans[-1] = (spans[-1][0], max(spans[-1][1], e))
                elif spans and b <= spans[-1][1]:
                    spans[-1] = (spans[-1][0], max(spans[-1][1], e))
                else:
                    spans.append((b, e))
        # merge overlapping (windows at i and i+1 overlap by w-1 chars)
        merged = []
        for b, e in spans:
            if merged and b <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((b, e))
        out[d] = (
            len(merged),
            sum(e - b + 1 for b, e in merged),
            len(s),
        )
    return out


@SETTINGS
@given(_ess_corpus)
@pytest.mark.slow
def test_exact_substring_spans_match_bruteforce(spark, docs):
    """The distributed window-hash + gaps-and-islands span merge must
    reproduce a literal brute-force substring comparison on arbitrary
    corpora — including empty docs, all-identical docs, and docs
    shorter than the window."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.operators.dedup import (
        exact_substring_spans,
    )

    w = 4
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, t string"
    )
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_chars"], r["n_chars"])
        for r in exact_substring_spans(df, w).collect()
    }
    expect = _ess_reference(docs, w)
    assert got == expect


# events for the time-sliced staging property: duplicate timestamps,
# single-user and multi-user shapes, tiny tables smaller than the
# slice count — every shape the adaptive backfill cap could meet
_stage_events_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id (skewed)
        st.integers(min_value=0, max_value=9),      # ts bucket (dups!)
        st.floats(min_value=0, max_value=5, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(_stage_events_rows, st.integers(min_value=2, max_value=6))
def test_time_sliced_staging_partitions_exactly(tmp_path_factory, rows, k):
    """_stage_events(time_slices=k>1) must, for ARBITRARY event tables
    (duplicate timestamps, heavy key skew, fewer rows than slices):
    (time_slices=1 is deliberately the raw-copy path — single-batch
    drains sort per batch inside the operator, so staging stays a
    byte copy there)
    (1) lose/duplicate nothing — the concatenated slices are exactly
    the (ts, event_id)-sorted input; (2) keep slices contiguous and
    non-overlapping in (ts, event_id) order — the property the per-key
    cross-batch state folds rely on; (3) stamp strictly increasing
    mtimes so the file source batches them in order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from irs_990_efiler_database_spark.queries import events_streaming as es

    d = tmp_path_factory.mktemp("slice_prop")
    (d / "src").mkdir()
    (d / "out").mkdir()
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "ts": pa.array(
                [r[1] * 60_000_000 for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, d / "src" / "events.parquet")
    # stage via an sf_dir layout catalog.table_path understands
    # (<sf_dir>/events.parquet)
    es._stage_events(str(d / "src"), d / "out", time_slices=k)
    parts = sorted((d / "out").glob("*.parquet"))
    assert len(parts) == k
    allk, prev_last, mtimes = [], None, []
    for p in parts:
        t = pq.read_table(p)
        keys = list(
            zip(t["ts"].to_pylist(), t["event_id"].to_pylist())
        )
        assert keys == sorted(keys)  # sorted within the slice
        if keys and prev_last is not None:
            assert keys[0] >= prev_last  # contiguous across slices
        if keys:
            prev_last = keys[-1]
        allk.extend(keys)
        mtimes.append(p.stat().st_mtime)
    want = sorted(
        zip(tbl["ts"].to_pylist(), tbl["event_id"].to_pylist())
    )
    assert allk == want  # nothing lost, nothing duplicated
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)


# ---- overlapping chunker / repetition removal ----------------------


@given(_texts)
@SETTINGS
@pytest.mark.slow
def test_overlap_chunker_covers_every_token(spark, texts):
    """Strided chunking (64-token windows, 48-token stride) must cover
    the token stream exactly: chunk_ix contiguous from 0, start_tok on
    the stride grid, each window holding the actual slice (md5-checked),
    consecutive windows sharing 16 tokens, and the last window reaching
    the final token."""
    import hashlib
    import re

    import irs_990_efiler_database_spark.queries.text_retrieval as tr

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    orig_load = tr.load_table
    tr.load_table = lambda _s, _d, _n, **_kw: df
    try:
        out = tr.text_chunk_overlap(spark, "unused").collect()
    finally:
        tr.load_table = orig_load
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.strip())
        n = len(toks)
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_ix"])
        assert [r["chunk_ix"] for r in chunks] == list(range(len(chunks)))
        for r in chunks:
            start = r["chunk_ix"] * 48 + 1
            assert r["start_tok"] == start
            want = toks[start - 1 : start - 1 + 64]
            assert r["n_tokens"] == len(want)
            assert (
                r["chunk_md5"]
                == hashlib.md5(" ".join(want).encode()).hexdigest()
            )
        last = chunks[-1]
        assert last["start_tok"] + last["n_tokens"] - 1 == n  # reaches end
        if n <= 64:
            assert len(chunks) == 1 and last["n_tokens"] == n
        else:
            assert all(r["n_tokens"] == 64 for r in chunks[:-1])
            # width = 16 shared + 1..48 new tokens, never exactly 16
            assert 17 <= last["n_tokens"] <= 64


@given(_texts)
@SETTINGS
@pytest.mark.slow
def test_repetition_removal_matches_pure_python(spark, texts):
    """Within-doc paragraph dedup vs an independent pure-Python model:
    10-token paragraphs, first-paragraph re-append for doc_id % 5 == 0,
    keep-first-occurrence, digest-of-digests fingerprint. The augmented
    docs must report n_removed >= 1 and a cleaned_fp identical to the
    UNAUGMENTED paragraph sequence's (removal exactly undoes the
    injection when the doc had no organic repeats)."""
    import hashlib
    import re

    import irs_990_efiler_database_spark.queries.dedup_ops as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    orig_load = dd.load_table
    dd.load_table = lambda _s, _d, _n, **_kw: df
    try:
        out = {
            r["doc_id"]: r
            for r in dd.fdedup_repetition_removal(spark, "unused").collect()
        }
    finally:
        dd.load_table = orig_load
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.strip())
        paras = [
            " ".join(toks[j : j + 10]) for j in range(0, len(toks), 10)
        ]
        base = list(paras)
        if doc_id % 5 == 0:
            paras = paras + [paras[0]]
        seen, kept = set(), []
        for p in paras:
            h = md5(p)
            if h not in seen:
                seen.add(h)
                kept.append(h)
        r = out[doc_id]
        assert r["n_paras"] == len(paras)
        assert r["n_removed"] == len(paras) - len(kept)
        assert r["cleaned_fp"] == md5("\n".join(kept))
        assert abs(
            r["rep_ratio"] - (len(paras) - len(kept)) / len(paras)
        ) < 1e-12
        if doc_id % 5 == 0:
            assert r["n_removed"] >= 1
            # injection fully undone when the doc had no organic repeats
            base_kept = []
            bs = set()
            for p in base:
                h = md5(p)
                if h not in bs:
                    bs.add(h)
                    base_kept.append(h)
            assert r["cleaned_fp"] == md5("\n".join(base_kept))
