"""Property-based tests (hypothesis): operators with subtle semantics
are checked against independent pure-Python references on randomized
inputs — the cases fixtures don't think of (NULL payloads, boundary
timestamps, single-row groups, all-rows-one-key)."""

from __future__ import annotations

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
def test_chunker_round_trips_tokens(spark, texts):
    """Fixed-size chunking must partition each document's token stream
    exactly: chunk sizes sum to the token count, every chunk except the
    last is full, and re-joining chunks in order restores the token
    sequence."""
    import re

    from pyspark.sql import functions as F

    import irs_990_efiler_database_spark.queries.text_ops as text_ops

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # text_ops binds load_table at import; patch its module reference
    orig_load = text_ops.load_table
    text_ops.load_table = lambda _s, _d, _n: df
    try:
        out = text_ops.text_chunk_fixed(spark, "unused").collect()
    finally:
        text_ops.load_table = orig_load
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
