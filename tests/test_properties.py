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
