"""Skew resilience: a hot key must not pin a whole stage on one task.

Two defenses exist in the engine: AQE skew-join splitting (runtime
re-plan of sort-merge joins — the default path for every key-partitioned
join surface) and the explicit salted-aggregation operator
(``operators.skew``, oracle-gated as ``agg_salted_skew_sum``) for
grouped hot keys. This module proves the AQE path actually fires on a
skewed-user events join and that the split plan's answer is
value-identical to the default plan's.

One sharp edge worth recording: when BOTH join sides hang off the SAME
shuffle (the funnel/retention shape that deliberately reuses one
user_id partitioning across stages), AQE will not split the reused
exchange — skew handling there falls to the salted operator or a
distinct upstream partitioning. The test below uses an independent
dimension side (user segments), which is the shape AQE owns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skewed_events(spark):
    """~50k events where ONE user owns 20% of all rows (the hot-key
    shape a viral session produces in a real event feed)."""
    hot = spark.range(10_000).select(
        F.lit(0).alias("user_id"),
        (F.col("id") * 1000).alias("us"),
    )
    cold = spark.range(40_000).select(
        (F.col("id") % 4000 + 1).alias("user_id"),
        (F.col("id") * 777).alias("us"),
    )
    return (
        hot.unionByName(cold)
        .select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            F.concat(F.lit("p"), F.col("us")).alias("payload"),
        )
        .localCheckpoint(eager=True)  # fixed lineage across both runs
    )


def _user_segments(spark):
    return spark.range(4001).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("segment"),
    )


def test_skewed_user_join_splits_and_stays_correct(spark, skewed_events):
    """Events x user-dimension join keyed on a 20%-hot user_id: with
    broadcast disabled (at real scale the dimension outgrows the
    broadcast threshold) AQE must mark the sort-merge join skew=true —
    splitting the hot partition across tasks — and the split plan's
    result must equal the default plan's."""
    confs = {
        # force the non-broadcast path the 100 TB shape takes
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # shrink AQE's skew thresholds so the 50k-row fixture exhibits
        # the same RELATIVE skew a TB-scale partition would
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # NB: assert on the join itself — a downstream groupBy that can
        # reuse the join's user_id partitioning makes AQE decline the
        # split (it would introduce an extra shuffle), which is the
        # right call: the skew then lands in a map-side-combined agg
        joined = skewed_events.join(_user_segments(spark), "user_id").select(
            "user_id", "segment", F.unix_micros("ts").alias("us")
        )
        rows = sorted(
            (r["user_id"], r["segment"], r["us"]) for r in joined.collect()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # correctness: the split plan's answer equals the default plan's
    direct = skewed_events.join(_user_segments(spark), "user_id").select(
        "user_id", "segment", F.unix_micros("ts").alias("us")
    )
    want = sorted(
        (r["user_id"], r["segment"], r["us"]) for r in direct.collect()
    )
    assert rows == want
    # the hot user's rows all survived the split
    assert sum(1 for r in rows if r[0] == 0) == 10_000
