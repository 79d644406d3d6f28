"""Runtime filter injection: a selective dimension filter must reach
the fact scan before the shuffle — as dynamic partition pruning on
partitioned layouts (tests/test_jobs.py) and as a runtime BLOOM filter
on unpartitioned scans, which is the 100 TB path that skips shuffling
fact rows that cannot survive the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from irs_990_efiler_database_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """lineitem ⋈ σ(orders) with broadcast disabled (the at-scale
    shape): the optimizer must inject a bloom-filter aggregate on the
    filtered dim side and a might_contain probe into the lineitem
    scan stage, and the filtered plan's answer must equal the
    default plan's. Thresholds are scaled down so the fixture-sized
    inputs exhibit the same relative selectivity a TB-scale join
    would."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            )
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        got = [(r["n"], str(r["q"])) for r in j.collect()]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
    )
    want = [(r["n"], str(r["q"])) for r in direct.collect()]
    assert got == want
