"""Remaining UDF/SQL API surface (SURVEY §2.12): a vectorized
Arrow-batched scalar pandas_udf pinned to its native-expression twin,
and the spark.sql() text surface pinned to the DataFrame surface over
the registered views."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_pandas_udf_matches_native_norms(spark):
    """@pandas_udf L2 norm (one Arrow batch per call, numpy inside)
    must agree with the codegen'd aggregate-expression norm to float
    tolerance — the demo that the vectorized Python escape hatch and
    the JVM path compute the same math. The native expression remains
    the hot path (see sim_vector_norms)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.queries.similarity_ops import (
        sim_vector_norms,
    )

    # NB: explicit signature, not type hints — `from __future__ import
    # annotations` stringifies hints and pandas_udf can't resolve them
    def _l2(emb):
        return emb.map(
            lambda v: float(np.sqrt(np.sum(np.asarray(v, dtype=np.float64) ** 2)))
        )

    l2_py = pandas_udf(_l2, "double")
    assert pd is not None  # imported for the Arrow batch contract

    e = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        r["vec_id"]: r["n"]
        for r in e.select("vec_id", l2_py("embedding").alias("n")).collect()
    }
    want = {
        r["vec_id"]: r["l2_norm"] for r in sim_vector_norms(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-6 * (1 + abs(want[k])) for k in want)


def test_sql_text_surface_matches_dataframe(spark):
    """spark.sql() over the registered views must return exactly the
    DataFrame query's rows — one declarative surface, two syntaxes."""
    from irs_990_efiler_database_spark.catalog import register_views
    from irs_990_efiler_database_spark.queries.tpch import q6_forecast_revenue

    register_views(spark, SF_SMOKE)
    via_sql = spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    ).collect()
    via_df = q6_forecast_revenue(spark, SF_SMOKE).collect()
    assert via_sql == via_df


def test_sql_pipe_syntax_matches_dataframe(spark):
    """Spark 4 SQL pipe syntax (|> operators) is part of the SQL-text
    surface: the piped form of a filter+aggregate must match the
    DataFrame plan's result exactly."""
    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    load_table(spark, sf, "orders").createOrReplaceTempView("_pipe_orders")
    piped = spark.sql(
        """
        FROM _pipe_orders
        |> WHERE o_orderpriority = '1-URGENT'
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           GROUP BY o_orderstatus
        |> ORDER BY o_orderstatus
        """
    ).collect()
    df = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    assert [tuple(r) for r in piped] == [tuple(r) for r in df]


def test_arrow_optimized_python_udf_matches_native(spark):
    """Spark 4 Arrow-optimized Python UDFs (useArrow=True): same
    per-row semantics as a classic pickled UDF but Arrow-serialized
    batches — must agree exactly with the native expression twin."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from irs_990_efiler_database_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"

    @F.udf(returnType=LongType(), useArrow=True)
    def clipped_cents(price: float) -> int:
        # floor, not round: Python rounds half-even, Spark half-up
        import math

        return min(math.floor(price * 100), 10_000_000)

    o = load_table(spark, sf, "orders")
    got = o.select(
        "o_orderkey", clipped_cents("o_totalprice").alias("cents")
    )
    want = o.select(
        "o_orderkey",
        F.least(
            F.floor(F.col("o_totalprice") * 100).cast("long"),
            F.lit(10_000_000).cast("long"),
        ).alias("cents"),
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_parameterized_sql_matches_literal(spark):
    """Spark 4 parameterized SQL (named args): the bound form must
    plan and return identically to the literal query — the
    injection-safe surface for templated analytics."""
    from irs_990_efiler_database_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    load_table(spark, sf, "orders").createOrReplaceTempView("_param_orders")
    bound = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM _param_orders
        WHERE o_totalprice > :floor AND o_orderpriority = :prio
        GROUP BY o_orderstatus
        """,
        args={"floor": 50_000.0, "prio": "1-URGENT"},
    ).collect()
    literal = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM _param_orders
        WHERE o_totalprice > 50000.0 AND o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        """
    ).collect()
    assert sorted(map(tuple, bound)) == sorted(map(tuple, literal))
    assert bound, "filter should match some rows"


def test_map_in_arrow_matches_map_in_pandas_kernel(spark):
    """``mapInArrow`` (RecordBatch in/out, zero pandas materialization)
    must reproduce the mapInPandas byte-histogram kernel bit-exactly —
    offsets/data-buffer math on the BinaryArray instead of Python
    bytes objects. Measured A/B at sf0.1 (BENCH_NOTES round 10): no
    win at either payload shape on this box, so the pandas kernel
    stays the shipped path; this pins the Arrow-native escape hatch's
    correctness (the shape that matters when a kernel wants
    Arrow-only zero-copy, e.g. tensors over the wire)."""
    import pyarrow as pa

    from irs_990_efiler_database_spark.catalog import load_table
    from irs_990_efiler_database_spark.operators.multimodal import (
        _HIST_ROWS_SCHEMA,
        byte_histogram_rows,
        synthetic_media,
    )

    BINS = 16

    def batches(it):
        import numpy as np

        shift = 8 - BINS.bit_length() + 1
        for batch in it:
            arr = batch.column("payload")
            ids_all = batch.column("media_id").to_numpy(zero_copy_only=False)
            if len(arr) == 0:
                continue
            off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
            offsets = np.frombuffer(off_buf, dtype=np.int32)[
                arr.offset : arr.offset + len(arr) + 1
            ].astype(np.int64)
            data = np.frombuffer(data_buf, dtype=np.uint8)
            lens = offsets[1:] - offsets[:-1]
            row_idx = np.repeat(np.arange(len(arr)), lens)
            allb = data[offsets[0] : offsets[-1]]
            keys = row_idx * BINS + (allb >> shift)
            hist = np.bincount(keys, minlength=len(arr) * BINS).reshape(
                len(arr), BINS
            )
            rows_i, bins_i = np.nonzero(hist)
            cnts = hist[rows_i, bins_i]
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids_all[rows_i], pa.int64()),
                    "bin": pa.array(bins_i.astype(np.int32), pa.int32()),
                    "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
                    "weight": pa.array(cnts / lens[rows_i], pa.float64()),
                }
            )

    media = synthetic_media(load_table(spark, SF_SMOKE, "documents"))
    got = {
        tuple(r)
        for r in media.select("media_id", "payload")
        .mapInArrow(batches, _HIST_ROWS_SCHEMA)
        .collect()
    }
    want = {tuple(r) for r in byte_histogram_rows(media).collect()}
    assert got == want and got


def test_apply_in_arrow_grouped_matches_native_agg(spark):
    """``groupBy().applyInArrow`` (grouped-map, one pyarrow.Table per
    group) must agree with the codegen'd groupBy aggregate — the
    Arrow-native twin of the applyInPandas grouped-map surface. Exact
    integer math (int64 cents) so the comparison is equality, not
    tolerance."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql import functions as F

    from irs_990_efiler_database_spark.catalog import load_table

    def per_group(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": tbl.column("l_returnflag").slice(0, 1),
                "n": pa.array([tbl.num_rows], pa.int64()),
                "qty_sum": pa.array(
                    [pc.sum(tbl.column("qty_cents")).as_py()], pa.int64()
                ),
            }
        )

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_cents"),
    )
    got = {
        tuple(r)
        for r in li.groupBy("l_returnflag")
        .applyInArrow(
            per_group, "l_returnflag STRING, n LONG, qty_sum LONG"
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qty_cents").alias("qty_sum"),
        )
        .collect()
    }
    assert got == want and got
