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
