"""Relational operator surface (SURVEY.md §2.3–§2.7).

The reference implements no joins/windows/set-ops itself (SURVEY §2.3,
§2.5) — it denormalizes keys so users can join downstream. The engine
exposes the full Spark surface; every operator family here is pinned by a
DuckDB oracle.

Join strategy notes for 100 TB: dims (region/nation/supplier, filtered
customer) are broadcast; fact⋈fact joins shuffle on the join key and are
AQE-managed (skew split + partition coalescing). Window queries shuffle
once on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

# ---------------------------------------------------------------- joins


@register(
    "join_left_order_fill_counts",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(l.l_orderkey) AS n_big_items,
           CAST(COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 0) AS DOUBLE) AS big_qty
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    WHERE o.o_totalprice > 100000
    GROUP BY o.o_orderkey
    """,
)
def join_left_order_fill_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched orders (count = 0)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, l.l_orderkey == o.o_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_big_items"),
            F.coalesce(F.sum(F.col("l_quantity").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("big_qty"),
        )
    )


@register(
    "join_right_lineitem_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, COUNT(l.l_orderkey) AS n_items
    FROM lineitem l
    RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def join_right_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (all urgent orders kept, even with no R items)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_returnflag == "R"), "right")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


@register(
    "join_full_outer_balance",
    oracle="""
    SELECT
      COALESCE(c.c_custkey, o.o_custkey) AS custkey,
      CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS has_debt,
      COUNT(o.o_orderkey) AS n_big_orders
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal < 0) c
    FULL JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 350000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY COALESCE(c.c_custkey, o.o_custkey),
             CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END
    """,
)
def join_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two filtered key sets."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000).select(
        "o_custkey", "o_orderkey"
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full")
    return (
        j.select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.when(F.col("c_custkey").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("has_debt"),
            F.col("o_orderkey"),
        )
        .groupBy("custkey", "has_debt")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@register(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS (reference's `%in%` predicate,
    build_efile_database_functions.R:4958)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS src, b.r_name AS dst
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (tiny-dim only; nested-loop territory)."""
    a = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("ak"), F.col("r_name").alias("src")
    )
    b = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("bk"), F.col("r_name").alias("dst")
    )
    return a.crossJoin(b).filter(F.col("ak") != F.col("bk")).select("src", "dst")


@register(
    "join_range_price_band",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts
    FROM part p
    JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0), ('high', 1500.0, 100000.0))
         AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (broadcast nested loop against a tiny band table)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 1000.0), ("mid", 1000.0, 1500.0), ("high", 1500.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# -------------------------------------------------------------- windows


@register(
    "win_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def win_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key dedup (SURVEY §2.5: latest filing per EIN-year)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
        )
    )


@register(
    "win_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def win_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — days since the customer's previous order (panel spells)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("gap_days"),
    )


@register(
    "win_running_supplier_qty",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 10
    """,
)
def win_running_supplier_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame over a total order
    (decimal accumulation so the prefix sums are exact)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").alias("running_qty"),
    )


@register(
    "win_top3_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rk
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part
    ) WHERE rk <= 3
    """,
)
def win_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@register(
    "win_lead_next_ship",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           strftime(LEAD(l_shipdate) OVER (PARTITION BY l_orderkey
                                           ORDER BY l_shipdate, l_linenumber),
                    '%Y-%m-%d') AS next_ship
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def win_lead_next_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() over an intra-order ship sequence."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = Window.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format(F.lead("l_shipdate").over(w), "yyyy-MM-dd").alias("next_ship"),
    )


# --------------------------------------------------------- aggregations


@register(
    "agg_cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )


@register(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_pivot_status_by_year",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 1995) AS y1995,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 1996) AS y1996,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 1997) AS y1997,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 1998) AS y1998,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 1999) AS y1999,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 2000) AS y2000,
           COUNT(*) FILTER (WHERE year(o_orderdate) = 2001) AS y2001
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab (reference's FormType × TaxYear validation query,
    README.md:77-82 → groupBy().pivot().count())."""
    o = load_table(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    years = list(range(1995, 2002))
    piv = o.groupBy("o_orderstatus").pivot("yr", years).count()
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(str(y)), F.lit(0)).cast("long").alias(f"y{y}") for y in years
    ]
    return piv.select(*cols)


@register(
    "agg_count_distinct_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_freq_of_freq",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    GROUP BY n_orders
    """,
)
def agg_freq_of_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequency (reference's table(table(EIN)) panel-spell
    distribution, Build-Efiler-Index.md:125-135)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "agg_having_frequent_customers",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 15
    """,
)
def agg_having_frequent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped filter on an aggregate (reference: orgs with >6 filings,
    Build-Efiler-Index.md:131-135)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


# --------------------------------------------------------------- set ops


@register(
    "setop_union_all",
    oracle="""
    SELECT o_custkey, year(o_orderdate)::BIGINT AS yr FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_custkey, year(o_orderdate)::BIGINT AS yr FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate").cast("long"))
    a = o.filter(F.col("yr") == 1995).select("o_custkey", "yr")
    b = o.filter(F.col("yr") == 1996).select("o_custkey", "yr")
    return a.union(b)


@register(
    "setop_intersect_repeat_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "setop_except_lapsed_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def setop_except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)


@register(
    "setop_union_by_name_ragged",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS custkey, c_acctbal AS acctbal, NULL::VARCHAR AS priority
      FROM customer WHERE c_custkey <= 100
      UNION ALL BY NAME
      SELECT o_custkey AS custkey, o_orderpriority AS priority
      FROM orders WHERE o_orderkey <= 500
    )
    """,
)
def setop_union_by_name_ragged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ragged union-by-name with NULL fill — the reference's bind_rows
    semantics (build_efile_database_functions.R:5109-5122)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderpriority").alias("priority"))
    )
    return c.unionByName(o, allowMissingColumns=True)


@register(
    "setop_distinct_pairs",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
)
def setop_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (reference's unique(index), :75)."""
    return load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus").distinct()


# ------------------------------------------------------- sorts / limits


@register(
    "sort_topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject, no full sort at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(F.asc("s_nationkey"), F.desc("s_acctbal"), F.asc("s_suppkey"))
    )


@register(
    "agg_salted_skew_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: lineitem price totals per returnflag — a
    3-value group domain that a direct groupBy would land on 3
    reducers at any cluster size. The salted two-stage plan spreads
    each hot key over 16 reducers first; decimal partials make the
    regrouped result bit-identical to the direct plan (the oracle IS
    the direct plan)."""
    from ..operators.skew import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li,
        keys=["l_returnflag"],
        value=F.col("l_extendedprice").cast("decimal(18,2)"),
        salt_on="l_orderkey",
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_value").cast("double").alias("sum_price"),
        "n",
    )


@register(
    "agg_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: exact discrete percentiles (the SQL
    standard's smallest-value-with-cume_dist>=p). percentile_disc
    RETURNS an existing data value — no interpolation arithmetic — so
    the result is engine-portable and, unlike percentile_approx,
    deterministic. Scale: one shuffle on the group key; Spark computes
    order statistics per group without a global sort."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@register(
    "agg_variance_exact",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ), moments AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(c) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(c * c) AS DECIMAL(38,0)) AS s2
      FROM cents
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           CAST(s1 AS DOUBLE) / n / 100.0 AS mean_price,
           CAST(n * s2 - s1 * s1 AS DOUBLE) / n / (n - 1) / 10000.0
             AS var_price,
           sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / n / (n - 1) / 10000.0)
             AS stddev_price
    FROM moments
    """,
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free variance/stddev: built-in stddev accumulates doubles
    in partition-arrival order (non-deterministic across runs at
    scale), so this computes the exact integer-cents moments
    (n, Σc, Σc²) with decimal accumulation — associative, partial-agg
    friendly, identical on any partitioning — and derives
    mean/var/stddev in one final double projection per group."""
    o = load_table(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    m = o.select("o_orderpriority", c.alias("c")).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c")).cast("decimal(38,0)").alias("s1"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("s2"),
    )
    num = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    var = num / F.col("n") / (F.col("n") - 1) / F.lit(10000.0)
    return m.select(
        "o_orderpriority",
        "n",
        (F.col("s1").cast("double") / F.col("n") / F.lit(100.0)).alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
    )


@register(
    "win_rank_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-window family in one query: ntile,
    percent_rank, cume_dist, rank, dense_rank — deterministic total
    order (price, then key) so both engines rank identically; the
    rank ratios are single double divisions, rounded once."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "win_scd2_order_history",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           coalesce(strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d'),
                    '9999-12-31') AS valid_to,
           CASE WHEN LEAD(o_orderkey) OVER w IS NULL
                THEN TRUE ELSE FALSE END AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) versioning: each customer's
    order stream becomes validity intervals — valid_from = the row's
    date, valid_to = the next row's date (sentinel 9999-12-31 on the
    open row), is_current on the newest. The same lead()-over-key
    pattern versions amended 990 filings per (ein, tax period) in the
    index pipeline; here it runs on orders so the oracle can replay it.
    One shuffle on the partition key; ties broken by the unique order
    key so both engines pick identical successors."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd"),
            F.lit("9999-12-31"),
        ).alias("valid_to"),
        F.lead("o_orderkey").over(w).isNull().alias("is_current"),
    )


@register(
    "win_rolling_7d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey
                ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
                RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_7d
    FROM orders
    WHERE o_custkey < 300
    """,
)
def win_rolling_7d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-customer trailing-7-day spend —
    the frame is a VALUE range over epoch seconds (604800 preceding),
    not a row count, so unevenly spaced orders aggregate correctly.
    Decimal accumulation; ties inside the same second share a frame on
    both engines by definition of RANGE."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
    )


@register(
    "win_zscore_order_value",
    oracle="""
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS s1,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS s2
      FROM orders
      WHERE o_custkey < 300
      WINDOW w AS (PARTITION BY o_custkey)
    )
    SELECT o_custkey, o_orderkey,
           round((o_totalprice - s1 / n)
                 / nullif(sqrt((s2 - s1 * s1 / n) / (n - 1)), 0.0), 6)
             AS zscore
    FROM s WHERE n >= 2
    """,
)
def win_zscore_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier scoring: each order's z-score against its
    customer's own distribution. Moments accumulate as exact decimals
    over an unordered partition window (order-free, so the hash is
    stable under any shuffle order) and only the final mean/std/score
    arithmetic runs in doubles — the same exactness discipline as
    agg_variance_exact, per row instead of per group. Rounded once at
    emission; zero-variance groups yield NULL via nullif."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dec).over(w).cast("double").alias("s1"),
        F.sum(dec * dec).over(w).cast("double").alias("s2"),
    ).filter(F.col("n") >= 2)
    std = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    return s.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            (F.col("o_totalprice") - F.col("s1") / F.col("n"))
            / F.nullif(std, F.lit(0.0)),
            6,
        ).alias("zscore"),
    )


@register(
    "agg_kanon_release",
    oracle="""
    WITH g AS (
      SELECT n.n_name, c.c_mktsegment, COUNT(*) AS n_customers,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_balance
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, c_mktsegment,
           CASE WHEN n_customers >= 5 THEN n_customers END AS n_customers,
           CASE WHEN n_customers >= 5 THEN total_balance END AS total_balance,
           n_customers < 5 AS suppressed
    FROM g
    """,
)
def agg_kanon_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymous aggregate release (k=5): cells of the
    (nation, segment) contingency table smaller than k are suppressed
    (values nulled, flag kept) before publication — the standard
    small-cell suppression rule for releasing aggregates over
    sensitive microdata, as a post-aggregation projection that costs
    nothing extra at scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_balance"),
        )
    )
    ok = F.col("n_customers") >= 5
    return g.select(
        "n_name",
        "c_mktsegment",
        F.when(ok, F.col("n_customers")).alias("n_customers"),
        F.when(ok, F.col("total_balance")).alias("total_balance"),
        (~ok).alias("suppressed"),
    )


@register(
    "join_null_safe_segment",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
      FROM customer
    ),
    d AS (SELECT DISTINCT seg FROM c)
    SELECT d.seg, COUNT(*) AS n_customers
    FROM c JOIN d ON c.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.seg
    """,
)
def join_null_safe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (<=> / IS NOT DISTINCT FROM): a plain
    equi-join silently drops the NULL-segment rows; the null-safe
    operator keeps them as a real join group. Spark hashes <=> keys
    like ordinary keys, so the plan is still a hash join — the
    semantics change, the shuffle shape does not."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    d = c.select("seg").distinct().withColumnRenamed("seg", "d_seg")
    return (
        c.join(d, F.col("seg").eqNullSafe(F.col("d_seg")))
        .groupBy(F.col("d_seg").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
)


@register(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
            COUNT(*) - COUNT({c}) AS n_null,
            COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator (the 'column statistics' pass every
    warehouse/catalog runs): per-column row count, null count, and
    exact distinct count over orders, in ONE scan. The multi-column
    distinct aggregation plans as a single Expand (k× row replication
    map-side, combined before the shuffle) — one pass over the table
    instead of k separate COUNT(DISTINCT) scans; the result is k tiny
    rows unpivoted driver-free via stack()."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__null`, `{c}__dist`" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_rows, n_null, n_distinct)"
    )


@register(
    "cdc_apply_latest",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, 0 AS seq, 'I' AS op, o_totalprice AS price
      FROM orders
    ),
    changes AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
             o_totalprice + 100 AS price
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey AS k, 2 AS seq, 'D' AS op,
             CAST(NULL AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    log AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
    latest AS (
      SELECT k, seq, op, price,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT k AS o_orderkey, CAST(seq AS BIGINT) AS version, price
    FROM latest
    WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply (the Debezium-feed / MERGE INTO
    semantics): a base snapshot plus an I/U/D change log with sequence
    numbers collapses to the final state — highest sequence per key
    wins, deletes drop the row. One shuffle on the key (the ranking
    window); at scale this is the standing batch-merge that keeps a
    lakehouse table current from a CDC stream, and composes with
    ``sinks.upsert_partitions`` for the physical write. The change log
    here is synthesized deterministically from orders in BOTH
    engines (every even key updated, every 10th then deleted)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
    )
    upd = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + 100).alias("price"),
    )
    dele = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    log = base.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("seq").cast("long").alias("version"),
            "price",
        )
    )


@register(
    "scd2_as_of_snapshot",
    oracle="""
    WITH hist AS (
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
             coalesce(strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d'),
                      '9999-12-31') AS valid_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, valid_from, valid_to
    FROM hist
    WHERE valid_from <= '1995-06-01' AND valid_to > '1995-06-01'
    """,
)
def scd2_as_of_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF date) query against the SCD2 history: the
    state of every customer's dimension on 1995-06-01 — the interval
    containing the date, at most one row per key by construction. The
    half-open [valid_from, valid_to) convention makes the predicate a
    pair of string comparisons the scan can push down; at scale this
    is the standard bitemporal snapshot read over an SCD2 table."""
    hist = win_scd2_order_history(spark, sf_dir)
    as_of = "1995-06-01"
    return hist.filter(
        (F.col("valid_from") <= as_of) & (F.col("valid_to") > as_of)
    ).select("o_custkey", "o_orderkey", "valid_from", "valid_to")


@register(
    "audit_fk_orphans",
    oracle="""
    SELECT 'orders->customer' AS relation,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    """,
)
def audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the cross-table counterpart of the
    single-table data-quality gate (`jobs.validate_database`): orphan
    counts for three FK relations, each an anti-join (left-anti hash
    join; the parent side broadcasts when small, AQE decides). The
    shape every warehouse ingest check runs nightly; at 100 TB each
    relation is one shuffle (or broadcast) keyed on the FK."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def rel(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        # fully lazy: total and orphan counts are two 1-row aggregates
        # composed with a (1x1) cross join — nothing lands on the driver
        total = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orphans = child.join(
            parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relation"), "n_child", "n_orphans"
        )

    return (
        rel("orders->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(rel("lineitem->orders", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(rel("lineitem->part", li, "l_partkey", p, "p_partkey"))
    )


@register(
    "agg_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.5)
                  AS DOUBLE) AS med_price
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority,
             CAST(abs(CAST(o.o_totalprice AS DECIMAL(18,2))
                      - CAST(m.med_price AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS adev,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
             m.med_price
      FROM orders o JOIN med m USING (o_orderpriority)
    ),
    mad AS (
      SELECT o_orderpriority,
             CAST(quantile_disc(adev, 0.5) AS DOUBLE) AS mad_price
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           m2.mad_price,
           CAST(COUNT(*) FILTER (
             WHERE CAST(abs(d.price - CAST(d.med_price AS DECIMAL(18,2)))
                        AS DOUBLE) > 5 * m2.mad_price) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m2 USING (o_orderpriority)
    GROUP BY d.o_orderpriority, m2.mad_price
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    rank-statistic alternative to the z-score operator (means/stddevs
    are themselves dragged by the outliers they hunt): per group,
    median price → absolute deviations → the MAD is their median →
    flag rows beyond 5×MAD. Two exact ordered-statistic passes
    (percentile_disc on DECIMAL — discrete, so no interpolation
    arithmetic to diverge) sharing the group partitioning, then one
    counting pass; deviations stay DECIMAL until the final compare."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    disc_median = (
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY {c}) AS DOUBLE)"
    )
    med = o.groupBy("o_orderpriority").agg(
        F.expr(disc_median.format(c="price")).alias("med_price")
    )
    dev = o.join(med, "o_orderpriority").select(
        "o_orderpriority",
        "price",
        "med_price",
        F.abs(
            F.col("price") - F.col("med_price").cast("decimal(18,2)")
        ).cast("decimal(18,2)").alias("adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr(disc_median.format(c="adev")).alias("mad_price")
    )
    return (
        dev.join(mad, "o_orderpriority")
        .groupBy("o_orderpriority", "mad_price")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    F.abs(
                        F.col("price") - F.col("med_price").cast("decimal(18,2)")
                    ).cast("double")
                    > 5 * F.col("mad_price")
                ).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select("o_orderpriority", "n", "mad_price", "n_outliers")
    )


@register(
    "agg_hhi_concentration",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority, o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DECIMAL(38,0)) AS s
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(s * s) AS DECIMAL(38,0)) AS sum_sq,
             CAST(SUM(s) AS DECIMAL(38,0)) AS total
      FROM cents GROUP BY 1
    )
    SELECT o_orderpriority, n_customers,
           CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE)
                                     * CAST(total AS DOUBLE)) AS hhi
    FROM m
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration index (Herfindahl–Hirschman): per order
    priority, the sum of squared customer revenue shares — 1/n for a
    perfectly even market, →1 for a monopoly. Revenue moves as integer
    cents and the squared sums as DECIMAL(38,0) (exact, order-free);
    the index itself is a ratio of two doubles derived from those
    exact integers — the same compute-exact-divide-once discipline as
    the variance and OLS operators."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    cents = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.sum("c").cast("decimal(38,0)").alias("s")
    )
    m = cents.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.col("s") * F.col("s")).cast("decimal(38,0)").alias("sum_sq"),
        F.sum("s").cast("decimal(38,0)").alias("total"),
    )
    return m.select(
        "o_orderpriority",
        "n_customers",
        (
            F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("hhi"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ),
    bounds AS (
      SELECT o_orderpriority,
             quantile_disc(price, 0.05) AS lo,
             quantile_disc(price, 0.95) AS hi
      FROM b GROUP BY o_orderpriority
    )
    SELECT b.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(bounds.lo AS DOUBLE) AS DOUBLE) AS p05,
           CAST(CAST(bounds.hi AS DOUBLE) AS DOUBLE) AS p95,
           CAST(SUM(CAST(greatest(bounds.lo, least(bounds.hi, b.price))
                         AS DECIMAL(18,2)))
                AS DOUBLE) / COUNT(*) AS winsorized_mean
    FROM b JOIN bounds USING (o_orderpriority)
    GROUP BY b.o_orderpriority, bounds.lo, bounds.hi
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (clip at p05/p95, then average) — the robust
    central-tendency estimate that keeps sample size, unlike trimming.
    Exact discrete percentiles (percentile_disc on DECIMAL — values
    from the data, no interpolation) bound the clip; clipped values
    stay DECIMAL through the sum so the mean is one double division.
    Two passes sharing the group partitioning."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    disc = "percentile_disc({p}) WITHIN GROUP (ORDER BY price)"
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr(disc.format(p=0.05)).alias("lo"),
        F.expr(disc.format(p=0.95)).alias("hi"),
    )
    j = o.join(bounds, "o_orderpriority")
    # Spark's percentile_disc emits DOUBLE even over DECIMAL input;
    # cast the (exact data-value) bounds back so the clipped sum stays
    # DECIMAL — a double sum is shuffle-order-dependent
    lo = F.col("lo").cast("decimal(18,2)")
    hi = F.col("hi").cast("decimal(18,2)")
    clipped = F.greatest(lo, F.least(hi, F.col("price")))
    return (
        j.groupBy("o_orderpriority", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(clipped).cast("double") / F.count(F.lit(1))).alias(
                "winsorized_mean"
            ),
        )
        .select(
            "o_orderpriority",
            "n",
            F.col("lo").cast("double").alias("p05"),
            F.col("hi").cast("double").alias("p95"),
            "winsorized_mean",
        )
    )


@register(
    "agg_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT obs.digit,
           CAST(obs.n AS BIGINT) AS n,
           CAST(obs.n AS DOUBLE) / tot.total AS observed_p,
           round(log10(1.0 + 1.0 / obs.digit), 9) AS benford_p
    FROM obs, tot
    """,
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen — the forensic-accounting test
    auditors run over reported amounts (fabricated figures drift from
    the log distribution; the 990 literature applies exactly this to
    nonprofit finances). First digits extract as integer string heads
    of the cent amounts (no float log in the hot path), one tiny
    grouped count, and the observed share is a single
    integer-over-integer division against the closed-form Benford
    probability."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("observed_p"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 9).alias("benford_p"),
    )


@register(
    "reshape_melt_lineitem_measures",
    oracle="""
    WITH m AS (
      SELECT 'quantity' AS measure,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM lineitem
      UNION ALL
      SELECT 'extendedprice',
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'discount',
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'tax',
             CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE),
             COUNT(*)
      FROM lineitem
    )
    SELECT measure, total, CAST(n AS BIGINT) AS n FROM m
    """,
)
def reshape_melt_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via the OFFICIAL DataFrame.unpivot (melt)
    API — four measure columns become (measure, value) rows in ONE
    Expand pass over one scan (the oracle's four-scan UNION ALL is the
    shape unpivot exists to avoid), then a per-measure decimal total.
    The reference does this with reshape2::melt on collected frames."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.col("l_quantity").cast("decimal(18,2)").alias("quantity"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("discount"),
        F.col("l_tax").cast("decimal(18,2)").alias("tax"),
    ).unpivot(
        [],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.sum("value").cast("double").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "scalar_collation_compare",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(CASE WHEN lower(p_type) = lower(upper(p_type))
                      THEN 1 END) AS BIGINT) AS ci_equal,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM part
    GROUP BY p_brand
    """,
)
def scalar_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): equality of a
    string against its uppercased form under the case-insensitive
    UTF8_LCASE collation — the engine-level way to get CI semantics
    without wrapping every predicate in lower() (the comparison stays
    a binary string equality under the collated type, so it remains
    codegen- and pushdown-friendly). The oracle expresses the same
    predicate with lower() on both sides."""
    p = load_table(spark, sf_dir, "part")
    ci_eq = F.collate(F.col("p_type"), "UTF8_LCASE") == F.collate(
        F.upper("p_type"), "UTF8_LCASE"
    )
    return p.groupBy("p_brand").agg(
        F.count(F.when(ci_eq, 1)).cast("long").alias("ci_equal"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "audit_table_diff",
    oracle="""
    WITH left_t AS (
      SELECT doc_id, md5(text) AS fp FROM documents
    ),
    right_t AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id < 10 THEN text || ' [rev2]'
                 ELSE text END) AS fp
      FROM documents WHERE doc_id < 490
      UNION ALL
      SELECT doc_id + 1000000, md5('new doc ' || CAST(doc_id AS VARCHAR))
      FROM documents WHERE doc_id < 5
    )
    SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
           CASE WHEN l.doc_id IS NULL THEN 'added'
                WHEN r.doc_id IS NULL THEN 'removed'
                WHEN l.fp <> r.fp THEN 'changed'
                ELSE 'identical' END AS status
    FROM left_t l FULL OUTER JOIN right_t r ON l.doc_id = r.doc_id
    WHERE NOT (l.doc_id IS NOT NULL AND r.doc_id IS NOT NULL
               AND l.fp = r.fp)
    """,
)
def audit_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (anti-entropy diff): compare two table
    versions by key + content fingerprint and report only the delta
    rows (added / removed / changed), the audit a lakehouse runs
    before/after a migration or replication. The 'new' version is
    derived deterministically in both engines (10 docs edited, 10
    dropped from the tail, 5 added).

    Scale shape: each side reduces to (key, 16-byte md5) BEFORE the
    full-outer join — content never shuffles — and identical rows are
    filtered out so the output is delta-sized, not table-sized."""
    d = load_table(spark, sf_dir, "documents")
    left = d.select("doc_id", F.md5("text").alias("fp"))
    right = (
        d.filter(F.col("doc_id") < 490)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") < 10,
                    F.concat(F.col("text"), F.lit(" [rev2]")),
                ).otherwise(F.col("text"))
            ).alias("fp"),
        )
        .unionByName(
            d.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.md5(
                    F.concat(
                        F.lit("new doc "), F.col("doc_id").cast("string")
                    )
                ).alias("fp"),
            )
        )
    )
    l = left.select(
        F.col("doc_id").alias("l_id"), F.col("fp").alias("l_fp")
    )
    r = right.select(
        F.col("doc_id").alias("r_id"), F.col("fp").alias("r_fp")
    )
    joined = l.join(r, l.l_id == r.r_id, "full_outer")
    status = (
        F.when(F.col("l_id").isNull(), F.lit("added"))
        .when(F.col("r_id").isNull(), F.lit("removed"))
        .when(F.col("l_fp") != F.col("r_fp"), F.lit("changed"))
        .otherwise(F.lit("identical"))
    )
    return (
        joined.select(
            F.coalesce("l_id", "r_id").alias("doc_id"),
            status.alias("status"),
        )
        .filter(F.col("status") != "identical")
    )


@register(
    "ivm_join_delta_maintenance",
    oracle="""
    WITH d_o AS (SELECT * FROM orders WHERE o_orderkey % 97 = 0),
    old_o AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
    d_c AS (SELECT * FROM customer WHERE c_custkey % 89 = 0),
    old_c AS (SELECT * FROM customer WHERE c_custkey % 89 <> 0)
    SELECT o.o_orderkey, c.c_custkey, 'dA_B' AS src
    FROM d_o o JOIN old_c c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT o.o_orderkey, c.c_custkey, 'A_dB'
    FROM old_o o JOIN d_c c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT o.o_orderkey, c.c_custkey, 'dA_dB'
    FROM d_o o JOIN d_c c ON o.o_custkey = c.c_custkey
    """,
)
def ivm_join_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a join view: with insert
    deltas dA (orders) and dB (customers), the view delta is exactly
    dA⋈B ∪ A⋈dB ∪ dA⋈dB — three joins whose inputs are sized by the
    BATCH, not the standing tables (only the two mixed legs touch a
    full side, each pruned by the delta's key set at 100 TB via a
    runtime/bloom filter). Each output row is tagged with the leg that
    produced it, so the maintenance algebra itself sits under the
    hash gate — appending these rows to the stored view equals a full
    recompute, without one."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d_o = o.filter(F.col("o_orderkey") % 97 == 0)
    old_o = o.filter(F.col("o_orderkey") % 97 != 0)
    d_c = c.filter(F.col("c_custkey") % 89 == 0)
    old_c = c.filter(F.col("c_custkey") % 89 != 0)

    def leg(left, right, tag):
        return left.join(
            right, left.o_custkey == right.c_custkey
        ).select(
            "o_orderkey", "c_custkey", F.lit(tag).alias("src")
        )

    return (
        leg(d_o, old_c, "dA_B")
        .unionByName(leg(old_o, d_c, "A_dB"))
        .unionByName(leg(d_o, d_c, "dA_dB"))
    )


@register(
    "dq_expectation_suite",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             COUNT(DISTINCT o_orderkey) AS dk,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
             SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                 THEN 1 ELSE 0 END) AS bad_status,
             SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price
      FROM orders
    )
    SELECT 'unique_order_key' AS rule, CAST(n - dk AS BIGINT) AS violations
    FROM m
    UNION ALL
    SELECT 'custkey_not_null', CAST(null_cust AS BIGINT) FROM m
    UNION ALL
    SELECT 'status_accepted_values', CAST(bad_status AS BIGINT) FROM m
    UNION ALL
    SELECT 'price_positive', CAST(bad_price AS BIGINT) FROM m
    """,
)
def dq_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the dbt-tests /
    great-expectations shape) evaluated in ONE scan: key uniqueness
    (count minus distinct), not-null, accepted values, and a range
    rule all fold into a single aggregation row that unpivots to
    (rule, violations) — adding an expectation adds a column, never a
    scan. Zero violations on conforming data is itself the assertion;
    at 100 TB this is the cheap gate that runs before every
    publish."""
    o = load_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("dk"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("bad_status"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
    )
    rules = m.select(
        F.expr(
            """stack(4,
              'unique_order_key', CAST(n - dk AS BIGINT),
              'custkey_not_null', CAST(null_cust AS BIGINT),
              'status_accepted_values', CAST(bad_status AS BIGINT),
              'price_positive', CAST(bad_price AS BIGINT)
            ) AS (rule, violations)"""
        )
    )
    return rules


@register(
    "agg_argmax_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
             AS n_large,
           BOOL_OR(o_orderstatus = 'P') AS any_pending,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           arg_max(o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
                   + o_orderkey) AS priciest_order,
           arg_min(o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
                   + o_orderkey) AS cheapest_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_argmax_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern aggregate family: count_if (filtered count),
    bool_or/bool_and (any/every), and max_by/min_by (argmax/argmin).
    Argmax ordering is the composite integer cents*1e10 + orderkey —
    ties on price resolve by key, so the picked row is deterministic
    across engines and partitionings (a bare max_by on a tied value
    is not). The packed-long composite holds to ~sf100 key ranges; a
    struct ordering would lift that limit on the Spark side."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    key = cents * F.lit(10_000_000_000) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_large"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.max_by("o_orderkey", key).alias("priciest_order"),
        F.min_by("o_orderkey", key).alias("cheapest_order"),
    )


@register(
    "profile_column_entropy",
    oracle="""
    WITH m AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    cnt AS (SELECT col, v, COUNT(*) AS c FROM m GROUP BY 1, 2),
    tot AS (SELECT col, SUM(c) AS n FROM cnt GROUP BY 1),
    terms AS (
      SELECT cnt.col,
             CAST(round(-(CAST(c AS DOUBLE) / n)
                        * ln(CAST(c AS DOUBLE) / n), 9)
                  AS DECIMAL(24,12)) AS h,
             c
      FROM cnt JOIN tot USING (col)
    )
    SELECT col,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(h) AS DOUBLE) AS entropy_nats
    FROM terms GROUP BY col
    """,
)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-entropy profiling: Shannon entropy of each categorical
    column's value distribution in one unpivoted pass — the
    dictionary-encodability / partition-key-quality signal a storage
    layout pass reads (near-zero entropy -> great RLE candidate; high
    entropy -> poor partition key). Per-value -p ln p terms round to
    9 dp then decimal-accumulate; the stack() unpivot keeps it one
    scan for any number of profiled columns."""
    o = load_table(spark, sf_dir, "orders")
    m = o.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority) AS (col, v)"
        )
    )
    cnt = m.groupBy("col", "v").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("col").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    h = F.round(-p * F.log(p), 9).cast("decimal(24,12)")
    return (
        cnt.join(tot, "col")
        .select("col", h.alias("h"))
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum("h").cast("double").alias("entropy_nats"),
        )
    )


@register(
    "setop_intersect_all_multiset",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: each nation key appears min(customer
    copies, supplier copies) times — the bag semantics DISTINCT-based
    intersect discards (needed when multiplicity IS the signal, e.g.
    per-copy entitlement reconciliation). Spark plans intersectAll as
    a count-compare aggregation, not a pairwise join."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    WHERE c.c_custkey < 30
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: each customer's two priciest orders
    via a per-row correlated subquery — the SQL-standard spelling of
    grouped top-k. Catalyst decorrelates this into the same
    window-rank plan the DataFrame form produces; registering the
    LATERAL spelling proves the decorrelation path under the hash
    gate."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_lat_orders"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM _lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_custkey < 30
        """
    )


@register(
    "agg_weighted_avg_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * CAST(l_quantity AS HUGEINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS HUGEINT)) AS DOUBLE) / 100
             AS qty_weighted_avg_price,
           CAST(SUM(CAST(l_quantity AS HUGEINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted average (price weighted by quantity): both the
    weighted numerator and the weight total accumulate as wide
    integers, so the distributed result is ONE double division —
    unlike a double-weighted avg whose partial sums drift with shuffle
    order. The unit-price weighting is the 'average realized price'
    every sales rollup needs."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    qty = F.col("l_quantity").cast("decimal(38,0)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(cents * qty).alias("wsum"),
            F.sum(qty).alias("wtot"),
        )
        .select(
            "l_returnflag",
            (
                F.col("wsum").cast("double")
                / F.col("wtot").cast("double")
                / 100
            ).alias("qty_weighted_avg_price"),
            F.col("wtot").cast("long").alias("total_qty"),
        )
    )


@register(
    "win_value_frame_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS priciest_key,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_cheapest_key
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_value_frame_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-window family: first_value, last_value, and nth_value
    over a full-partition frame (default frames silently truncate
    last/nth at the current row — the classic window gotcha, stated
    explicitly here with UNBOUNDED FOLLOWING); deterministic total
    order (price, key)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    ordered = Window.partitionBy("o_custkey").orderBy(
        "o_totalprice", "o_orderkey"
    )
    full = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(ordered).alias("cheapest_key"),
        F.last("o_orderkey").over(full).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(full).alias(
            "second_cheapest_key"
        ),
    )


@register(
    "win_exact_ntile_distributed",
    oracle="""
    SELECT CAST(tile AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             NTILE(7) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
      FROM orders
    )
    GROUP BY tile
    """,
)
def win_exact_ntile_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE(7) over ALL orders — assigned by the DISTRIBUTED
    exact-ntile operator (``operators.ntile.exact_ntile``): range
    repartition on the total order, per-range-partition local
    row_number, broadcast prefix-sum offsets, closed-form tile rule.
    Bit-identical to the oracle's single-window NTILE, but every
    window in the plan is partitioned — the pattern that replaces the
    global-window family at 100-TB scale (r4 next-round item #4).
    min/max per tile are exact order statistics (no double
    accumulation), so the hash comparison is engine-stable."""
    from ..operators.ntile import exact_ntile

    o = load_table(spark, sf_dir, "orders")
    return (
        exact_ntile(o, 7, ["o_totalprice", "o_orderkey"], "tile")
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "cdc_scd2_history_build",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, 0 AS seq, 'I' AS op, o_totalprice AS price
      FROM orders
    ),
    changes AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
             o_totalprice + 100 AS price
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey AS k, 2 AS seq, 'D' AS op,
             CAST(NULL AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    log AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
    seqd AS (
      SELECT k, seq, op, price,
             LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS next_seq
      FROM log
    )
    SELECT k AS o_orderkey,
           CAST(seq AS BIGINT) AS valid_from_seq,
           CAST(next_seq AS BIGINT) AS valid_to_seq,
           price,
           CAST(CASE WHEN next_seq IS NULL THEN 1 ELSE 0 END AS INT)
             AS is_current
    FROM seqd
    WHERE op <> 'D'
    """,
)
def cdc_scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history built FROM a CDC log — the warehouse
    pattern downstream of cdc_apply_latest: instead of collapsing to
    the latest state, every change version becomes a row with a
    [valid_from_seq, valid_to_seq) validity interval (lead over the
    per-key change sequence), deletes close the final interval without
    emitting one, and the open row is flagged current. Same
    deterministic synthesized I/U/D log as cdc_apply_latest, one
    shuffle on the key; composes with scd2_as_of_snapshot for
    point-in-time reads and upsert_partitions for the physical
    write."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
    )
    upd = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + 100).alias("price"),
    )
    dele = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    log = base.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("k").orderBy("seq")
    return (
        log.withColumn("next_seq", F.lead("seq").over(w))
        .filter(F.col("op") != "D")
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("seq").cast("long").alias("valid_from_seq"),
            F.col("next_seq").cast("long").alias("valid_to_seq"),
            "price",
            F.col("next_seq").isNull().cast("int").alias("is_current"),
        )
    )
