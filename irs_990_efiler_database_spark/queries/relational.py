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




# round-11 split: the data-quality/profiling/robust-aggregate
# sub-family moved to relational_quality — re-exported here so import
# paths and registered names are unchanged
from .relational_quality import *  # noqa: E402,F401,F403
