"""Data-quality, profiling, robust-aggregate and change-management
operators over the TPC-H tables (round-11 split of the 2,000-line
relational module: this file carries column profiling, CDC/SCD2,
FK-orphan and table-diff audits, the expectation suite, IVM delta
maintenance, robust aggregates (MAD/HHI/winsorized/Benford/weighted/
argmax), melt/reshape, collation, multiset INTERSECT ALL, LATERAL
top-k and the value-frame window family. relational keeps the core
join/window/agg/setop/sort surface and re-exports this module, so
registered names and import paths are unchanged.) Every operator is
pinned by a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

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
    from .relational import win_scd2_order_history  # lazy: sibling module

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
