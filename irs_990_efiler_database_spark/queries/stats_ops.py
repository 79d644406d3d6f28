"""Statistical / analytical operators the reference computes ad-hoc in
R (cor(), chisq.test(), sample() over collected frames — e.g. the
exploratory passes in the reference's analysis notebooks) re-expressed
as distributed one-pass aggregations.

Determinism rules (see queries/__init__.py): every moment is
accumulated in DECIMAL fixed-point (associative, order-free) and cast
to DOUBLE only in the final per-row projection, so the value hash
matches the DuckDB oracle on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# Pairwise Pearson correlation from exact integer moments
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS HUGEINT)) AS sq,
             SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sp,
             SUM(CAST(round(l_discount * 100) AS HUGEINT)) AS sd,
             SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sqq,
             SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS spp,
             SUM(CAST(round(l_discount * 100) AS HUGEINT)
                 * CAST(round(l_discount * 100) AS HUGEINT)) AS sdd,
             SUM(CAST(l_quantity AS HUGEINT)
                 * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sqp,
             SUM(CAST(l_quantity AS HUGEINT)
                 * CAST(round(l_discount * 100) AS HUGEINT)) AS sqd,
             SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                 * CAST(round(l_discount * 100) AS HUGEINT)) AS spd
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(CAST(n * sqp - sq * sp AS DOUBLE)
                 / sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                 / sqrt(CAST(n * spp - sp * sp AS DOUBLE)), 6) AS corr_qty_price,
           round(CAST(n * sqd - sq * sd AS DOUBLE)
                 / sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                 / sqrt(CAST(n * sdd - sd * sd AS DOUBLE)), 6) AS corr_qty_disc,
           round(CAST(n * spd - sp * sd AS DOUBLE)
                 / sqrt(CAST(n * spp - sp * sp AS DOUBLE))
                 / sqrt(CAST(n * sdd - sd * sd AS DOUBLE)), 6) AS corr_price_disc
    FROM m
"""


@register("stat_corr_pairs", oracle=_CORR_ORACLE)
def stat_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group pairwise Pearson correlation matrix (quantity, price,
    discount) from exact integer-unit moments.

    Built-in ``corr()`` accumulates doubles in partition-arrival order
    — non-reproducible under shuffle. Here every measure is scaled to
    an integer (cents / hundredths), the ten co-moments are summed in
    DECIMAL(38,0) — associative, partial-agg friendly — and each
    correlation is three double ops in the final projection. The scale
    factors cancel algebraically, so no unit correction is needed.
    One scan, one shuffle of 10 decimals per group. (At sf≳1000 the
    decimal co-moments approach 38 digits; the combine would switch to
    double at a documented precision cost.)
    """
    # rebalance=True: five-column decimal moment products per row are
    # heavy enough that the single-row-group scan serializes the stage
    # (measured 3.76 s -> 2.65 s at sf0.1 with the rebalance)
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    q = F.col("l_quantity").cast("decimal(19,0)")
    p = F.round(F.col("l_extendedprice") * 100).cast("decimal(19,0)")
    d = F.round(F.col("l_discount") * 100).cast("decimal(19,0)")
    dec = lambda c: F.sum(c.cast("decimal(38,0)"))  # noqa: E731
    m = (
        li.select("l_returnflag", q.alias("q"), p.alias("p"), d.alias("d"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec(F.col("q")).alias("sq"),
            dec(F.col("p")).alias("sp"),
            dec(F.col("d")).alias("sd"),
            dec(F.col("q") * F.col("q")).alias("sqq"),
            dec(F.col("p") * F.col("p")).alias("spp"),
            dec(F.col("d") * F.col("d")).alias("sdd"),
            dec(F.col("q") * F.col("p")).alias("sqp"),
            dec(F.col("q") * F.col("d")).alias("sqd"),
            dec(F.col("p") * F.col("d")).alias("spd"),
        )
    )

    def corr(sxy, sx, sy, sxx, syy):
        num = (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        vx = (F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        vy = (F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        return F.round(num / F.sqrt(vx) / F.sqrt(vy), 6)

    return m.select(
        "l_returnflag",
        "n",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (event_type x user segment)
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH cells AS (
      SELECT event_type, user_id % 4 AS seg, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT c.event_type, c.seg, c.o,
             SUM(c.o) OVER (PARTITION BY c.event_type) AS rt,
             SUM(c.o) OVER (PARTITION BY c.seg) AS ct,
             SUM(c.o) OVER () AS n
      FROM cells c
    ),
    contrib AS (
      SELECT CAST(round(
               (o - CAST(rt AS DOUBLE) * ct / n)
               * (o - CAST(rt AS DOUBLE) * ct / n)
               / (CAST(rt AS DOUBLE) * ct / n), 6) AS DECIMAL(18,6)) AS x
      FROM tot
    )
    SELECT CAST(SUM(x) AS DOUBLE) AS chi2,
           CAST((SELECT (COUNT(DISTINCT event_type) - 1)
                        * (COUNT(DISTINCT user_id % 4) - 1) FROM events)
                AS BIGINT) AS dof
    FROM contrib
"""


@register("stat_chi2_independence", oracle=_CHI2_ORACLE)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square statistic for independence of event_type and a user
    segment (user_id mod 4): one contingency-cell aggregation, window
    marginals over the tiny cell frame, per-cell (O-E)^2/E.

    Determinism: each cell's contribution is a double expression over
    exact integer counts (identical on any engine), rounded once and
    summed in DECIMAL — the only cross-row float sum is replaced by an
    exact decimal sum of already-rounded values. The cell frame is
    |event_types| x |segments| rows regardless of input scale, so the
    unpartitioned windows are bounded.
    """
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select("event_type", (F.col("user_id") % 4).alias("seg"))
        .groupBy("event_type", "seg")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    tot = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("seg")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    x = F.round((F.col("o") - exp) * (F.col("o") - exp) / exp, 6).cast(
        "decimal(18,6)"
    )
    dof = cells.agg(
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("seg") - 1)
        ).cast("long").alias("dof")
    )
    return tot.select(x.alias("x")).agg(
        F.sum("x").cast("double").alias("chi2")
    ).crossJoin(dof)


# ---------------------------------------------------------------------------
# Calendar gap-fill with forward fill (time-series regularization)
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events WHERE user_id < 50
      GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(d) AS mind, MAX(d) AS maxd FROM daily GROUP BY 1
    ),
    cal AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(mind AS TIMESTAMP),
                                         CAST(maxd AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    )
    SELECT c.user_id, strftime(c.d, '%Y-%m-%d') AS day,
           LAST_VALUE(dy.v IGNORE NULLS) OVER (
             PARTITION BY c.user_id ORDER BY c.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_filled,
           dy.v IS NULL AS is_gap
    FROM cal c
    LEFT JOIN daily dy ON dy.user_id = c.user_id AND dy.d = c.d
"""


@register("events_gap_fill_ffill", oracle=_GAP_FILL_ORACLE)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily totals densified to a
    full calendar (min..max day per user) with gaps forward-filled from
    the last observed value — the resample/ffill step a feature
    pipeline needs before fixed-length windowing.

    Scale shape: the calendar explode produces span-length rows per
    user (bounded by days, not events); the left join and the
    ignore-nulls last() window share one hash partitioning on user_id,
    so densify + fill is a single shuffle. Daily totals are decimal
    sums cast to double once, so filled values hash identically
    cross-engine.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    daily = (
        e.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mind", "maxd", F.expr("INTERVAL 1 DAY"))
            ).alias("d"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.last("v", ignorenulls=True).over(w).alias("val_filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (priority sampling, bottom-k by u/w)
# ---------------------------------------------------------------------------

_WSAMPLE_ORACLE = """
    WITH keyed AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             (CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                   AS BIGINT) + 1) / o_totalprice AS pk
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY pk, o_orderkey) AS rn
      FROM keyed
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice AS weight
    FROM ranked WHERE rn <= 20
"""


@register("sample_weighted_priority", oracle=_WSAMPLE_ORACLE)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of 20 orders per priority class, inclusion
    probability proportional to order value — priority sampling
    (Duffield/Lund/Thorup): key = uniform(row)/weight, keep the k
    smallest keys per group.

    The uniform is a 32-bit md5 prefix of the row key (+1 so it is
    never zero) — no transcendental functions, only one IEEE division,
    so the selection is bit-reproducible across engines and runs,
    unlike rand()-based sampling. Scale: per-group top-k by key is a
    partial top-k per partition then a k-row merge per group (Spark
    window + filter under AQE); the corpus is scanned once, nothing
    but (group, key, id) shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        + 1
    )
    keyed = o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        (u.cast("double") / F.col("o_totalprice")).alias("pk"),
    )
    # two-phase bottom-k: the first window slices each group by input
    # partition id, so no single window partition ever holds more than
    # one task's rows; the final per-group window then ranks at most
    # 20 x n_partitions survivors instead of the whole group. Costs
    # one extra shuffle of four narrow columns — buys bounded memory
    # at any group size (the bounded-window discipline every top-k in
    # this repo follows)
    local = Window.partitionBy(
        "o_orderpriority", F.spark_partition_id()
    ).orderBy("pk", "o_orderkey")
    survivors = keyed.withColumn("lrn", F.row_number().over(local)).filter(
        F.col("lrn") <= 20
    )
    w = Window.partitionBy("o_orderpriority").orderBy("pk", "o_orderkey")
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (item-item association)
# ---------------------------------------------------------------------------

_COOC_ORACLE = """
    WITH ok AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_partkey) <= 100
    ),
    b AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN ok USING (l_orderkey)
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
    ic AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, COUNT(*) AS support
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.support,
           CAST(p.support AS DOUBLE) / sqrt(CAST(ca.c AS DOUBLE) * cb.c)
             AS cosine,
           CAST(p.support AS DOUBLE) * n.n_orders / (CAST(ca.c AS DOUBLE) * cb.c)
             AS lift
    FROM pairs p
    JOIN ic ca ON ca.l_partkey = p.part_a
    JOIN ic cb ON cb.l_partkey = p.part_b
    CROSS JOIN n
"""


@register("rec_item_cooccurrence", oracle=_COOC_ORACLE)
def rec_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item association mining over order baskets: support,
    cosine, and lift for part pairs co-purchased in >= 2 orders — the
    co-occurrence statistics behind 'bought-together' recommendation
    and feature co-selection.

    Scale shape: the per-basket self-join is quadratic in BASKET size,
    not corpus size; baskets above 100 distinct items are excluded
    up-front (mirrored in the oracle) so a degenerate mega-basket
    cannot produce O(n^2) rows. ONE shuffle derives the basket frame:
    collect_set per order (bounded ≤100 items) replaces the old
    groupBy-count + semi-join + distinct triple, and the exploded
    (order, part) frame keeps hashpartitioning(l_orderkey) from the
    aggregation, so the pair self-join needs no further exchange.
    Item counts join back AQE-sized; the association doubles are
    single fixed-order expressions over exact counts, no rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(F.size("parts") <= 100)
    )
    b = baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ic = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    pa = b.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    pb = b.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        pa.join(pb, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    ca = ic.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    cb = ic.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(n)
        .select(
            "part_a",
            "part_b",
            "support",
            (
                F.col("support").cast("double")
                / F.sqrt(F.col("ca").cast("double") * F.col("cb"))
            ).alias("cosine"),
            (
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("ca").cast("double") * F.col("cb"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Group-mean imputation (missing-value repair)
# ---------------------------------------------------------------------------

_IMPUTE_ORACLE = """
    WITH m AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type <> 'error'
                      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
               AS s,
             SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS n
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN e.event_type = 'error'
                THEN m.s / m.n ELSE e.value END AS value_imputed,
           e.event_type = 'error' AS was_missing
    FROM events e JOIN m USING (user_id)
    WHERE m.n > 0
"""


@register("impute_group_mean", oracle=_IMPUTE_ORACLE)
def impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair: 'error' events stand in for rows whose
    measurement is unusable; each is replaced by the per-user mean of
    the usable rows (decimal-exact sum, one double division — the only
    mean construction whose hash survives distributed summation).

    Shape: one grouped aggregate + one equi-join on the same key — at
    scale both sides share a single hash partitioning on user_id, and
    users with no usable rows are excluded (no silent NULL fill)."""
    e = load_table(spark, sf_dir, "events")
    usable = F.col("event_type") != "error"
    m = e.groupBy("user_id").agg(
        F.sum(F.when(usable, F.col("value").cast("decimal(18,6)")))
        .cast("double")
        .alias("s"),
        F.sum(F.when(usable, 1).otherwise(0)).alias("n"),
    )
    return (
        e.join(m, "user_id")
        .filter(F.col("n") > 0)
        .select(
            "event_id",
            "user_id",
            F.when(~usable, F.col("s") / F.col("n"))
            .otherwise(F.col("value"))
            .alias("value_imputed"),
            (~usable).alias("was_missing"),
        )
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B conversion comparison)
# ---------------------------------------------------------------------------

_ZTEST_ORACLE = """
    WITH seg AS (
      SELECT user_id % 2 AS grp,
             COUNT(*) AS n_users,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_conv
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT
        (SELECT n_users FROM seg WHERE grp = 0) AS n0,
        (SELECT n_conv FROM seg WHERE grp = 0) AS c0,
        (SELECT n_users FROM seg WHERE grp = 1) AS n1,
        (SELECT n_conv FROM seg WHERE grp = 1) AS c1
    )
    SELECT n0, c0, n1, c1,
           CAST(c0 AS DOUBLE) / n0 AS rate0,
           CAST(c1 AS DOUBLE) / n1 AS rate1,
           (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
             / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)) AS z_stat
    FROM w
"""


@register("stat_two_proportion_ztest", oracle=_ZTEST_ORACLE)
def stat_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B comparison of the purchase-event proportion between two
    user arms (user_id parity): per-arm trial and success counts in
    one map-side-combined aggregation, then the pooled two-proportion
    z statistic — the experiment-analysis primitive, computed from
    four exact integers in one fixed-order double expression (no
    rounding needed; both engines evaluate the identical IEEE ops)."""
    e = load_table(spark, sf_dir, "events")
    seg = (
        e.select(
            (F.col("user_id") % 2).alias("grp"),
            "user_id",
            (F.col("event_type") == "purchase").alias("is_conv"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.when(F.col("is_conv"), 1).otherwise(0)).alias("n_conv"),
        )
    )
    w = (
        seg.groupBy()
        .pivot("grp", [0, 1])
        .agg(F.first("n_users").alias("n"), F.first("n_conv").alias("c"))
        .select(
            F.col("0_n").alias("n0"),
            F.col("0_c").alias("c0"),
            F.col("1_n").alias("n1"),
            F.col("1_c").alias("c1"),
        )
    )
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (r0 - r1) / F.sqrt(
        pooled
        * (1 - pooled)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        r0.alias("rate0"), r1.alias("rate1"), z.alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Closed-form simple OLS from exact moments (distributed regression)
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS HUGEINT)) AS sx,
             SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
             SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx,
             SUM(CAST(l_quantity AS HUGEINT)
                 * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100 AS slope,
           (CAST(sy AS DOUBLE) / n
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE))
              * (CAST(sx AS DOUBLE) / n)) / 100 AS intercept
    FROM m
"""


@register("stat_ols_price_on_qty", oracle=_OLS_ORACLE)
def stat_ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form least squares (extendedprice ~ quantity):
    slope and intercept from five exact integer moments — the
    whole-stage-codegen twin of the applyInPandas grouped OLS
    (text_grouped_ols_fit): same math, but expressed as a native
    aggregation so it runs JVM-side with map-side partials and no
    Python boundary. Moments accumulate in DECIMAL(38,0); the final
    projection is fixed-order double arithmetic, /100 restores the
    cents scaling on the y side."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(19,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(19,0)")
    m = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        )
    )
    slope_raw = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope_raw * (F.col("sx").cast("double") / F.col("n"))
    ) / 100
    return m.select(
        "l_returnflag",
        "n",
        (slope_raw / 100).alias("slope"),
        intercept.alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Distribution drift: binned two-sample KS + PSI terms
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
    WITH src AS (
      SELECT user_id % 2 AS seg, value FROM events
    ),
    rng AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM src),
    binned AS (
      SELECT seg,
             LEAST(CAST(floor((value - rng.lo) / (rng.hi - rng.lo) * 64)
                        AS BIGINT), 63) AS bin
      FROM src, rng
    ),
    cells AS (
      SELECT bin,
             SUM(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS p_cnt,
             SUM(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS q_cnt
      FROM binned GROUP BY 1
    ),
    tot AS (SELECT SUM(p_cnt) AS np, SUM(q_cnt) AS nq FROM cells),
    cum AS (
      SELECT bin, p_cnt, q_cnt,
             SUM(p_cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp,
             SUM(q_cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cq
      FROM cells
    )
    SELECT c.bin, c.p_cnt, c.q_cnt,
           round(abs(CAST(c.cp AS DOUBLE) / t.np
                     - CAST(c.cq AS DOUBLE) / t.nq), 6) AS ks_term,
           round((CAST(c.p_cnt + 1 AS DOUBLE) / (t.np + 64)
                  - CAST(c.q_cnt + 1 AS DOUBLE) / (t.nq + 64))
                 * ln((CAST(c.p_cnt + 1 AS DOUBLE) / (t.np + 64))
                      / (CAST(c.q_cnt + 1 AS DOUBLE) / (t.nq + 64))), 6)
             AS psi_term
    FROM cum c CROSS JOIN tot t
"""


@register("stat_distribution_drift", oracle=_DRIFT_ORACLE)
def stat_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample distribution drift over a 64-bin histogram: per-bin
    KS terms (|ΔCDF| — max over bins is the KS statistic) and add-1
    smoothed PSI terms (sum is the population stability index) between
    two user segments — the monitoring pass that catches a snapshot
    or crawl whose value distribution shifted.

    Scale shape: the histogram is the sketch — one count aggregation
    to 64 mergeable cells regardless of volume; the CDF window and
    drift arithmetic run over the fixed 64-row frame. Doubles are
    fixed-order over exact counts, rounded once (PSI's ln varies by
    libm ulp)."""
    e = load_table(spark, sf_dir, "events")
    src = e.select((F.col("user_id") % 2).alias("seg"), "value")
    rng = src.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = src.crossJoin(F.broadcast(rng)).select(
        "seg",
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 64
            ).cast("long"),
            F.lit(63).cast("long"),
        ).alias("bin"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("seg") == 0, 1).otherwise(0)).alias("p_cnt"),
        F.sum(F.when(F.col("seg") == 1, 1).otherwise(0)).alias("q_cnt"),
    )
    tot = cells.agg(
        F.sum("p_cnt").alias("np"), F.sum("q_cnt").alias("nq")
    )
    # bounded-window: input is the per-bin histogram aggregate
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "bin",
        "p_cnt",
        "q_cnt",
        F.sum("p_cnt").over(w).alias("cp"),
        F.sum("q_cnt").over(w).alias("cq"),
    )
    p_sm = (F.col("p_cnt") + 1).cast("double") / (F.col("np") + 64)
    q_sm = (F.col("q_cnt") + 1).cast("double") / (F.col("nq") + 64)
    return cum.crossJoin(F.broadcast(tot)).select(
        "bin",
        "p_cnt",
        "q_cnt",
        F.round(
            F.abs(
                F.col("cp").cast("double") / F.col("np")
                - F.col("cq").cast("double") / F.col("nq")
            ),
            6,
        ).alias("ks_term"),
        F.round((p_sm - q_sm) * F.log(p_sm / q_sm), 6).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

_CUPED_ORACLE = """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                 THEN CAST(round(value * 1000000) AS HUGEINT)
                 ELSE 0::HUGEINT END) AS pre_u,
             SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                 THEN CAST(round(value * 1000000) AS HUGEINT)
                 ELSE 0::HUGEINT END) AS post_u
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(pre_u) AS sx, SUM(post_u) AS sy,
             SUM(pre_u * pre_u) AS sxx, SUM(pre_u * post_u) AS sxy
      FROM per_user
    ),
    th AS (
      SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
             CAST(sx AS DOUBLE) / n AS mean_pre
      FROM m
    )
    SELECT p.arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(p.post_u) AS DOUBLE) / COUNT(*) / 1000000, 6)
             AS mean_post,
           round((CAST(SUM(p.post_u) AS DOUBLE) / COUNT(*)
                  - th.theta * (CAST(SUM(p.pre_u) AS DOUBLE) / COUNT(*)
                                - th.mean_pre)) / 1000000, 6)
             AS mean_cuped
    FROM per_user p CROSS JOIN th
    GROUP BY p.arm, th.theta, th.mean_pre
"""


@register("stat_cuped_adjustment", oracle=_CUPED_ORACLE)
def stat_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for A/B readouts: per-user pre-period
    (days 1-15) spend becomes the control covariate for the
    post-period (days 16-30) metric — adjusted = post - theta *
    (pre - mean_pre) with theta = cov(pre, post)/var(pre), the
    industry-standard trick that shrinks experiment confidence
    intervals without changing the point estimate's expectation.

    All moments accumulate as exact integer micros (one per-user
    aggregation, then one 5-number global combine); theta and the two
    per-arm means are fixed-order double expressions rounded once."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    micros = F.round(F.col("value") * 1_000_000).cast("decimal(38,0)")
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.sum(
            F.when(F.to_date("ts") < cut, micros).otherwise(F.lit(0))
        ).cast("decimal(38,0)").alias("pre_u"),
        F.sum(
            F.when(F.to_date("ts") >= cut, micros).otherwise(F.lit(0))
        ).cast("decimal(38,0)").alias("post_u"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_u").alias("sx"),
        F.sum("post_u").alias("sy"),
        F.sum(F.col("pre_u") * F.col("pre_u")).alias("sxx"),
        F.sum(F.col("pre_u") * F.col("post_u")).alias("sxy"),
    )
    th = m.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("mean_pre"),
    )
    return (
        per_user.crossJoin(F.broadcast(th))
        .groupBy("arm", "theta", "mean_pre")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("post_u").alias("spost"),
            F.sum("pre_u").alias("spre"),
        )
        .select(
            "arm",
            "n_users",
            F.round(
                F.col("spost").cast("double") / F.col("n_users") / 1_000_000,
                6,
            ).alias("mean_post"),
            F.round(
                (
                    F.col("spost").cast("double") / F.col("n_users")
                    - F.col("theta")
                    * (
                        F.col("spre").cast("double") / F.col("n_users")
                        - F.col("mean_pre")
                    )
                )
                / 1_000_000,
                6,
            ).alias("mean_cuped"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's t-test from exact decimal moments (unequal-variance A/B test)
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
    WITH m AS (
      SELECT user_id % 2 AS grp,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS HUGEINT)) AS s1,
             SUM(CAST(round(value * 100) AS HUGEINT)
                 * CAST(round(value * 100) AS HUGEINT)) AS s2
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    w AS (
      SELECT
        MAX(CASE WHEN grp = 0 THEN n END) AS n0,
        MAX(CASE WHEN grp = 0 THEN s1 END) AS s10,
        MAX(CASE WHEN grp = 0 THEN s2 END) AS s20,
        MAX(CASE WHEN grp = 1 THEN n END) AS n1,
        MAX(CASE WHEN grp = 1 THEN s1 END) AS s11,
        MAX(CASE WHEN grp = 1 THEN s2 END) AS s21
      FROM m
    )
    SELECT n0, n1,
           CAST(s10 AS DOUBLE) / n0 / 100 AS mean0,
           CAST(s11 AS DOUBLE) / n1 / 100 AS mean1,
           (CAST(s10 AS DOUBLE) / n0 - CAST(s11 AS DOUBLE) / n1)
             / sqrt(CAST(n0 * s20 - s10 * s10 AS DOUBLE) / n0 / (n0 - 1) / n0
                    + CAST(n1 * s21 - s11 * s11 AS DOUBLE) / n1 / (n1 - 1) / n1)
             AS t_stat,
           (CAST(n0 * s20 - s10 * s10 AS DOUBLE) / n0 / (n0 - 1) / n0
            + CAST(n1 * s21 - s11 * s11 AS DOUBLE) / n1 / (n1 - 1) / n1)
           * (CAST(n0 * s20 - s10 * s10 AS DOUBLE) / n0 / (n0 - 1) / n0
              + CAST(n1 * s21 - s11 * s11 AS DOUBLE) / n1 / (n1 - 1) / n1)
           / ((CAST(n0 * s20 - s10 * s10 AS DOUBLE) / n0 / (n0 - 1) / n0)
              * (CAST(n0 * s20 - s10 * s10 AS DOUBLE) / n0 / (n0 - 1) / n0)
              / (n0 - 1)
              + (CAST(n1 * s21 - s11 * s11 AS DOUBLE) / n1 / (n1 - 1) / n1)
                * (CAST(n1 * s21 - s11 * s11 AS DOUBLE) / n1 / (n1 - 1) / n1)
                / (n1 - 1))
             AS df_welch
    FROM w
"""


@register("stat_welch_ttest", oracle=_WELCH_ORACLE)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two user arms (user_id
    parity) on purchase values — the mean-metric counterpart of
    stat_two_proportion_ztest. Per-arm moments (n, Σc, Σc²) accumulate
    in DECIMAL over integer cents (associative, partitioning-free);
    the t statistic and Welch–Satterthwaite degrees of freedom are one
    fixed-order double projection over six exact integers, so both
    engines run bit-identical IEEE ops. One map-side-combined
    aggregation + a 2-row pivot — scales with the scan."""
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("decimal(19,0)")
    m = (
        e.filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("grp"), c.alias("c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").cast("decimal(38,0)").alias("s1"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("s2"),
        )
    )
    w = (
        m.groupBy()
        .pivot("grp", [0, 1])
        .agg(
            F.first("n").alias("n"),
            F.first("s1").alias("s1"),
            F.first("s2").alias("s2"),
        )
        .select(
            F.col("0_n").alias("n0"),
            F.col("0_s1").alias("s10"),
            F.col("0_s2").alias("s20"),
            F.col("1_n").alias("n1"),
            F.col("1_s1").alias("s11"),
            F.col("1_s2").alias("s21"),
        )
    )
    # per-arm (sample variance / n) in cents^2 — the Welch standard
    # error legs; numerators are exact decimal integers
    se0 = (
        (F.col("n0") * F.col("s20") - F.col("s10") * F.col("s10")).cast("double")
        / F.col("n0") / (F.col("n0") - 1) / F.col("n0")
    )
    se1 = (
        (F.col("n1") * F.col("s21") - F.col("s11") * F.col("s11")).cast("double")
        / F.col("n1") / (F.col("n1") - 1) / F.col("n1")
    )
    mean0c = F.col("s10").cast("double") / F.col("n0")
    mean1c = F.col("s11").cast("double") / F.col("n1")
    t = (mean0c - mean1c) / F.sqrt(se0 + se1)
    df_w = (se0 + se1) * (se0 + se1) / (
        se0 * se0 / (F.col("n0") - 1) + se1 * se1 / (F.col("n1") - 1)
    )
    return w.select(
        "n0",
        "n1",
        (mean0c / 100).alias("mean0"),
        (mean1c / 100).alias("mean1"),
        t.alias("t_stat"),
        df_w.alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test via the distributed prefix-sum ranker
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
    WITH cents AS (
      SELECT o_custkey % 2 AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    levels AS (
      SELECT c,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS v0,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS v1,
             COUNT(*) AS nl
      FROM cents GROUP BY c
    ),
    pre AS (
      SELECT c, v0, v1, nl,
             COALESCE(SUM(nl) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM levels
    ),
    agg AS (
      SELECT CAST(SUM(v0) AS BIGINT) AS n0,
             CAST(SUM(v1) AS BIGINT) AS n1,
             CAST(SUM(v1 * (2 * cum + nl + 1)) AS DECIMAL(38,0)) AS s2r1,
             CAST(SUM(nl * nl * nl - nl) AS DECIMAL(38,0)) AS ties
      FROM pre
    )
    SELECT n0, n1,
           CAST(s2r1 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
           (CAST(s2r1 - n1 * (n1 + 1) AS DOUBLE) / 2
            - CAST(n0 * n1 AS DOUBLE) / 2)
           / sqrt(CAST(n0 AS DOUBLE) * n1 / 12
                  * ((n0 + n1 + 1)
                     - CAST(ties AS DOUBLE)
                       / ((n0 + n1) * (n0 + n1 - 1)))) AS z_stat
    FROM agg
"""


@register("stat_mann_whitney_u", oracle=_MWU_ORACLE)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two customer
    arms on order value — the NONPARAMETRIC A/B primitive (medians,
    not means). The global tie-averaged rank sum never materializes a
    per-row rank: values collapse to distinct-value levels (one
    map-side-combined aggregation), the exclusive prefix count over
    levels comes from the DISTRIBUTED prefix-sum ranker
    (operators/ntile.py global_running_sum — one range shuffle of the
    LEVELS frame, no single-partition window), and the rank sum folds
    per level as v1 * (2*C + n + 1) in exact integers (doubled to
    keep half-ranks integral). Tie-corrected normal approximation in
    one fixed-order double expression. Scales: cost is dominated by
    the level aggregation; the ranked frame is |distinct values|."""
    from ..operators.ntile import global_running_sum

    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        (F.col("o_custkey") % 2).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    levels = cents.groupBy("c").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("v0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("v1"),
        F.count(F.lit(1)).alias("nl"),
    )
    pre = global_running_sum(
        levels, "nl", [F.col("c")], out_col="cum", inclusive=False
    )
    agg = pre.agg(
        F.sum("v0").cast("long").alias("n0"),
        F.sum("v1").cast("long").alias("n1"),
        F.sum(
            (F.col("v1") * (2 * F.col("cum") + F.col("nl") + 1)).cast(
                "decimal(38,0)"
            )
        ).cast("decimal(38,0)").alias("s2r1"),
        F.sum(
            (
                F.col("nl") * F.col("nl") * F.col("nl") - F.col("nl")
            ).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("ties"),
    )
    u1 = (F.col("s2r1") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2
    mu = (F.col("n0") * F.col("n1")).cast("double") / 2
    nn = F.col("n0") + F.col("n1")
    var = (
        F.col("n0").cast("double") * F.col("n1") / 12
        * ((nn + 1) - F.col("ties").cast("double") / (nn * (nn - 1)))
    )
    return agg.select(
        "n0",
        "n1",
        u1.alias("u1"),
        ((u1 - mu) / F.sqrt(var)).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (percentile_cont) via the distributed ranker
# ---------------------------------------------------------------------------

_PCTL_SPECS = [("p25", 25), ("p50", 50), ("p75", 75), ("p90", 90)]

_PCTL_ORACLE = f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c, o_orderkey) AS rn
      FROM cents
    ),
    n AS (SELECT COUNT(*) AS n FROM cents),
    targets AS (
      SELECT label, num,
             ((n - 1) * num) // 100 + 1 AS lo_rank,
             ((n - 1) * num) % 100 AS rem,
             n
      FROM n, (VALUES {", ".join(f"('{lbl}', {num})" for lbl, num in _PCTL_SPECS)})
             AS p(label, num)
    ),
    picked AS (
      SELECT t.label, t.rem, t.n,
             MAX(CASE WHEN r.rn = t.lo_rank THEN r.c END) AS v_lo,
             MAX(CASE WHEN r.rn = t.lo_rank
                        + (CASE WHEN t.rem > 0 THEN 1 ELSE 0 END)
                 THEN r.c END) AS v_hi
      FROM targets t
      JOIN ranked r
        ON r.rn = t.lo_rank
        OR r.rn = t.lo_rank + (CASE WHEN t.rem > 0 THEN 1 ELSE 0 END)
      GROUP BY 1, 2, 3
    )
    SELECT label, n,
           CAST(v_lo * (100 - rem) + v_hi * rem AS DOUBLE) / 100 / 100
             AS value
    FROM picked
"""


@register("stat_percentile_cont_distributed", oracle=_PCTL_ORACLE)
def stat_percentile_cont_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT interpolated percentiles (SQL percentile_cont semantics:
    h = (n-1)p, linear interpolation between floor/ceil ranks) over
    ALL orders — computed distributedly: the global rank comes from
    operators/ntile.py global_row_number (range shuffle + broadcast
    offsets, never a single-partition window), the four target ranks
    are integer-exact ((n-1)*num div 100 — no double h, so boundary
    ranks can't mis-assign), and the 8-row target frame broadcast-
    joins back on rank equality. Interpolation is integer cents
    (v_lo*(100-rem) + v_hi*rem) with ONE final double division, so
    the result is bit-identical on any partitioning and matches the
    DuckDB formula exactly. The percentile_approx contract test
    (sketch family) covers the approximate path; this is the exact
    path at scale."""
    from ..operators.ntile import global_row_number

    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        "o_orderkey",
    )
    ranked = global_row_number(
        cents, [F.col("c"), F.col("o_orderkey")], out_col="rn"
    ).select("c", "rn")
    n1 = cents.agg(F.count(F.lit(1)).alias("n"))
    specs = F.array(
        *[
            F.struct(F.lit(lbl).alias("label"), F.lit(num).alias("num"))
            for lbl, num in _PCTL_SPECS
        ]
    )
    targets = (
        n1.select("n", F.explode(specs).alias("p"))
        .select(
            F.col("p.label").alias("label"),
            F.col("p.num").alias("num"),
            "n",
        )
        .withColumn(
            "lo_rank",
            F.expr("((n - 1) * num) div 100").cast("long") + 1,
        )
        .withColumn("rem", ((F.col("n") - 1) * F.col("num")) % 100)
    )
    # two lookup rows per percentile (lo and hi collapse when rem = 0)
    lookups = targets.select(
        "label",
        "rem",
        "n",
        F.explode(
            F.array(
                F.col("lo_rank"),
                F.col("lo_rank")
                + F.when(F.col("rem") > 0, 1).otherwise(0).cast("long"),
            )
        ).alias("rn"),
        F.col("lo_rank"),
    )
    picked = (
        ranked.join(F.broadcast(lookups), "rn")
        .groupBy("label", "rem", "n")
        .agg(
            F.max(F.when(F.col("rn") == F.col("lo_rank"), F.col("c"))).alias(
                "v_lo"
            ),
            F.max(
                F.when(
                    F.col("rn")
                    == F.col("lo_rank")
                    + F.when(F.col("rem") > 0, 1).otherwise(0).cast("long"),
                    F.col("c"),
                )
            ).alias("v_hi"),
        )
    )
    val = (
        F.col("v_lo") * (100 - F.col("rem")) + F.col("v_hi") * F.col("rem")
    ).cast("double") / 100 / 100
    return picked.select("label", "n", val.alias("value"))


# ---------------------------------------------------------------------------
# STL-lite seasonal decomposition of the daily event series
# ---------------------------------------------------------------------------

_STL_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(round(value * 100) AS BIGINT)) AS c
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day, c,
             (day - DATE '1970-01-01') % 7 AS dow,
             SUM(c) OVER w AS t7,
             COUNT(*) OVER w AS cnt7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas AS (
      SELECT dow,
             SUM(7 * c - t7) AS s_num,
             7 * COUNT(*) AS s_den
      FROM tr WHERE cnt7 = 7 GROUP BY 1
    )
    SELECT tr.day,
           CAST(tr.c AS DOUBLE) / 100 AS total,
           CASE WHEN tr.cnt7 = 7
                THEN CAST(tr.t7 AS DOUBLE) / 7 / 100 END AS trend,
           CAST(seas.s_num AS DOUBLE) / seas.s_den / 100 AS seasonal,
           CASE WHEN tr.cnt7 = 7
                THEN CAST(tr.c AS DOUBLE) / 100
                     - CAST(tr.t7 AS DOUBLE) / 7 / 100
                     - CAST(seas.s_num AS DOUBLE) / seas.s_den / 100
           END AS residual
    FROM tr JOIN seas ON tr.dow = seas.dow
"""


@register("stat_seasonal_decompose", oracle=_STL_ORACLE)
def stat_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of the daily event-value
    series: trend = centered 7-day moving total (integer cents, only
    emitted for full windows), seasonal = day-of-week mean of the
    detrended series (kept exact as Σ(7c − t7) over 7·count — no
    intermediate double), residual = total − trend − seasonal in one
    fixed-order double projection. Day-of-week is epoch-day mod 7
    (engine-portable — no locale-dependent dayofweek()). The series
    frame is the bounded daily aggregate (#days rows), so the ordered
    trend window is driver-scale; the seasonal join is a 7-row
    broadcast."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    )
    # bounded-window: input is the per-day aggregate (#days rows)
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "c",
        (F.datediff("day", F.lit("1970-01-01")) % 7).alias("dow"),
        F.sum("c").over(w).alias("t7"),
        F.count(F.lit(1)).over(w).alias("cnt7"),
    )
    seas = (
        tr.filter(F.col("cnt7") == 7)
        .groupBy("dow")
        .agg(
            F.sum(7 * F.col("c") - F.col("t7")).alias("s_num"),
            (7 * F.count(F.lit(1))).alias("s_den"),
        )
    )
    trend = F.when(
        F.col("cnt7") == 7, F.col("t7").cast("double") / 7 / 100
    )
    seasonal = F.col("s_num").cast("double") / F.col("s_den") / 100
    return tr.join(F.broadcast(seas), "dow").select(
        "day",
        (F.col("c").cast("double") / 100).alias("total"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(
            F.col("cnt7") == 7,
            F.col("c").cast("double") / 100 - trend - seasonal,
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap (hash-derived replicate weights)
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds (inverse-CDF table for the hash uniform)
_POIS_CDF = (
    ("0.36787944117144233", 0),
    ("0.7357588823428847", 1),
    ("0.9196986029286058", 2),
    ("0.9810118431238462", 3),
    ("0.9963401531726563", 4),
    ("0.9994058151824183", 5),
    ("0.9999167588507119", 6),
)
_B_REPS = 32

_BOOT_W_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {thr} THEN {k}" for thr, k in _POIS_CDF
    )
    + " ELSE 7 END"
)

_BOOT_ORACLE = f"""
    WITH reps AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             b
      FROM orders, unnest(generate_series(0, {_B_REPS - 1})) AS r(b)
    ),
    u AS (
      SELECT c, b,
             CAST(concat('0x', substring(md5(concat(
                 CAST(o_orderkey AS VARCHAR), ':', CAST(b AS VARCHAR))),
               1, 8)) AS BIGINT) / 4294967296.0 AS u
      FROM reps
    ),
    w AS (
      SELECT c, b, {_BOOT_W_SQL} AS w FROM u
    ),
    rep AS (
      SELECT b,
             CAST(round(CAST(SUM(w * c) AS DOUBLE) / SUM(w) * 100)
                  AS HUGEINT) AS mbi
      FROM w GROUP BY b
    ),
    boot AS (
      SELECT COUNT(*) AS nb,
             CAST(SUM(mbi) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(mbi * mbi) AS DECIMAL(38,0)) AS s2
      FROM rep
    ),
    base AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS sc
      FROM orders
    )
    SELECT base.n AS n_rows, boot.nb AS n_replicas,
           CAST(base.sc AS DOUBLE) / base.n / 100 AS est_mean,
           sqrt((CAST(boot.nb AS DOUBLE) * CAST(boot.s2 AS DOUBLE)
                 - CAST(boot.s1 AS DOUBLE) * CAST(boot.s1 AS DOUBLE))
                / boot.nb / (boot.nb - 1)) / 10000 AS boot_se,
           CAST(base.sc AS DOUBLE) / base.n / 100
             - 1.959963984540054
               * (sqrt((CAST(boot.nb AS DOUBLE) * CAST(boot.s2 AS DOUBLE)
                       - CAST(boot.s1 AS DOUBLE) * CAST(boot.s1 AS DOUBLE))
                      / boot.nb / (boot.nb - 1)) / 10000) AS ci_lo,
           CAST(base.sc AS DOUBLE) / base.n / 100
             + 1.959963984540054
               * (sqrt((CAST(boot.nb AS DOUBLE) * CAST(boot.s2 AS DOUBLE)
                       - CAST(boot.s1 AS DOUBLE) * CAST(boot.s1 AS DOUBLE))
                      / boot.nb / (boot.nb - 1)) / 10000) AS ci_hi
    FROM boot CROSS JOIN base
"""


@register("stat_bootstrap_ci_poisson", oracle=_BOOT_ORACLE)
def stat_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value via the
    DETERMINISTIC Poisson bootstrap — the resampling scheme that
    actually works on a cluster (Chamandy et al., Google 2012):
    instead of drawing n samples with replacement (a global shuffle
    per replicate), each row draws its own Poisson(1) replicate
    weight from an md5 hash uniform, so all 32 replicates compute
    in ONE map-side-combined aggregation pass with zero data
    movement, reproducible on any partitioning. Replicate means are
    exact integer ratios rounded to 1e-4-dollar integer units; the
    bootstrap SE comes from exact decimal moments over the 32-row
    replicate frame in one fixed-order double projection
    (normal-approximation CI, the standard large-B shortcut)."""
    o = load_table(spark, sf_dir, "orders")
    reps = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(_B_REPS - 1))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = None
    for thr, k in _POIS_CDF:
        cond = u < float(thr)
        w = F.when(cond, k) if w is None else w.when(cond, k)
    w = w.otherwise(7)
    rep = (
        reps.select("c", "b", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("c")).alias("sc"),
            F.sum("w").alias("nw"),
        )
        .select(
            F.round(F.col("sc").cast("double") / F.col("nw") * 100)
            .cast("decimal(19,0)")
            .alias("mbi")
        )
    )
    boot = rep.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("mbi").cast("decimal(38,0)").alias("s1"),
        F.sum((F.col("mbi") * F.col("mbi")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    base = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
        ).alias("sc"),
    )
    est = F.col("sc").cast("double") / F.col("n") / 100
    se = (
        F.sqrt(
            (
                F.col("nb").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
            )
            / F.col("nb")
            / (F.col("nb") - 1)
        )
        / 10000
    )
    zq = F.lit(1.959963984540054)
    return boot.crossJoin(F.broadcast(base)).select(
        F.col("n").alias("n_rows"),
        F.col("nb").alias("n_replicas"),
        est.alias("est_mean"),
        se.alias("boot_se"),
        (est - zq * se).alias("ci_lo"),
        (est + zq * se).alias("ci_hi"),
    )


# round-11 split: the model-side sub-family moved to stats_models —
# re-exported here (incl. the constants tests pin) so import paths and
# registered names are unchanged
from .stats_models import *  # noqa: E402,F401,F403
from .stats_models import (  # noqa: E402,F401  (underscore names skip *)
    _DID_CUT,
    _RIDGE_LAMBDA,
    _SGN_B,
    _SGN_ITERS,
)
