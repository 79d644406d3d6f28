"""Sketch queries: distinct-count synopses under the exact-hash oracle
gate.

DuckDB mirrors the whole KMV construction in SQL (distinct md5-prefix
hashes, ORDER BY, LIMIT k), so the comparison covers the synopsis
contents and the estimator arithmetic, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..catalog import load_table
from ..operators.sketch import kmv_bottom_k, kmv_estimate
from . import register

_K = 256
_TWO60 = "1152921504606846976.0"  # 2^60 as an exact double literal


@register(
    "sketch_kmv_distinct_parts",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
             CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM lineitem
    ),
    bk AS (SELECT h FROM h ORDER BY h LIMIT {_K}),
    agg AS (SELECT COUNT(*) AS k_held, MAX(h) AS kth_hash FROM bk)
    SELECT CAST(k_held AS BIGINT) AS k_held,
           kth_hash,
           CASE WHEN k_held < {_K} THEN CAST(k_held AS DOUBLE)
                ELSE CAST(k_held - 1 AS DOUBLE)
                     / (CAST(kth_hash AS DOUBLE) / {_TWO60})
           END AS est_distinct
    FROM agg
    """,
)
def sketch_kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over lineitem.l_partkey: one map-side
    bottom-k pass + a k-row merge instead of a full distinct shuffle.
    The oracle rebuilds the identical synopsis declaratively, so k_held,
    the k-th hash, and the estimate are all hash-compared."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_estimate(kmv_bottom_k(li, "l_partkey", _K), _K)


@register(
    "sketch_kmv_error_vs_exact",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
             CAST(concat('0x', substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM orders
    ),
    bk AS (SELECT h FROM h ORDER BY h LIMIT {_K}),
    agg AS (SELECT COUNT(*) AS k_held, MAX(h) AS kth_hash FROM bk),
    ex AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders)
    SELECT CAST(agg.k_held AS BIGINT) AS k_held,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           CASE WHEN agg.k_held < {_K} THEN CAST(agg.k_held AS DOUBLE)
                ELSE CAST(agg.k_held - 1 AS DOUBLE)
                     / (CAST(agg.kth_hash AS DOUBLE) / {_TWO60})
           END AS est_distinct
    FROM agg, ex
    """,
)
def sketch_kmv_error_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch next to the exact answer on a column whose
    cardinality exceeds k, so the estimator path (not the exact-below-k
    fallback) is what gets verified. The cross join is 1 row x 1 row."""
    orders = load_table(spark, sf_dir, "orders")
    est = kmv_estimate(kmv_bottom_k(orders, "o_custkey", _K), _K).select(
        "k_held", "est_distinct"
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(exact).select("k_held", "exact_distinct", "est_distinct")


@register(
    "sketch_heavy_hitter_users",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT user_id,
           COUNT(*) AS freq,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= (SELECT n FROM tot) / 120.0
    """,
)
def sketch_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (users with >= 1/120 of all events) via the
    candidate-superset funnel: map-side local-frequency candidates
    (pigeonhole superset, no shuffle) -> exact recount of candidate
    rows only -> threshold filter. The output is provably identical to
    the direct GROUP BY ... HAVING the oracle runs — but the shuffle
    carries only candidate rows, which is what survives a 100 TB
    vocabulary."""
    from ..operators.sketch import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    out, total = heavy_hitters(ev, "user_id", 120)
    return out.select(
        "user_id",
        "freq",
        (F.col("freq").cast("double") / F.lit(float(total))).alias("share"),
    )


@register(
    "sketch_binned_quantiles",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT bin,
             SUM(c) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM b
    ),
    tot AS (SELECT COUNT(*) AS n FROM orders)
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= 0.5 * (SELECT n FROM tot)
                    THEN CAST(bin AS DOUBLE) * 1000 END) AS p50_bin_est,
           MIN(CASE WHEN cum >= 0.9 * (SELECT n FROM tot)
                    THEN CAST(bin AS DOUBLE) * 1000 END) AS p90_bin_est,
           MIN(CASE WHEN cum >= 0.99 * (SELECT n FROM tot)
                    THEN CAST(bin AS DOUBLE) * 1000 END) AS p99_bin_est
    FROM cum
    """,
)
def sketch_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram: one map-side
    combined groupBy over bin ids (the histogram is the mergeable
    sketch — width 1000 of o_totalprice), a cumulative window over the
    few hundred bins, and the quantile estimate = the lower edge of the
    first bin whose cumulative count crosses q*n. Error is bounded by
    the bin width; the shuffle carries one row per BIN, not per row.
    Complements agg_percentile_disc (exact, full sort) as the 100 TB
    path when bin-width error is acceptable."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    b = orders.groupBy(
        F.floor(F.col("o_totalprice") / F.lit(1000.0)).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    # bounded-window: input is the per-bin histogram aggregate
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = b.withColumn("cum", F.sum("c").over(w))

    def est(q: float):
        return F.min(
            F.when(F.col("cum") >= q * total, F.col("bin") * 1000.0)
        )

    return cum.agg(
        F.lit(total).cast("long").alias("n"),
        est(0.5).alias("p50_bin_est"),
        est(0.9).alias("p90_bin_est"),
        est(0.99).alias("p99_bin_est"),
    )


_GK = 64


@register(
    "sketch_kmv_users_per_event_type",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    r AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    bk AS (SELECT event_type, h FROM r WHERE rn <= {_GK})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS k_held,
           MAX(h) AS kth_hash,
           CASE WHEN COUNT(*) < {_GK} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE CAST(COUNT(*) - 1 AS DOUBLE)
                     / (CAST(MAX(h) AS DOUBLE) / {_TWO60})
           END AS est_distinct_users
    FROM bk
    GROUP BY event_type
    """,
)
def sketch_kmv_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED distinct-count sketch: one KMV synopsis per event_type
    (distinct users), built with a manual map-side combine so the
    shuffle carries at most k longs per (group, partition) — the
    grouped twin of sketch_kmv_distinct_parts."""
    from ..operators.sketch import kmv_bottom_k_grouped

    ev = load_table(spark, sf_dir, "events")
    syn = kmv_bottom_k_grouped(ev, "event_type", "user_id", _GK)
    return syn.groupBy("event_type").agg(
        F.count("h").alias("k_held"),
        F.max("h").alias("kth_hash"),
    ).select(
        "event_type",
        "k_held",
        "kth_hash",
        F.when(F.col("k_held") < _GK, F.col("k_held").cast("double"))
        .otherwise(
            (F.col("k_held") - 1).cast("double")
            / (F.col("kth_hash").cast("double") / F.lit(float(1 << 60)))
        )
        .alias("est_distinct_users"),
    )


_IK = 64  # intersection-sketch size: below the ~150 distinct users at
# small SF so the estimator path (not the exact fallback) is exercised


@register(
    "sketch_kmv_intersection",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE event_type = 'click'
    ),
    hb AS (
      SELECT DISTINCT
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_IK}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_IK}),
    ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
           ORDER BY h LIMIT {_IK}),
    ea AS (SELECT COUNT(*) AS kh, MAX(h) AS mh FROM ka),
    eb AS (SELECT COUNT(*) AS kh, MAX(h) AS mh FROM kb),
    eu AS (SELECT COUNT(*) AS kh, MAX(h) AS mh FROM ku),
    x AS (
      SELECT
        (SELECT CASE WHEN kh < {_IK} THEN CAST(kh AS DOUBLE)
                ELSE CAST(kh - 1 AS DOUBLE) / (CAST(mh AS DOUBLE) / {_TWO60})
                END FROM ea) AS est_a,
        (SELECT CASE WHEN kh < {_IK} THEN CAST(kh AS DOUBLE)
                ELSE CAST(kh - 1 AS DOUBLE) / (CAST(mh AS DOUBLE) / {_TWO60})
                END FROM eb) AS est_b,
        (SELECT CASE WHEN kh < {_IK} THEN CAST(kh AS DOUBLE)
                ELSE CAST(kh - 1 AS DOUBLE) / (CAST(mh AS DOUBLE) / {_TWO60})
                END FROM eu) AS est_union
    )
    SELECT est_a, est_b, est_union,
           est_a + est_b - est_union AS est_inter,
           (SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type = 'click') AS exact_a,
           (SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type = 'purchase') AS exact_b,
           (SELECT COUNT(*) FROM
              (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
               INTERSECT
               SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
           ) AS exact_inter
    FROM x
    """,
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from mergeable KMV sketches:
    |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where the union sketch is
    the bottom-k MERGE of the two per-set synopses — never a rescan of
    the union. This is the sketch algebra that lets per-day / per-shard
    synopses answer cross-segment overlap questions at 100 TB with
    kilobytes of state; exact counts ride along for the error audit.
    (The inclusion–exclusion estimate can go slightly negative for
    disjoint sets; it is reported raw, un-clamped.)"""
    from ..operators.sketch import kmv_bottom_k, kmv_estimate, kmv_merge

    e = load_table(spark, sf_dir, "events")
    a = kmv_bottom_k(e.filter(F.col("event_type") == "click"), "user_id", _IK)
    b = kmv_bottom_k(
        e.filter(F.col("event_type") == "purchase"), "user_id", _IK
    )
    a = tracked_persist(a)
    b = tracked_persist(b)
    u = kmv_merge(_IK, a, b)

    def est(syn, name):
        return kmv_estimate(syn, _IK).select(F.col("est_distinct").alias(name))

    exact = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "user_id")
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .agg(
            F.count(F.lit(1)).alias("exact_union_sz"),
            F.sum(F.when(F.col("n_types") == 2, 1).otherwise(0)).alias(
                "exact_inter"
            ),
        )
    )
    counts = e.groupBy().agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_b"),
    )
    return (
        est(a, "est_a")
        .crossJoin(est(b, "est_b"))
        .crossJoin(est(u, "est_union"))
        .crossJoin(counts)
        .crossJoin(exact.select("exact_inter"))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_inter"
            ),
            "exact_a",
            "exact_b",
            "exact_inter",
        )
    )


_CMS_D = 3  # count-min depth (independent hash rows)
_CMS_W = 64  # count-min width (buckets per row)


@register(
    "sketch_cms_freq_error",
    oracle=f"""
    WITH g AS (SELECT unnest([0, 1, 2]) AS i),
    rows_ AS (
      SELECT g.i,
             CAST(concat('0x', substring(
                    md5(CAST(g.i AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)),
                    1, 8)) AS BIGINT) % {_CMS_W} AS bucket
      FROM events e, g
    ),
    counters AS (
      SELECT i, bucket, COUNT(*) AS c FROM rows_ GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    pb AS (
      SELECT p.user_id, g.i,
             CAST(concat('0x', substring(
                    md5(CAST(g.i AS VARCHAR) || ':' || CAST(p.user_id AS VARCHAR)),
                    1, 8)) AS BIGINT) % {_CMS_W} AS bucket
      FROM probes p, g
    ),
    est AS (
      SELECT pb.user_id, MIN(c.c) AS est_n
      FROM pb JOIN counters c USING (i, bucket)
      GROUP BY 1
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events
      WHERE user_id < 20 GROUP BY 1
    )
    SELECT x.user_id, x.exact_n, est.est_n,
           est.est_n - x.exact_n AS overcount
    FROM exact x JOIN est ON est.user_id = x.user_id
    """,
)
def sketch_cms_freq_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation with its one-sided error
    audited against exact counts: d={_CMS_D} portable md5 hash rows x
    w={_CMS_W} buckets — the counter table is d*w rows REGARDLESS of
    input scale (one map-side-combined aggregation), mergeable across
    shards/days by cell-wise addition, and probing is a broadcast join
    of the probe keys against the tiny counter frame. Estimate =
    min over rows (never undercounts); `overcount` is the collision
    inflation, the quantity that shrinks as w grows."""
    e = load_table(spark, sf_dir, "events")

    def bucket(i: F.Column, key: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            i.cast("string"), F.lit(":"), key.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    rows = e.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(_CMS_D)])
        ).alias("i"),
        F.col("user_id"),
    ).select("i", bucket(F.col("i"), F.col("user_id")).alias("bucket"))
    counters = rows.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))

    probes = (
        e.filter(F.col("user_id") < 20).select("user_id").distinct()
    )
    pb = probes.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i"),
    ).select("user_id", "i", bucket(F.col("i"), F.col("user_id")).alias("bucket"))
    est = (
        pb.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_n"))
    )
    exact = (
        e.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return exact.join(est, "user_id").select(
        "user_id",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    )


_BF_WORDS = 4  # 4 x 64-bit words = 256-bit filter
_BF_HASHES = 3


def _bf_hash_sql(i: int, key: str) -> str:
    return (
        f"CAST(concat('0x', substring(md5(CAST({i} AS VARCHAR) || '#' || "
        f"CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % 252"
    )


@register(
    "sketch_bloom_filter",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03'
    ),
    bits AS (
      SELECT pos // 63 AS word, 1::BIGINT << (pos % 63) AS mask
      FROM (
        SELECT unnest([{", ".join(_bf_hash_sql(i, "user_id") for i in range(_BF_HASHES))}]) AS pos
        FROM members
      )
    ),
    filt AS (
      SELECT word, bit_or(mask) AS bm FROM bits GROUP BY 1
    ),
    probes AS (
      SELECT user_id, user_id IN (SELECT user_id FROM members) AS truth
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    pbits AS (
      SELECT p.user_id, p.truth, pos // 63 AS word, 1::BIGINT << (pos % 63) AS mask
      FROM (
        SELECT user_id, truth,
               unnest([{", ".join(_bf_hash_sql(i, "user_id") for i in range(_BF_HASHES))}]) AS pos
        FROM probes
      ) p
    ),
    verdict AS (
      SELECT b.user_id, b.truth,
             bool_and((f.bm & b.mask) = b.mask) AS claimed
      FROM pbits b JOIN filt f USING (word)
      GROUP BY 1, 2
    )
    SELECT CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN truth AND NOT claimed THEN 1 ELSE 0 END)
                AS BIGINT) AS false_negatives,
           CAST(SUM(CASE WHEN NOT truth AND claimed THEN 1 ELSE 0 END)
                AS BIGINT) AS false_positives,
           CAST(SUM(CASE WHEN NOT truth THEN 1 ELSE 0 END) AS BIGINT)
             AS n_non_members
    FROM verdict
    """,
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter as data: first-48h purchasers hash into a
    252-bit filter (4 x 63 usable bits — bit 63 stays clear so the
    signed-shift never overflows in either engine) ({_BF_HASHES} md5-derived positions each) built by
    a bit_or aggregation over {_BF_WORDS} words — constant-size,
    mergeable by OR across shards, and probe-able with a broadcast
    join. The audit proves the contract: ZERO false negatives by
    construction (asserted as a row value), and a measured
    false-positive count against exact truth. Spark's own
    bloom_filter_agg covers the runtime-join path (see
    tests/test_runtime_filters.py); this is the engine-portable twin
    whose exact bit content both engines reproduce."""
    e = load_table(spark, sf_dir, "events")
    members = (
        e.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
        )
        .select("user_id")
        .distinct()
    )

    def positions(df):
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(str(i)),
                                        F.lit("#"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % 252
                        for i in range(_BF_HASHES)
                    ]
                )
            ).alias("pos"),
        )

    # SQL-expr shiftleft: the Python F.shiftleft only takes a literal
    # shift amount, the SQL form shifts by a column
    mask_expr = F.expr("shiftleft(1L, CAST(pos % 63 AS INT))")
    bits = positions(members).select(
        (F.col("pos") / 63).cast("long").alias("word"),
        mask_expr.alias("mask"),
    )
    filt = bits.groupBy("word").agg(F.bit_or("mask").alias("bm"))
    probes = (
        e.select("user_id")
        .distinct()
        .join(
            members.withColumn("truth", F.lit(True)), "user_id", "left"
        )
        .select("user_id", F.coalesce("truth", F.lit(False)).alias("truth"))
    )
    pbits = positions(probes).select(
        "user_id",
        "truth",
        (F.col("pos") / 63).cast("long").alias("word"),
        mask_expr.alias("mask"),
    )
    verdict = (
        pbits.join(F.broadcast(filt), "word")
        .groupBy("user_id", "truth")
        .agg(
            F.bool_and(
                F.col("bm").bitwiseAND(F.col("mask")) == F.col("mask")
            ).alias("claimed")
        )
    )
    return verdict.agg(
        F.sum(F.when(F.col("truth"), 1).otherwise(0)).alias("n_members"),
        F.sum(
            F.when(F.col("truth") & ~F.col("claimed"), 1).otherwise(0)
        ).alias("false_negatives"),
        F.sum(
            F.when(~F.col("truth") & F.col("claimed"), 1).otherwise(0)
        ).alias("false_positives"),
        F.sum(F.when(~F.col("truth"), 1).otherwise(0)).alias("n_non_members"),
    )
