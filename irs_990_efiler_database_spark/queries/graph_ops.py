"""Iterative graph algorithms over the part–supplier co-purchase graph.

The reference has no graph surface; this extends the engine with the
iterative-algorithm shape a training-data pipeline needs (influence /
centrality scoring over document- or entity-link graphs at corpus
scale), expressed as pure DataFrame joins + aggregations — the GraphX
Pregel pattern without GraphX.

Determinism: PageRank is normally float arithmetic, whose sum order is
nondeterministic under shuffle.  Here every iteration is computed in
scaled 64-bit integers (rank scaled by 1e12, per-edge contribution =
``((pr * 85) div 100) div outdeg`` with integer floor division, new
rank = base + SUM of integer contributions).  Integer sums are
associative and order-free, so a DuckDB oracle that unrolls the same
five iterations as chained CTEs matches the distributed result
hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caching import tracked_persist
from ..catalog import load_table
from . import register

_SCALE = 1_000_000_000_000  # rank fixed-point scale (1e12)
_BASE = 150_000_000_000  # (1 - damping) * SCALE with damping = 0.85
_ITERS = 5

_PAGERANK_ORACLE_TEMPLATE = """
    WITH e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ), edges AS (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ), deg AS (
      SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY 1
    ), r0 AS (
      SELECT node, CAST({scale} AS BIGINT) AS pr FROM deg
    ){iters}
    SELECT node, pr FROM r{n}
"""


def _pagerank_oracle() -> str:
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(
            f""", r{i} AS (
      SELECT e.dst AS node,
             CAST({_BASE} + SUM(r.pr * 85 // 100 // d.outdeg) AS BIGINT) AS pr
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg d ON d.node = e.src
      GROUP BY 1
    )"""
        )
    return _PAGERANK_ORACLE_TEMPLATE.format(
        scale=_SCALE, iters="".join(steps), n=_ITERS
    )


@register("graph_pagerank_5iter", oracle=_pagerank_oracle())
def graph_pagerank_5iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five synchronous PageRank iterations over the symmetric
    part<->supplier graph (node ids disambiguated as 2k / 2k+1).

    Scale design: the edge+degree frame is computed once, persisted,
    and reused by all five iterations — each iteration is exactly one
    shuffle (join on src is shuffle-free on the edges side after the
    first iteration establishes the partitioning; the groupBy(dst)
    shuffle is the per-iteration cost, as in any Pregel superstep).
    The symmetric construction guarantees no dangling nodes, so no
    outer-join rank-redistribution step is needed.  Integer fixed-point
    keeps the result exactly reproducible across any partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    # one joined (src, dst, outdeg) frame, partitioned by src, reused 5x
    adj = tracked_persist(
        edges.join(deg, edges.src == deg.node)
        .select("src", "dst", "outdeg")
        .repartition("src"),
        StorageLevel.MEMORY_AND_DISK,
    )
    ranks = deg.select("node", F.lit(_SCALE).cast("long").alias("pr"))
    for _ in range(_ITERS):
        ranks = (
            adj.join(ranks, adj.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("((pr * 85) div 100) div outdeg").alias("contrib"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg((F.lit(_BASE) + F.sum("contrib")).cast("long").alias("pr"))
        )
    return ranks.select("node", "pr")


_TRI_ORACLE = """
    WITH pairs AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY 1
    ),
    oriented AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS u,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS v
      FROM pairs p
      JOIN deg du ON du.node = p.u
      JOIN deg dv ON dv.node = p.v
    ),
    tri AS (
      SELECT 1
      FROM oriented e1
      JOIN oriented e2 ON e2.u = e1.v
      JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT COUNT(*) AS n_triangles,
           (SELECT COUNT(*) FROM pairs) AS n_edges
    FROM tri
"""


@register("graph_triangle_count", oracle=_TRI_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase graph (parts appearing
    together in >= 2 orders) — the clustering-coefficient primitive,
    via the ordered two-path + closing-edge join: every triangle
    {a<b<c} is counted exactly once as path a->b->c closed by (a,c).

    Scale design: edges are ORIENTED from the lower-(degree, id)
    endpoint to the higher — the degeneracy trick that makes triangle
    counting survive power-law graphs: a hub's edges all point INTO
    it, so the two-path build fans out on forward-degree, which is
    O(sqrt(m)) per node regardless of raw degree. Each closing check
    is an equi-join on the oriented edge key; all three legs share the
    oriented edge frame (persisted once); no vertex ever enumerates
    its full undirected neighborhood squared."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE shuffle derives the per-order basket (collect_set ==
    # per-order distinct; TPC-H orders carry ≤7 lines); the exploded
    # frame keeps hashpartitioning(l_orderkey) from the aggregation,
    # so the pair self-join adds no exchange — same shape as
    # rec_item_cooccurrence
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    b = baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    right = b.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("pk2")
    )
    # pairs feeds BOTH the degree frame and the orientation join —
    # tracked-persist the (tiny) edge list so the basket pipeline over
    # lineitem runs once, not once per consumer
    pairs = tracked_persist(
        b.join(right, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pk2"))
        .groupBy(F.col("l_partkey").alias("u"), F.col("pk2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.struct("du", "u") < F.struct("dv", "v"))
    edges = tracked_persist(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("v"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    paths = edges.join(e2, edges.v == e2.b).select("u", "v", "c")
    closing = edges.select(
        F.col("u").alias("cu"), F.col("v").alias("cv")
    )
    tri = paths.join(
        closing, (paths.u == closing.cu) & (paths.c == closing.cv)
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(n_edges)


_REACH_ORACLE = """
    WITH RECURSIVE pairs AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v, COUNT(*) AS support
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    beam AS (
      SELECT u, v FROM (
        SELECT u, v,
               ROW_NUMBER() OVER (PARTITION BY u
                                  ORDER BY support DESC, v) AS rk
        FROM pairs
      ) WHERE rk <= 5
    ),
    reach(seed, node, depth) AS (
      SELECT u, u, 0 FROM beam WHERE u < 10
      UNION ALL
      SELECT r.seed, b.v, r.depth + 1
      FROM reach r JOIN beam b ON b.u = r.node
      WHERE r.depth < 3
    )
    SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS min_depth
    FROM reach GROUP BY 1, 2
"""


@register("graph_reachability_sql", oracle=_REACH_ORACLE)
def graph_reachability_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive co-purchase expansion via Spark 4's native
    WITH RECURSIVE (SQL-text surface): parts reachable within 3 hops
    of each low-id seed over the low->high oriented co-purchase graph
    — the 'customers also bought, transitively' recommendation
    expansion.

    Spark's recursive CTE only supports UNION ALL (no per-level
    dedup), so the expansion is BEAM-LIMITED: each node contributes
    only its 5 strongest-association forward neighbors, the graph is
    DAG-oriented (u < v), and depth is bounded — recursion provably
    terminates with path multiplicity <= seeds x 5^3 at ANY data
    scale, and multiplicity cancels in the MIN(depth) aggregate. (An
    uncapped frontier on a dense co-purchase graph exceeds the
    engine's recursion row limit — measured at the smallest SF.) Each
    recursive step is one equi-join + filter — a superstep per depth,
    like the DataFrame PageRank loop, but planned entirely by
    Catalyst's UnionLoop execution."""
    li = load_table(spark, sf_dir, "lineitem")
    li.select("l_orderkey", "l_partkey").createOrReplaceTempView(
        "_graph_lineitem"
    )
    return spark.sql(
        """
        WITH RECURSIVE pairs AS (
          SELECT a.l_partkey AS u, c.l_partkey AS v, COUNT(*) AS support
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM _graph_lineitem) a
          JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM _graph_lineitem) c
            ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        beam AS (
          SELECT u, v FROM (
            SELECT u, v,
                   ROW_NUMBER() OVER (PARTITION BY u
                                      ORDER BY support DESC, v) AS rk
            FROM pairs
          ) WHERE rk <= 5
        ),
        reach(seed, node, depth) AS (
          SELECT u, u, 0 FROM beam WHERE u < 10
          UNION ALL
          SELECT r.seed, b.v, r.depth + 1
          FROM reach r JOIN beam b ON b.u = r.node
          WHERE r.depth < 3
        )
        SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS min_depth
        FROM reach GROUP BY 1, 2
        """
    )


_CLUSTER_COEF_ORACLE = """
    WITH pairs AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY 1
    ),
    oriented AS (
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS u,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS v
      FROM pairs p
      JOIN deg du ON du.node = p.u
      JOIN deg dv ON dv.node = p.v
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM oriented e1
      JOIN oriented e2 ON e2.u = e1.v
      JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri_at AS (
      SELECT node, COUNT(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT d.node, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.d >= 2
                THEN round(CAST(2.0 * COALESCE(t.t, 0) AS DOUBLE)
                           / (d.d * (d.d - 1)), 6)
           END AS clustering_coef
    FROM deg d LEFT JOIN tri_at t ON t.node = d.node
    WHERE d.d >= 2
"""


@register("graph_clustering_coefficient", oracle=_CLUSTER_COEF_ORACLE)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient: 2T(v) / (d(v)(d(v)-1))
    over the co-purchase graph — how interconnected each node's
    neighborhood is (community-ness / spam-ring signal). Reuses the
    degeneracy-oriented triangle enumeration (each triangle credited
    to its three vertices via one explode) plus the degree frame; all
    double ops are one fixed-order expression over exact counts."""
    li = load_table(spark, sf_dir, "lineitem")
    # one-shuffle basket derivation (see graph_triangle_count)
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    b = baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    right = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("pk2"))
    # pairs feeds BOTH the degree frame and the orientation join —
    # tracked-persist the (tiny) edge list so the basket pipeline over
    # lineitem runs once, not once per consumer
    pairs = tracked_persist(
        b.join(right, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pk2"))
        .groupBy(F.col("l_partkey").alias("u"), F.col("pk2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    edges = tracked_persist(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("v"),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    paths = edges.join(e2, edges.v == e2.b).select("u", "v", "c")
    closing = edges.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    tri = paths.join(
        closing, (paths.u == closing.cu) & (paths.c == closing.cv)
    ).select("u", "v", "c")
    tri_at = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    coef = F.when(
        F.col("d") >= 2,
        F.round(
            (2.0 * F.coalesce(F.col("t"), F.lit(0))).cast("double")
            / (F.col("d") * (F.col("d") - 1)),
            6,
        ),
    )
    return (
        deg.join(tri_at, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            coef.alias("clustering_coef"),
        )
    )


_LINKPRED_ORACLE = """
    WITH pairs AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    adj AS (
      SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
    ),
    deg AS (
      SELECT u AS node, COUNT(*) AS d FROM adj GROUP BY 1
    ),
    mid AS (
      SELECT node FROM deg WHERE d <= 64
    ),
    wedges AS (
      SELECT a1.u AS a, a2.v AS c, COUNT(*) AS cn
      FROM adj a1
      JOIN mid m ON a1.v = m.node
      JOIN adj a2 ON a1.v = a2.u AND a1.u < a2.v
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT w.a, w.c, w.cn
      FROM wedges w
      LEFT JOIN pairs p ON p.u = w.a AND p.v = w.c
      WHERE p.u IS NULL AND w.cn >= 2
    )
    SELECT cand.a AS u, cand.c AS v, cand.cn AS common_neighbors,
           da.d AS deg_u, dc.d AS deg_v,
           CAST(cand.cn AS DOUBLE) / (da.d + dc.d - cand.cn) AS jaccard
    FROM cand
    JOIN deg da ON da.node = cand.a
    JOIN deg dc ON dc.node = cand.c
"""


@register("graph_link_prediction_jaccard", oracle=_LINKPRED_ORACLE)
def graph_link_prediction_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction over the co-purchase graph: for every
    NON-adjacent part pair with >= 2 common neighbors, the
    common-neighbor count and neighborhood Jaccard — the classic
    recommend-an-edge primitive (people-you-may-know / frequently-
    bought-together candidates).

    Scale design: candidate pairs come from the wedge join (two-hop
    paths through a shared neighbor), which fans out quadratically in
    the MID node's degree — so mid nodes are capped at degree <= 64
    (hubs contribute wedges through their spokes' other neighbors,
    not through themselves; the cap is deterministic and mirrored in
    the oracle, the standard mitigation in production link-prediction
    pipelines). The existing-edge removal is a broadcast-able
    anti-join on the (tiny relative to wedges) edge list; Jaccard is
    one double division over exact integer counts. The edge list is
    tracked-persisted once and feeds adjacency, degrees, and the
    anti-join."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    b = baskets.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    right = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("pk2"))
    pairs = tracked_persist(
        b.join(right, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pk2"))
        .groupBy(F.col("l_partkey").alias("u"), F.col("pk2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    adj = pairs.unionAll(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    mid = deg.filter(F.col("d") <= 64).select(F.col("node").alias("mid"))
    a1 = adj.select(F.col("u").alias("a"), F.col("v").alias("m"))
    a2 = adj.select(F.col("u").alias("m2"), F.col("v").alias("c"))
    wedges = (
        a1.join(mid, a1.m == mid.mid)
        .join(a2, (F.col("m") == F.col("m2")) & (F.col("a") < F.col("c")))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= 2)
    )
    cand = wedges.join(
        pairs,
        (wedges.a == pairs.u) & (wedges.c == pairs.v),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("deg_u"))
    dc = deg.select(F.col("node").alias("c"), F.col("d").alias("deg_v"))
    return (
        cand.join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("u"),
            F.col("c").alias("v"),
            F.col("cn").alias("common_neighbors"),
            "deg_u",
            "deg_v",
            (
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (teleport to a seed set)
# ---------------------------------------------------------------------------

_PPR_SEED_SQL = "(node % 2 = 1 AND (node // 2) % 10 = 0)"

_PPR_ORACLE_TEMPLATE = """
    WITH e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ), edges AS (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ), deg AS (
      SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY 1
    ), r0 AS (
      SELECT node,
             CAST(CASE WHEN {seed} THEN {scale} ELSE 0 END AS BIGINT) AS pr
      FROM deg
    ){iters}
    SELECT node, pr AS ppr,
           CAST(CASE WHEN {seed} THEN 1 ELSE 0 END AS INT) AS is_seed
    FROM r{n}
"""


def _ppr_oracle() -> str:
    steps = []
    for i in range(1, _ITERS + 1):
        seed_dst = _PPR_SEED_SQL.replace("node", "e.dst")
        steps.append(
            f""", r{i} AS (
      SELECT e.dst AS node,
             CAST(CASE WHEN {seed_dst} THEN {_BASE} ELSE 0 END
                  + SUM(r.pr * 85 // 100 // d.outdeg) AS BIGINT) AS pr
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg d ON d.node = e.src
      GROUP BY 1
    )"""
        )
    return _PPR_ORACLE_TEMPLATE.format(
        seed=_PPR_SEED_SQL, scale=_SCALE, iters="".join(steps), n=_ITERS
    )


def _ppr_seed(node) -> F.Column:
    return (node % 2 == 1) & ((node.cast("long") / F.lit(2)).cast("long") % 10 == 0)


@register("graph_personalized_pagerank", oracle=_ppr_oracle())
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (Jeh & Widom 2003 / the Pinterest
    Pixie-style seed-biased variant): the teleport mass lands only on
    a SEED SET — here every 10th supplier node — so the stationary
    scores measure proximity to the seeds, the primitive behind
    related-item retrieval and label propagation from a trusted
    whitelist (e.g. quality-seeded crawl ranking at corpus scale).

    Same scale design as graph_pagerank_5iter: one persisted
    (src, dst, outdeg) frame reused by all five supersteps, exactly one
    groupBy(dst) shuffle per iteration, integer fixed-point so any
    partitioning reproduces the hash. The seed membership is a pure
    expression on the node id — no extra join anywhere — and the base
    (teleport) term is CASEd per node instead of added uniformly;
    non-seed nodes receive rank only through edges."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    adj = tracked_persist(
        edges.join(deg, edges.src == deg.node)
        .select("src", "dst", "outdeg")
        .repartition("src"),
        StorageLevel.MEMORY_AND_DISK,
    )
    seed0 = F.when(_ppr_seed(F.col("node")), F.lit(_SCALE)).otherwise(F.lit(0))
    ranks = deg.select("node", seed0.cast("long").alias("pr"))
    for _ in range(_ITERS):
        base = F.when(_ppr_seed(F.col("node")), F.lit(_BASE)).otherwise(
            F.lit(0)
        )
        ranks = (
            adj.join(ranks, adj.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("((pr * 85) div 100) div outdeg").alias("contrib"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("c"))
            .select("node", (base + F.col("c")).cast("long").alias("pr"))
        )
    return ranks.select(
        "node",
        F.col("pr").alias("ppr"),
        _ppr_seed(F.col("node")).cast("int").alias("is_seed"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (bounded peeling rounds)
# ---------------------------------------------------------------------------

_KCORE_K = 20
_KCORE_ROUNDS = 5


def _kcore_oracle() -> str:
    steps = []
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f""", keep{i} AS (
      SELECT src AS node FROM e{i - 1}
      GROUP BY src HAVING COUNT(*) >= {_KCORE_K}
    ),
    e{i} AS (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN keep{i} a ON a.node = e.src
      JOIN keep{i} b ON b.node = e.dst
    )"""
        )
    return f"""
    WITH e0raw AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    e0 AS (
      SELECT src, dst FROM e0raw
      UNION ALL SELECT dst AS src, src AS dst FROM e0raw
    ){"".join(steps)}
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{_KCORE_ROUNDS}
    GROUP BY src
    """


@register("graph_kcore_membership", oracle=_kcore_oracle())
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k = 20, five synchronous rounds): repeatedly
    drop nodes with degree < k and the edges touching them — the
    standard dense-subgraph extractor (spam-farm detection, community
    cores, graph sparsification before expensive algorithms). Five
    rounds bound the work deterministically (the unroll is what lets a
    second engine replay the computation exactly); at the benched SF
    the first rounds genuinely peel low-degree nodes and the cascade
    stabilizes within the bound.

    Scale shape per round: one degree aggregation over surviving edges
    + two semi-join-shaped membership joins — the same
    one-shuffle-per-superstep discipline as PageRank; the edge set
    only ever SHRINKS, so round cost is monotonically decreasing."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    for _ in range(_KCORE_ROUNDS):
        # eager persist per round: each round references the edge frame
        # TWICE (degree agg + membership join), so an unpersisted chain
        # recomputes round 0 2^rounds times (measured 26 s -> ~3 s at
        # sf0.01) — the same per-round lineage truncation
        # connected_components uses
        edges = tracked_persist(edges)
        edges.count()
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        edges = (
            edges.join(keep.withColumnRenamed("node", "src"), "src")
            .join(
                keep.select(F.col("node").alias("dst")), "dst"
            )
            .select("src", "dst")
        )
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (bounded synchronous rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    rounds = []
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f""", v{i} AS (
      SELECT e.u AS node, l.label, COUNT(*) AS cnt
      FROM e JOIN lab{i - 1} l ON l.node = e.v
      GROUP BY e.u, l.label
    ),
    lab{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label) AS rn
        FROM v{i}
      ) WHERE rn = 1
    )"""
        )
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (
      SELECT l_orderkey FROM li GROUP BY l_orderkey HAVING COUNT(*) <= 100
    ),
    pairs AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM li a JOIN ok USING (l_orderkey) JOIN li c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
    ),
    e AS (
      SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
    ),
    lab0 AS (SELECT DISTINCT u AS node, u AS label FROM e)
    {"".join(rounds)}
    SELECT node, CAST(label AS BIGINT) AS community
    FROM lab{_LPA_ROUNDS}
    """


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the part co-purchase graph: every node starts as
    its own community and repeatedly adopts the label with the highest
    NEIGHBOR VOTE (co-purchase multiplicity = edge weight, so the vote
    is naturally weighted). Unlike connected components — which merges
    everything reachable — LPA finds DENSE regions, the structure a
    dedup/curation pass wants (families of templated near-identical
    docs, co-citation clusters). Three synchronous rounds, unrolled so
    a second engine can replay the computation exactly; ties break to
    the smallest label (the determinism knob asynchronous LPA lacks).

    Scale shape per round: one (node, label) vote aggregation (map-side
    combined) + one argmax reduction — the same one-shuffle-per-
    superstep discipline as PageRank/k-core; per-round lineage
    truncation via eager persist (unpersisted chains re-derive round 0
    exponentially, measured on k-core)."""
    from ..operators.dedup import cap_hot_buckets

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # hot-container cap (same discipline as every candidate generator):
    # pair emission is quadratic in container size, and TPC-H's 7-line
    # bound is a property of THIS schema, not of co-occurrence graphs
    li = cap_hot_buckets(li, ["l_orderkey"], 100)
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    pairs = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v")
    # collapse multiplicity into an integer weight ONCE: the vote join
    # below runs every round, and at co-occurrence-graph scale the
    # multiset of edge INSTANCES is many times the unique-edge count —
    # one upfront (u,v) aggregation makes each round's join input the
    # unique edges and the vote an equivalent SUM(w) (identical
    # integers to the COUNT(*) over instances, same oracle)
    # ONE hash exchange on u establishes the partitioning every round
    # reuses (guide §2.4 "two operations keyed the same way can share
    # one exchange"): hashpartitioning(u) satisfies the clustering of
    # BOTH the (u, v) weight aggregation here AND the per-round
    # (node=u, label) vote aggregation + (node) argmax below — each
    # round's plan is BroadcastHashJoin -> partial/final HashAggregate
    # -> local Sort -> SortAggregate with ZERO Exchange nodes
    # (verified on the executed plan), where the unpartitioned form
    # paid two shuffles per round (votes + argmax).
    edges = tracked_persist(
        pairs.unionAll(
            pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .repartition("u")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w")),
        StorageLevel.MEMORY_AND_DISK,
    )
    edges.count()
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.sum("w").alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("best")
            )
            .select("node", F.col("best.l").alias("label"))
        )
        # per-round eager persist — NOT for lineage fan-out this time
        # (each label frame has exactly one consumer, the next round's
        # vote join; the chain is linear) but for runtime statistics:
        # a materialized 1-row-per-node label frame has a KNOWN small
        # size, so every vote join broadcasts it instead of
        # sort-merge-shuffling the edge frame per round. Measured at
        # sf0.1: 7.7 s with per-round persist vs 10-11 s as one
        # unpersisted linear plan.
        #
        # BROADCAST CROSSOVER (the perf rationale above inverts at
        # extreme node counts): a 1-row-per-node frame outgrows any
        # broadcast threshold around ~100M nodes (16 bytes/row vs the
        # session's 64 MB autoBroadcast limit), where AQE falls back
        # to a sort-merge join — still CORRECT, costing one extra
        # edge shuffle per round (the labels side is tiny relative to
        # edges, so SMJ shuffle bytes ≈ edge bytes × rounds). Beyond
        # the crossover, keep the persist (statistics still help join
        # planning) and expect slope ∝ rounds × edges — measured
        # 10× edges → 1.80× time at sub-crossover scale.
        labels = tracked_persist(labels)
        labels.count()
    return labels.select("node", F.col("label").cast("long").alias("community"))
