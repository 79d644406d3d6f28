"""Mergeable distinct-count sketch (KMV / bottom-k).

The reference has no sketch surface at all — its cardinality questions
are exact R ``table()``/``unique()`` passes over in-memory frames
(build_efile_database_functions.R). At 100 TB an exact
``COUNT(DISTINCT key)`` shuffles every distinct key; the KMV
(k-minimum-values) sketch answers the same question with one map-side
pass that keeps only the k smallest *distinct* hash values per
partition plus a k-row merge — the classic bottom-k estimator
(Bar-Yossef et al. 2002; the same family Spark's own HLL++
``approx_count_distinct`` belongs to). Unlike HLL the KMV synopsis is
exactly reproducible across engines, which is why it can sit under the
repo's DuckDB hash gate: estimate = (k-1) / h_k with h_k the k-th
smallest hash normalized into (0, 1].

Hashing is the portable md5-prefix trick shared with the dedup
operators (operators/dedup.py): the first 15 hex chars = 60 bits,
byte-identical in Spark and DuckDB, so the sketch *contents* — not
just the estimate — match cross-engine.

Scale shape: stage 1 is mapInPandas over whatever partitioning the
scan produced (no shuffle, numpy unique + slice per Arrow batch,
carrying at most k longs per partition); stage 2 moves n_partitions*k
longs to one task and reduces them the same way. On a 1000-executor
cluster that merge input is ~1000*k*8 bytes — kilobytes — the
treeAggregate shape without leaving the DataFrame API. The sketch is
trivially mergeable across days/tables: union the bottom-k frames and
re-reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_POW_60 = float(1 << 60)  # hash domain size: 15 hex chars = 60 bits


def kmv_hash(col: Column) -> Column:
    """60-bit md5-prefix hash, identical in Spark and the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _bottom_k_mapper(k: int):
    def mapper(batches):
        import numpy as np
        import pandas as pd

        best = None
        for pdf in batches:
            u = np.unique(pdf["h"].to_numpy())  # sorted distinct
            merged = u if best is None else np.concatenate([best, u])
            best = np.unique(merged)[:k]
        if best is not None and best.size:
            yield pd.DataFrame({"h": best})

    return mapper


def kmv_bottom_k(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``col`` — the KMV
    synopsis itself, as a k-row DataFrame (column ``h``)."""
    hashed = df.select(kmv_hash(F.col(col)).alias("h"))
    partials = hashed.mapInPandas(_bottom_k_mapper(k), "h long")
    # n_partitions * k longs -> one task; the reduce is the same mapper
    return partials.repartition(1).mapInPandas(_bottom_k_mapper(k), "h long")


def kmv_merge(k: int, *synopses: DataFrame) -> DataFrame:
    """Merge KMV synopses (the sketch's defining property): the
    bottom-k of a union of sets equals the bottom-k of the union of
    the sets' bottom-k synopses. Input is a few k-row frames, so the
    merge is one k*len(synopses)-row task."""
    merged = synopses[0]
    for s in synopses[1:]:
        merged = merged.unionAll(s)
    return merged.repartition(1).mapInPandas(_bottom_k_mapper(k), "h long")


def kmv_estimate(synopsis: DataFrame, k: int) -> DataFrame:
    """(k_held, kth_hash, est_distinct) from a KMV synopsis.

    If fewer than k distinct hashes exist the synopsis IS the exact
    distinct set, so the estimate is the exact count; otherwise the
    bottom-k estimator (k-1)/normalized(h_k)."""
    return synopsis.agg(
        F.count("h").alias("k_held"), F.max("h").alias("kth_hash")
    ).select(
        "k_held",
        "kth_hash",
        F.when(F.col("k_held") < k, F.col("k_held").cast("double"))
        .otherwise(
            (F.col("k_held") - 1).cast("double")
            / (F.col("kth_hash").cast("double") / F.lit(TWO_POW_60))
        )
        .alias("est_distinct"),
    )


def local_heavy_hitter_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition heavy-hitter candidates: items whose LOCAL
    frequency is >= local_n/k.

    Pigeonhole guarantee: an item with global frequency >= n/k must
    have local frequency >= n_p/k in at least one partition (if it were
    below the threshold everywhere, summing gives < n/k). The union of
    local candidates is therefore a guaranteed superset of the global
    heavy hitters — false positives possible, false negatives not —
    and the exact recount stage removes the false positives. Per-batch
    counting is vectorized (pandas value_counts); per-partition state
    is one counter per locally-frequent item. A production variant
    bounds that state with Misra-Gries eviction at the same guarantee;
    the fixture vocabularies make the exact local dict the simpler
    honest choice here."""

    def mapper(batches):
        import pandas as pd

        counts: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for v, c in pdf[col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        if not n:
            return
        thr = n / k
        cand = [v for v, c in counts.items() if c >= thr]
        if cand:
            yield pd.DataFrame({col: cand})

    return df.select(col).mapInPandas(mapper, df.select(col).schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> tuple[DataFrame, int]:
    """(exact heavy hitters with freq >= n/k, total n).

    Plan shape: one map-side candidate pass (no shuffle), one count,
    then a recount whose shuffle carries ONLY rows matching the
    broadcast candidate set — at 100 TB the full-vocabulary shuffle of
    a plain groupBy never happens; what shuffles is bounded by
    (candidates x partitions). The final filter makes the output
    independent of partition layout: exactly the items a direct
    GROUP BY ... HAVING would return."""
    src = df.select(col)
    cand = local_heavy_hitter_candidates(src, col, k).distinct()
    total = src.count()
    out = (
        src.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= total / float(k))
    )
    return out, total


def kmv_bottom_k_grouped(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV synopses: (group, h) rows holding each group's k
    smallest distinct hashes.

    Two-phase shape — the manual map-side combine Python aggregates
    don't get for free: stage 1 reduces every scan partition to at most
    k hashes PER GROUP PER PARTITION (mapInPandas, one np.unique per
    group per batch), so the only shuffle carries n_partitions*k longs
    per group instead of every raw row; stage 2 merges per group with
    applyInPandas. The result feeds the same estimator as the global
    sketch."""

    def partial(batches):
        import numpy as np
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, sort=False):
                u = np.unique(sub["h"].to_numpy())[:k]
                prev = acc.get(g)
                acc[g] = u if prev is None else np.unique(
                    np.concatenate([prev, u])
                )[:k]
        for g, u in acc.items():
            yield pd.DataFrame({group_col: [g] * len(u), "h": u})

    def merge(key, pdf):
        import numpy as np
        import pandas as pd

        u = np.unique(pdf["h"].to_numpy())[:k]
        return pd.DataFrame({group_col: [key[0]] * len(u), "h": u})

    gtype = dict(df.dtypes)[group_col]
    schema = f"{group_col} {gtype}, h long"
    hashed = df.select(group_col, kmv_hash(F.col(col)).alias("h"))
    partials = hashed.mapInPandas(partial, schema)
    return partials.groupBy(group_col).applyInPandas(merge, schema)


def hll_distinct(
    df, col: str, lgk: int = 12, group_by: list[str] | None = None
):
    """HyperLogLog distinct-count via Spark's native DataSketches
    aggregate (``hll_sketch_agg``) — the constant-memory counterpart
    of the exact-under-oracle KMV family above. Where KMV ships ≤ k
    hashed longs per group, HLL ships a fixed 2^lgk-register sketch
    with ~1.04/sqrt(2^lgk) relative error, and sketches are mergeable
    (``hll_union_agg``) across partitions, days, or tables — the
    'count distinct users per day, then roll up the month WITHOUT
    rescanning' primitive. JVM-side the whole way; no oracle can
    replay the estimator bit-for-bit, so the contract is pinned by
    error-bound and merge tests instead (tests/test_sketch.py)."""
    from pyspark.sql import functions as F

    agg = F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lgk))).alias(
        f"{col}_distinct_est"
    )
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def hll_merge_estimate(sketches, sketch_col: str):
    """Merge pre-aggregated HLL sketches (one row per shard/day) into
    a single distinct estimate — the rollup read path."""
    from pyspark.sql import functions as F

    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            "distinct_est"
        )
    )
