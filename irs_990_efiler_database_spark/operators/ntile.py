"""Distributed exact global ranking and NTILE — retires the
single-partition ``Window.orderBy(...)`` (no partitionBy) pattern.

``F.row_number().over(Window.orderBy(...))`` funnels the entire input
through ONE task — the classic scale-killer (flagged as the r4
global-NTILE family). The distributed equivalent here is the textbook
two-pass rank:

1. ``repartitionByRange`` on the total order — each partition holds a
   contiguous, disjoint key range, and partition *i*'s range sorts
   before partition *i+1*'s (RangePartitioner invariant);
2. per-partition local ``row_number`` (windows partitioned by the
   Spark partition id — all partitions rank in parallel);
3. per-partition row counts (a #partitions-row frame) prefix-summed on
   the driver-side-tiny frame and broadcast-joined back as offsets.

global_rank = offset(partition) + local_rank. Exact, deterministic
(callers must include a unique tiebreak in ``order_cols``), and no
operator ever sees more than one partition's rows.

``exact_ntile`` applies the SQL NTILE(n) assignment rule to that rank:
the first ``total mod n`` tiles get ``ceil(total/n)`` rows, the rest
``floor(total/n)`` — bit-identical to ``F.ntile``/DuckDB ``NTILE``
under the same total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "__gr_pid"
_LRN = "__gr_lrn"
_OFF = "__gr_off"
_CNT = "__gr_cnt"
_TOT = "__gr_tot"


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = exact 1-based global row number under the
    total order ``order_cols`` (include a unique tiebreak for
    determinism), computed without any single-partition window.

    Also carries a ``__gr_tot`` total-row-count column (consumed by
    ``exact_ntile``; dropped from public output by callers).

    Cost: ONE range shuffle of the input + a broadcast join against
    the #partitions-row offset frame (plus the tiny (pid, count)
    aggregation). The local rank needs no window at all: after
    ``sortWithinPartitions`` on the total order,
    ``monotonically_increasing_id`` encodes (partition id << 33 |
    row index) — pid and 1-based local rank decode with shifts, so
    the pid-hash exchange a ``Window.partitionBy(pid)`` would force
    never happens. Exactness does not depend on where the range
    sampler puts partition boundaries: offset(pid) + local_rank is
    the global rank under the total order for ANY contiguous
    partitioning, so the result is partitioning-invariant."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # one nondeterministic mid column (CollapseProject never inlines
    # nondeterministic expressions, so pid/lrn decode the SAME value)
    #
    # tracked_persist: the offsets branch below and the probe-side
    # join BOTH contain this range shuffle. They are structurally
    # different after column pruning, so Spark may NOT reuse one
    # exchange between them — and RangePartitioning re-SAMPLES its
    # boundaries per execution. When ``df`` sits on top of a shuffle
    # (any aggregate input), the shuffle's partition-internal row
    # order is nondeterministic across executions, so two samplings
    # can pick DIFFERENT boundaries: the counts branch then describes
    # a different partitioning than the rows being ranked, and
    # offset(pid) + local_rank silently mis-ranks (observed in-repo:
    # 13k/15k wrong prefix sums on an aggregated levels frame at
    # sf0.01). Persisting the ranked frame pins ONE materialized
    # partitioning that both branches read; eviction-recompute replays
    # the same shuffle dependency (boundaries are fixed when the
    # cached RDD's stage is created), so consistency survives memory
    # pressure. Cost: one MEMORY_AND_DISK copy of the ranked columns
    # for the duration of the query (released under the
    # caching.tracked_persist contract).
    from ..caching import tracked_persist

    local = tracked_persist(
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__gr_mid", F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col("__gr_mid"), 33))
        .withColumn(
            _LRN,
            F.col("__gr_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1),
        )
        .drop("__gr_mid"),
        StorageLevel.MEMORY_AND_DISK,
    )
    # offsets: counts per pid, prefix-summed over the tiny pid frame
    # (bounded by num_partitions rows — the one safe ordered window)
    # coalesce(1) (not an Exchange): CoalesceExec with one partition
    # reports SinglePartition output partitioning, so the prefix-sum
    # window below needs NO SinglePartition shuffle — the lone task
    # just reads the #partitions pre-aggregated rows
    counts = (
        local.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT)).coalesce(1)
    )
    # bounded-window: counts has exactly #partitions rows
    wall = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        _PID,
        # bounded-window: prefix sum over the #partitions-row frame
        (F.sum(_CNT).over(Window.orderBy(_PID)) - F.col(_CNT)).alias(_OFF),
        F.sum(_CNT).over(wall).alias(_TOT),
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRN)).cast("long"))
        .drop(_PID, _LRN, _OFF, _CNT)
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integral division (SQL ``div``) — never double ``/``,
    whose 53-bit mantissa mis-assigns boundary ranks near 2^53."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def ntile_of_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) tile for a 1-based ``rank`` out of ``total`` rows:
    the first ``total % n`` tiles take ``total div n + 1`` rows, the
    remainder ``total div n`` (ANSI / Spark / DuckDB NTILE rule).
    Integer-exact: all arithmetic is long ``div``/``%``; the
    ``low = 0`` case (total < n, every rank in a big tile) is guarded
    explicitly rather than by lazy CASE evaluation."""
    low = _idiv(total, F.lit(n))  # base tile size (0 when total < n)
    rem = total % n  # tiles that take one extra row
    cut = rem * (low + 1)  # last rank inside the big tiles
    big = _idiv(rank - 1, low + 1) + 1
    small = rem + _idiv(rank - 1 - cut, F.greatest(low, F.lit(1))) + 1
    return F.when(rank <= cut, big).otherwise(small).cast("long")


def exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[Column | str],
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = NTILE(n) OVER (ORDER BY order_cols), computed
    distributedly: global rank via ``global_row_number`` + the closed-
    form tile assignment. Bit-identical to the single-partition
    ``F.ntile`` under the same (deterministic) total order."""
    rn = "__gr_rank"
    ranked = global_row_number(df, order_cols, rn, num_partitions)
    return ranked.withColumn(
        out_col, ntile_of_rank(F.col(rn), F.col(_TOT), n)
    ).drop(rn, _TOT)


def exact_weighted_ntile(
    df: DataFrame,
    n: int,
    weight_col: str,
    order_cols: list[Column | str],
    out_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Equal-WEIGHT sharding: cut the ordered rows into ``n`` shards of
    (as close as possible) equal total ``weight_col`` — the
    equal-token corpus split a training pipeline needs (equal-DOC
    ntile gives wildly uneven token shards when document lengths are
    skewed).

    Rule (exact, integer-only, engine-portable):
    ``shard = (cum_weight_exclusive * n) div total_weight`` under the
    total order — a row starts a new shard exactly when the weight
    before it crosses the next 1/n boundary. Distributed the same way
    as ``global_row_number``: range repartition on the order, local
    running weight per range partition, per-partition weight sums
    prefix-summed and broadcast back as offsets. No unbounded window.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = F.col(weight_col).cast("long")
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    # tracked_persist: pins ONE materialized range partitioning for
    # both the offsets branch and the final join — see the boundary-
    # consistency note in global_row_number (the two branches do not
    # reliably share an exchange after column pruning, and range
    # boundaries re-sample per execution over shuffle-ordered input)
    from ..caching import tracked_persist

    running = tracked_persist(
        ranged.withColumn(
            "__gw_cum",
            F.sum(w).over(
                Window.partitionBy(_PID)
                .orderBy(*cols)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    # coalesce(1): SinglePartition without an Exchange (see above)
    counts = running.groupBy(_PID).agg(F.sum(w).alias(_CNT)).coalesce(1)
    # bounded-window: counts has exactly #partitions rows
    wall = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        _PID,
        # bounded-window: prefix sum over the #partitions-row frame
        (F.sum(_CNT).over(Window.orderBy(_PID)) - F.col(_CNT)).alias(_OFF),
        F.sum(_CNT).over(wall).alias(_TOT),
    )
    cume_excl = F.col(_OFF) + F.col("__gw_cum") - w
    return (
        running.join(F.broadcast(offsets), _PID)
        .withColumn("__gw_num", (cume_excl * n).cast("long"))
        .withColumn(
            out_col,
            # exact integer division (`div`), never double `/` — the
            # boundary rows land identically in every engine; an
            # all-zero-weight frame (total = 0) degrades to shard 0
            # instead of an ANSI divide-by-zero
            F.when(F.col(_TOT) == 0, F.lit(0).cast("long")).otherwise(
                F.least(
                    F.lit(n - 1).cast("long"),
                    F.expr(f"__gw_num div {_TOT}").cast("long"),
                )
            ),
        )
        .drop(_PID, _OFF, _CNT, _TOT, "__gw_cum", "__gw_num")
    )


def global_running_sum(
    df: DataFrame,
    weight_col: str,
    order_cols: list[Column | str],
    out_col: str = "cum",
    total_col: str | None = None,
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = exact global running sum of ``weight_col``
    under the total order ``order_cols`` (include a unique tiebreak),
    without any single-partition window — the distributed prefix-sum
    primitive behind rank statistics (Mann-Whitney tie blocks), CDF
    tables, and equal-weight sharding.

    ``inclusive=False`` yields the EXCLUSIVE prefix (sum of strictly
    preceding rows). ``total_col`` (optional) additionally attaches
    the grand total to every row. Same machinery and invariance
    argument as ``exact_weighted_ntile``: one range shuffle, local
    running sums per contiguous range partition, a #partitions-row
    offset frame prefix-summed and broadcast back. Weights accumulate
    in long arithmetic — associative and order-free.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = F.col(weight_col).cast("long")
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    # tracked_persist: boundary consistency across the offsets branch
    # and the final join (see global_row_number)
    from ..caching import tracked_persist

    running = tracked_persist(
        ranged.withColumn(
            "__gs_cum",
            F.sum(w).over(
                Window.partitionBy(_PID)
                .orderBy(*cols)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ),
        StorageLevel.MEMORY_AND_DISK,
    )
    # coalesce(1): SinglePartition without an Exchange (see above)
    counts = running.groupBy(_PID).agg(F.sum(w).alias(_CNT)).coalesce(1)
    # bounded-window: counts has exactly #partitions rows
    wall = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        _PID,
        # bounded-window: prefix sum over the #partitions-row frame
        (F.sum(_CNT).over(Window.orderBy(_PID)) - F.col(_CNT)).alias(_OFF),
        F.sum(_CNT).over(wall).alias(_TOT),
    )
    cum = F.col(_OFF) + F.col("__gs_cum")
    if not inclusive:
        cum = cum - w
    out = (
        running.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, cum.cast("long"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOT))
    return out.drop(_PID, _OFF, _CNT, _TOT, "__gs_cum")
