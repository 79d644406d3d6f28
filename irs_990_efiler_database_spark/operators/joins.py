"""Join operators Spark lacks as built-ins (SURVEY §2.3 engine
surface): as-of join.

``asof_join`` matches each left row with the latest right row at or
before its timestamp within the same keys — implemented as
union + window (tag sides, sort by (ts, side) so right rows at equal
timestamps sort first, carry the last non-null right payload forward,
keep left rows). This is the SCALE implementation: one shuffle on the
join keys, linear window scan — no range join, no per-row subquery,
no broadcast requirement on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    prefix: str = "asof_",
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the most recent right payload
    with ``right.ts <= left.ts`` per key group (NULLs if none).

    ``tie_col`` pins the pick among EQUAL-timestamp right rows to the
    lowest tie value (they sort tie-descending so ``last`` lands on
    the minimum) — without it that pick is shuffle-order-dependent,
    which is fine for data with unique (key, ts) but flaps any exact
    comparison the moment duplicates appear. Mirrors
    ``asof_join_forward``'s mandatory tie column."""
    lt = left.withColumn("_side", F.lit(1))
    # Carry the whole matched right row as ONE struct: carrying each
    # payload column independently would stitch values from different
    # right rows whenever the newest row has a NULL in one column —
    # not as-of semantics. The struct itself is never NULL on a right
    # row (even if every payload field is), so last(ignorenulls) always
    # picks the newest right ROW, and all fields unpack from it.
    rt = right.select(
        *keys,
        ts_col,
        *([F.col(tie_col).alias("_tie")] if tie_col else []),
        F.struct(
            F.col(ts_col).alias("__asof_ts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_asof_row"),
    ).withColumn("_side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tie_col:
        # left rows carry NULL _tie; desc_nulls_last keeps them after
        # right rows only within equal (ts, _side) groups they never
        # share, so only right-vs-right ordering is affected
        order.append(F.col("_tie").desc_nulls_last())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_asof_row", ignorenulls=True).over(w)
    out_cols = [c for c in lt.columns if c != "_side"]
    return (
        u.select(*out_cols, "_side", matched.alias("_m"))
        .filter(F.col("_side") == 1)
        .select(
            *out_cols,
            *[F.col("_m")[c].alias(f"{prefix}{c}") for c in payload_cols],
            F.col("_m.__asof_ts").alias(f"{prefix}{ts_col}"),
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    tie_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Forward as-of join: every left row + the EARLIEST right row with
    ``right.ts >= left.ts`` per key group (NULLs if none) — the
    "next event after" direction the backward join can't express.

    Same union+window scale shape as ``asof_join`` (one shuffle on the
    keys, linear scan, no range join): sides are tagged so a right row
    at the exact left timestamp sorts AFTER the left row (>= includes
    it), the first non-null right struct over (current row, unbounded
    following) is the match, and ``tie_col`` makes the pick among
    equal-timestamp right rows deterministic — required for the exact
    oracle comparison, where the mirror is ORDER BY ts, tie LIMIT 1."""
    lt = left.withColumn("_side", F.lit(0))
    rt = right.select(
        *keys,
        ts_col,
        F.col(tie_col).alias("_tie"),
        F.struct(
            F.col(ts_col).alias("__asof_ts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_asof_row"),
    ).withColumn("_side", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side", F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = F.first("_asof_row", ignorenulls=True).over(w)
    out_cols = [c for c in lt.columns if c != "_side"]
    return (
        u.select(*out_cols, "_side", matched.alias("_m"))
        .filter(F.col("_side") == 0)
        .select(
            *out_cols,
            *[F.col("_m")[c].alias(f"{prefix}{c}") for c in payload_cols],
            F.col("_m.__asof_ts").alias(f"{prefix}{ts_col}"),
        )
    )


class JoinExplosionError(RuntimeError):
    """Raised when a guarded join's exact output cardinality exceeds
    the configured cap."""


def guarded_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    max_output_rows: int = 100_000_000,
) -> DataFrame:
    """Equi-join with a cardinality guard: before executing, compute
    the EXACT output size per join type from the two key-count frames
    (two key-count aggregations + a tiny full-outer key join —
    shuffles only (key, count) pairs), and refuse with
    JoinExplosionError if it exceeds ``max_output_rows``.

    Per-type exact cardinality over matched/unmatched key groups:
    inner = Σ ln·rn; left adds Σ ln over right-unmatched keys; right
    adds Σ rn over left-unmatched keys; full adds both; semi/anti are
    bounded by |left| and never explode, so they skip the probe.

    This is the production guardrail against the classic silent
    blow-up (an unexpected many-to-many key like NULL-ish sentinels or
    a duplicated dimension row) that otherwise only surfaces as an
    executor OOM three hours into a 100 TB run. Cost: one extra pass
    over each side's key columns; the data rows themselves are not
    shuffled until the join is approved."""
    norm = how.lower().replace("outer", "").strip("_") or "full"
    # bare "outer" is Spark's alias for FULL OUTER — normalizing it to
    # "" and treating that as inner would skip both unmatched terms
    if norm in ("semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        return left.join(right, on, how)  # output ≤ |left| rows
    if norm not in ("inner", "left", "right", "full"):
        # a typo ('lefy') or cross join must not silently fall through
        # to the inner-join estimate — the guard would under-count
        raise ValueError(
            f"guarded_join: unsupported join type {how!r} "
            "(inner/left/right/full/semi/anti)"
        )
    lc = left.groupBy(*on).agg(F.count(F.lit(1)).alias("_ln"))
    rc = right.groupBy(*on).agg(F.count(F.lit(1)).alias("_rn"))
    both = lc.join(rc, on, "full_outer")
    inner = F.sum(F.col("_ln") * F.col("_rn"))
    left_only = F.sum(F.when(F.col("_rn").isNull(), F.col("_ln")))
    right_only = F.sum(F.when(F.col("_ln").isNull(), F.col("_rn")))
    terms = F.coalesce(inner, F.lit(0))
    if norm in ("left", "full"):
        terms = terms + F.coalesce(left_only, F.lit(0))
    if norm in ("right", "full"):
        terms = terms + F.coalesce(right_only, F.lit(0))
    est = both.agg(terms.alias("n")).collect()[0]["n"] or 0
    if est > max_output_rows:
        raise JoinExplosionError(
            f"{how} join on {on} would produce {est} rows "
            f"(cap {max_output_rows}); check key uniqueness"
        )
    return left.join(right, on, how)
