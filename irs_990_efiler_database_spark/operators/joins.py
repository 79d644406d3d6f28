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
) -> DataFrame:
    """Left as-of join: every left row + the most recent right payload
    with ``right.ts <= left.ts`` per key group (NULLs if none)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *keys, ts_col, *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols]
    ).withColumn("_side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in payload_cols
    ]
    carried.append(
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias(f"{prefix}{ts_col}")
    )
    out_cols = [c for c in lt.columns if c != "_side"]
    return (
        u.select(*out_cols, "_side", *[c for c in carried])
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
