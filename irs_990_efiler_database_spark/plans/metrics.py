"""Post-execution SQL-metrics extraction — the runtime half of
"measure, don't guess".

``PLANS.md`` audits the STATIC plan (how many Exchanges the optimizer
planned); this module reads what actually HAPPENED: after an action,
every physical node's SQLMetrics (shuffle bytes written, spill size,
output rows, peak memory) are walked out of the executed plan —
through AQE's AdaptiveSparkPlan/QueryStage wrappers, which hide the
final plan from a naive ``children()`` traversal. The summary is what
a perf review actually asks: did this query shuffle, how much, and did
anything spill?
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def _children(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        # the final (re-planned) tree lives behind executedPlan()
        return [node.executedPlan()]
    if "QueryStage" in name:
        return [node.plan()]
    c = node.children()
    return [c.apply(i) for i in range(c.length())]


def execution_metrics(df: DataFrame) -> list[tuple[str, dict[str, int]]]:
    """(node name, {metric: value}) for every node of the EXECUTED
    plan — run an action on ``df`` first, or all values are zero."""
    out: list[tuple[str, dict[str, int]]] = []

    def walk(node) -> None:
        m = node.metrics()
        it = m.iterator()
        mm: dict[str, int] = {}
        while it.hasNext():
            kv = it.next()
            mm[kv._1()] = kv._2().value()
        out.append((node.nodeName(), mm))
        for ch in _children(node):
            walk(ch)

    walk(df._jdf.queryExecution().executedPlan())
    return out


@dataclass
class MetricsSummary:
    n_exchanges: int
    shuffle_bytes_written: int
    shuffle_records_written: int
    spill_bytes: int
    scan_output_rows: int
    result_rows: int


def summarize_execution(df: DataFrame) -> MetricsSummary:
    """The perf-review headline numbers for an already-executed frame."""
    nodes = execution_metrics(df)
    n_ex = sum(1 for n, _ in nodes if n == "Exchange")
    sb = sum(m.get("shuffleBytesWritten", 0) for n, m in nodes if n == "Exchange")
    sr = sum(
        m.get("shuffleRecordsWritten", 0) for n, m in nodes if n == "Exchange"
    )
    spill = sum(m.get("spillSize", 0) for _, m in nodes)
    scan_rows = sum(
        m.get("numOutputRows", 0)
        for n, m in nodes
        if n in ("Scan parquet", "FileScan parquet", "Range", "ColumnarToRow")
        and n != "ColumnarToRow"
    )
    result_rows = next(
        (
            m["numOutputRows"]
            for _, m in nodes
            if "numOutputRows" in m
        ),
        0,
    )
    return MetricsSummary(
        n_exchanges=n_ex,
        shuffle_bytes_written=sb,
        shuffle_records_written=sr,
        spill_bytes=spill,
        scan_output_rows=scan_rows,
        result_rows=result_rows,
    )


def observe_quality(
    df: DataFrame, cols: list[str], name: str = "quality"
):
    """Attach in-flight data-quality metrics to a plan: row count plus
    per-column null counts, collected DURING whatever action consumes
    the frame (a sink write, an aggregation) — zero extra scan, unlike
    a separate validation pass over the table. This is the
    ``Dataset.observe`` accumulator surface; at cluster scale the
    metrics ride the task-completion path, costing nothing.

    Returns (observed_df, observation); read ``observation.get`` after
    the action completes."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    return df.observe(obs, *metrics), obs
