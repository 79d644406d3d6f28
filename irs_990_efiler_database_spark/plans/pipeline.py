"""Declarative multi-table pipeline runner (dbt-lite): a named DAG of
DataFrame-producing steps materialized as parquet tables with
fingerprint-based incremental re-runs.

The 990 build (``jobs.build_database``) is ONE hard-wired pipeline;
this is the generic engine users compose their own from: each step
declares its upstream dependencies and a version tag, steps run in
topological order, every output directory carries a fingerprint
(version ⊕ upstream fingerprints), and a re-run skips every step whose
fingerprint is unchanged — so editing one mid-DAG step rebuilds exactly
that step and its descendants, never the whole warehouse. The same
contract dbt/Dagster give at orchestration level, here at DataFrame
level with the engine's idempotent sinks underneath.

Scale notes: materialization uses ``sinks.write_table`` (dynamic
partition overwrite — a re-run of a step atomically replaces its own
output); step functions receive upstream tables as lazy DataFrames
read back from parquet, so a long DAG never holds more than the
current step's lineage in the planner.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..sinks import write_table

StepFn = Callable[[SparkSession, dict[str, DataFrame]], DataFrame]

_FP_FILE = "_pipeline_fingerprint.json"


@dataclass
class Step:
    fn: StepFn
    depends: tuple[str, ...] = ()
    partition_by: tuple[str, ...] = ()
    version: str = "1"


@dataclass
class RunResult:
    built: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    paths: dict[str, str] = field(default_factory=dict)


def _toposort(steps: dict[str, Step]) -> list[str]:
    order: list[str] = []
    state: dict[str, int] = {}

    def visit(name: str) -> None:
        if state.get(name) == 2:
            return
        if state.get(name) == 1:
            raise ValueError(f"pipeline cycle through {name!r}")
        if name not in steps:
            raise KeyError(f"unknown dependency {name!r}")
        state[name] = 1
        for dep in steps[name].depends:
            visit(dep)
        state[name] = 2
        order.append(name)

    for name in steps:
        visit(name)
    return order


def _fingerprint(name: str, step: Step, upstream_fps: list[str]) -> str:
    h = hashlib.sha256()
    h.update(name.encode())
    h.update(step.version.encode())
    h.update(",".join(step.partition_by).encode())
    for fp in upstream_fps:
        h.update(fp.encode())
    return h.hexdigest()


def run_pipeline(
    spark: SparkSession,
    out_root: str,
    steps: dict[str, Step],
    force: bool = False,
) -> RunResult:
    """Materialize the DAG under ``out_root/<step name>``; steps whose
    fingerprint (version ⊕ upstream fingerprints) already matches the
    on-disk marker are skipped — their downstream consumers read the
    existing parquet."""
    root = Path(out_root)
    root.mkdir(parents=True, exist_ok=True)
    res = RunResult()
    fps: dict[str, str] = {}
    for name in _toposort(steps):
        step = steps[name]
        fp = _fingerprint(name, step, [fps[d] for d in step.depends])
        fps[name] = fp
        out = root / name
        marker = out / _FP_FILE
        res.paths[name] = str(out)
        if not force and marker.exists():
            try:
                on_disk = json.loads(marker.read_text())["fingerprint"]
            except (ValueError, KeyError):
                on_disk = None
            if on_disk == fp:
                res.skipped.append(name)
                continue
        inputs = {
            d: spark.read.parquet(res.paths[d]) for d in step.depends
        }
        df = step.fn(spark, inputs)
        write_table(df, str(out), partition_by=step.partition_by or None)
        marker.write_text(json.dumps({"fingerprint": fp, "step": name}))
        res.built.append(name)
    return res


def read_step(spark: SparkSession, out_root: str, name: str) -> DataFrame:
    return spark.read.parquet(str(Path(out_root) / name))
