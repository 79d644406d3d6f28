"""Schedule N table builders — the Spark equivalent of the reference's
hand-rolled Schedule N section (build_efile_database_functions.R:
2875-4140): one 1:1 header table and three per-node explode loops
(T01 liquidation :3189-3576, T02 disposition :3596-4008, T03
supplemental :4021-4134), all inside the ``if (SCHEDN)`` guard
(:2881).

Spec-driven from metadata/schedn_spec.json (derived by
tools/derive_990_metadata.py). Every row carries the reference's 12
denormalized header columns (EIN..URL, :3148-3160) computed with the
same CORE expressions (post-production-rule values, since the
reference's Sched N section runs after the scalar section).

Deliberate deviation (documented): the reference's anywhere-xpaths
(``//SupplementalInformationDetail``) also match *other* schedules'
same-named nodes; we scope every group to its concrete
IRS990ScheduleN path (the intended semantics; the spec's group list
is derived from the master concordance crosswalk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.concordance import load_schedn_spec
from ..sources.xml_source import build_return_schema
from .compiler import ExprCompiler
from .core_builder import compile_core_columns


def schedn_table_names() -> list[str]:
    return sorted(load_schedn_spec()["tables"])


def _header_exprs(c: ExprCompiler) -> list[Column]:
    spec = load_schedn_spec()
    core = compile_core_columns(c)
    return [core[v].alias(v) for v in spec["header"]]


def _rel_col(rel: str) -> Column:
    col: Column = F.col("_g")
    for seg in rel.split("/"):
        col = col[seg]
    return col


def build_schedn_table(returns: DataFrame, table_name: str) -> DataFrame:
    """returns (url, xml, doc, object_id) → the named SCHED-N table."""
    spec = load_schedn_spec()
    t = spec["tables"][table_name]
    _, builder = build_return_schema()
    c = ExprCompiler(builder)
    header = _header_exprs(c)
    header_names = list(spec["header"])

    # if (SCHEDN) guard (:2881): grepl on the serialized doc
    src = returns.filter(F.col("xml").contains("IRS990ScheduleN"))

    if t["cardinality"] == "ONE":
        cols = [
            c.coalesce_scalar(t["vars"][v]["xpaths"]).alias(v)
            for v in t["columns"]
        ]
        return src.select(*header, *cols)

    frames: list[DataFrame] = []
    for gp in t["groups"]:
        gcol, depth, _ = c._walk(gp)
        for _ in range(depth - 1):
            gcol = F.flatten(gcol)
        exploded = src.select(*header, F.explode(gcol).alias("_g"))
        cols = []
        for v in t["columns"]:
            members = [_rel_col(rel) for rel in t["vars"][v]["rels"]]
            merged = members[0] if len(members) == 1 else F.coalesce(*members)
            cols.append(merged.alias(v))
        frames.append(exploded.select(*[F.col(h) for h in header_names], *cols))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
