"""Generic concordance-driven table builder — the Spark equivalent of
the reference's ``build_rdb_table`` (+ find_group_names/get_var_map/
get_table, build_efile_database_functions.R:121-276).

For a target table named in the concordance:

- ONE-cardinality  → one row per return; each variable is a
  multi-version coalesce (buildPartVII :4161-4414 / buildSchedJ
  :4424-4915 shape). Schedule-scoped tables are guarded on schedule
  presence (:4428).
- MANY-cardinality → explode each repeating-group root (the roots are
  inferred from the concordance by first-divergent-segment, :121-134),
  extract each group member's leaves via the leaf→variable map
  (:141-151), and union the per-root frames by name (ragged bind_rows
  semantics, :5109-5122).

Every row carries the reference's six denormalized keys
OBJECT_ID, EIN, NAME, TAXYR, FORMTYPE, URL (:269-270).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.concordance import (
    concrete_groups,
    load_core_spec,
    schedule_guard,
    table_rows,
)
from ..plans.xml_schema import resolve_child
from ..sources.xml_source import build_return_schema
from .compiler import ExprCompiler

KEY_COLS = ("OBJECT_ID", "EIN", "NAME", "TAXYR", "FORMTYPE", "URL")


def _key_exprs(c: ExprCompiler) -> list[Column]:
    core = load_core_spec()["vars"]
    return [
        F.col("object_id").alias("OBJECT_ID"),
        c.coalesce_scalar(core["EIN"]["xpaths"]).alias("EIN"),
        c.coalesce_scalar(core["NAME"]["xpaths"]).alias("NAME"),
        c.coalesce_scalar(core["FISYR"]["xpaths"]).alias("TAXYR"),
        c.coalesce_scalar(core["FORMTYPE"]["xpaths"]).alias("FORMTYPE"),
        F.col("url").alias("URL"),
    ]


_INT_SUFFIXES = ("Amt", "Cnt", "Nbr", "Qty")


def _typed(
    col: Column, data_type: str, typed: bool, leaves: tuple[str, ...] = ()
) -> Column:
    """Typed-mode cast (SURVEY §1.3 upgrade): concordance ``numeric``
    splits by XSD leaf convention — Amt/Cnt/Nbr are integral, the rest
    (hours, rates: AverageHoursPerWeek '40.0') are double.

    ``try_cast``, not ``cast``: under Spark 4's default ANSI mode a
    plain cast THROWS on any filing whose field doesn't parse (stray
    text in an Amt, malformed date), failing the whole build; try_cast
    degrades the one value to NULL — the reference's as.numeric
    coercion semantics."""
    if not typed:
        return col
    if data_type == "numeric":
        if any(lf.endswith(_INT_SUFFIXES) for lf in leaves):
            return col.try_cast("long")
        return col.try_cast("double")
    if data_type == "boolean":
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            col.isin("X", "1", "true")
        )
    return col


def one_table_columns(
    c: ExprCompiler, ones: list[dict], typed: bool = False
) -> list[Column]:
    """The ONE-cardinality column list (multi-version coalesce per
    variable, P2 semantics) — shared by ``build_rdb_table`` and the
    full-master value fuzz (tests/test_master_fuzz.py), so the fuzz
    exercises the identical compile path the production builder uses."""
    by_var: dict[str, dict] = {}
    for r in ones:
        v = by_var.setdefault(
            r["variable"], {"xpaths": [], "data_type": r["data_type"]}
        )
        v["xpaths"].append(r["xpath"])
    return [
        _typed(
            c.coalesce_scalar(s["xpaths"]),
            s["data_type"],
            typed,
            tuple(x.rstrip("/").rsplit("/", 1)[-1] for x in s["xpaths"]),
        ).alias(var)
        for var, s in by_var.items()
    ]


def build_rdb_table(
    returns: DataFrame,
    table_name: str,
    typed: bool = False,
    scoped: bool = False,
) -> DataFrame:
    """returns (url, xml, doc, object_id) → the named concordance table.

    ``scoped=True``: compile against the PRUNED per-table schema
    (``sources.xml_source.scoped_return_schema``) — the caller must
    have parsed ``returns`` with the same scope
    (``with_parsed_return(..., scope_tables=(table_name,))``), so the
    from_xml struct Catalyst analyzes is the table's own ~dozens of
    leaves instead of the ~1,900-leaf superset. Values are identical
    (flag-exact trie copy); only plan-compile cost changes."""
    rows = table_rows(table_name)
    if not rows:
        raise KeyError(f"unknown rdb table {table_name!r}")
    if scoped:
        from ..sources.xml_source import scoped_return_schema

        _, builder = scoped_return_schema((table_name,))
    else:
        _, builder = build_return_schema()
    c = ExprCompiler(builder)
    keys = _key_exprs(c)

    # data-driven schedule guard (reference: buildSchedJ presence gate,
    # :4428): derived from the table's own xpath set — SJ-/SN- tables
    # gate on their schedule member, master-concordance slices gate on
    # theirs (IRS990ScheduleA, IRS990PF, …), body tables don't gate
    member = schedule_guard(rows)
    src = (
        returns.filter(F.col("xml").contains(member))
        if member is not None
        else returns
    )

    ones = [r for r in rows if r["cardinality"] == "ONE"]
    manys = [r for r in rows if r["cardinality"] == "MANY"]

    if ones and not manys:
        return src.select(*keys, *one_table_columns(c, ones, typed))

    # MANY: explode each concrete repeating element, map leaves →
    # variables, union by name (NULL-fill for leaves a version doesn't
    # carry — the reference's ragged bind_rows, :5109-5122)
    typemap = {r["variable"]: r["data_type"] for r in manys}
    # type each variable from its GLOBAL leaf set (all XSD versions in
    # all groups): per-group typing would give the same variable long
    # in one frame and double in another, and the ragged union would
    # silently widen — the typed schema must not depend on group order
    groups = concrete_groups(manys)
    global_leaves: dict[str, tuple[str, ...]] = {}
    for leaves in groups.values():
        for rel, var in leaves.items():
            lf = rel.rsplit("/", 1)[-1] if rel else ""
            global_leaves[var] = (*global_leaves.get(var, ()), lf)
    frames: list[DataFrame] = []
    for gp, leaves in groups.items():
        real_group = any(rel for rel in leaves)
        if not real_group:
            # divergence at the leaf itself (e.g. the SCHED-O checkbox
            # variants): one row per present leaf, no explode
            var = next(iter(leaves.values()))
            frames.append(
                src.filter(c.presence(gp)).select(
                    *keys, _typed(c.scalar(gp), typemap[var], typed).alias(var)
                )
            )
            continue
        gcol, depth, _ = c._walk(gp)
        for _ in range(depth - 1):
            gcol = F.flatten(gcol)
        exploded = src.select(*keys, F.explode(gcol).alias("_g"))
        gnode = builder.node_at(gp)
        # One variable may have several XSD-version leaf names inside the
        # same repeating group (BusinessNameLine1 vs BusinessNameLine1Txt)
        # — group rel-paths by variable and coalesce the member accesses,
        # the same multi-version P2 semantics as coalesce_scalar
        # (reference pipe-union, :332-336).
        by_var: dict[str, list[str]] = {}
        for rel, var in leaves.items():
            by_var.setdefault(var, []).append(rel)
        cols = []
        for var, rels in by_var.items():
            members = []
            for rel in rels:
                col: Column = F.col("_g")
                # a rel path may cross an INNER repeated element (a
                # node another registered table declares as a group
                # root — e.g. LiquidationDetail inside this table's
                # LiquidationTable): each such crossing wraps the
                # member access in one array level. Collapse to the
                # FIRST match in document order (flatten nested
                # levels, then element 1) — the golden's _find_rel
                # semantics. Found by the r13 derived-catalog fuzz
                # registering all 227 MANY slices together.
                node = gnode
                inner_arrays = 0
                for seg in rel.split("/"):
                    col = col[seg]
                    node = (
                        resolve_child(node, seg)
                        if node is not None
                        else None
                    )
                    if node is not None and node.repeated:
                        inner_arrays += 1
                        if inner_arrays >= 2:
                            # same one-open-array rule as the
                            # compiler's _walk_sql: field extraction
                            # never resolves over array<array<...>>
                            col = F.flatten(F.array_compact(col))
                            inner_arrays = 1
                if inner_arrays:
                    # null-safe first match (ANSI element_at throws on
                    # an empty array; get() returns NULL) — instances
                    # without the member are skipped, exactly the
                    # golden _find_rel's missing-element semantics
                    col = F.get(F.array_compact(col), 0)
                members.append(col)
            merged = members[0] if len(members) == 1 else F.coalesce(*members)
            cols.append(
                _typed(
                    merged, typemap[var], typed, global_leaves[var]
                ).alias(var)
            )
        frames.append(exploded.select(*[F.col(k) for k in KEY_COLS], *cols))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
