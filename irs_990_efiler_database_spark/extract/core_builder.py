"""CORE table builder — the Spark equivalent of the reference's
``scrapeXML`` (build_efile_database_functions.R:307-2860): 237 output
columns over one parsed return, as ONE wide whole-stage-codegen'd
projection instead of ~600 interpreted per-document xpath calls.

Spec-driven: every variable comes from metadata/core_spec.json
(derived by tools/derive_990_metadata.py). Variable kinds:

- scalar           multi-version coalesce (+ optional space-collapse,
                   presence recode)                   (:332-336, :527)
- concat_collapse  mutually-exclusive recoded checkboxes concatenated,
                   '' → NULL (FORMORG :620, ACCTMETHOD :670,
                   EXEMPTSTATUS :745)
- conditional_sum  990: NA-ignoring horizontal sum of components;
                   990EZ: single xpath              (:1034-1043, :1529)
- sum_with_fallback PROFEESINDEP: sum of 7 PC fees; all-NA → EZ field
                   (:1294-1304)
- schedule_flag    substring test on the serialized doc (:2522-2620)
- url / object_id_from_url  key columns               (:39-44)

Production rules zeroALL/zeroPC/zeroEZ (:443-472) apply after recodes,
form-gated on FORMTYPE exactly as in the reference.

Deliberate deviations from the reference (documented, all are R
artifacts the engine should not reproduce):
- R's gsub("NA","",paste(...)) collapse also deletes the substring
  "NA" inside legitimate values (e.g. "NATIONAL" → "TIONAL"); we
  concatenate NULL-as-empty without mangling values.
- R's as.character(sum(...)) prints ≥1e5 values in scientific
  notation ("1e+05"); we emit canonical integers.
- Schedule flags are BooleanType, not "TRUE"/"FALSE" strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.concordance import load_core_spec
from ..sources.xml_source import build_return_schema
from .compiler import ExprCompiler


def _sq(s: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + s.replace("'", "''") + "'"


def _apply_rule_sql(x: str, rule: str | None, formtype: str) -> str:
    if rule == "zeroALL":
        return f"coalesce({x}, '0')"
    if rule == "zeroPC":
        return f"CASE WHEN {formtype} = '990' THEN coalesce({x}, '0') ELSE {x} END"
    if rule == "zeroEZ":
        return f"CASE WHEN {formtype} = '990EZ' THEN coalesce({x}, '0') ELSE {x} END"
    return x


def _num_sql(x: str) -> str:
    return f"CAST({x} AS BIGINT)"


def compile_core_sql(c: ExprCompiler, xml_col: str = "xml") -> dict[str, str]:
    """Compile every CORE variable to a SQL expression STRING.

    The whole 237-column projection is composed driver-side as text
    and crosses to the JVM as one ``selectExpr`` — building the same
    trees as Column objects costs one py4j round-trip per operator
    (measured ~4s of plan-build latency per call for this table)."""
    spec = load_core_spec()
    vars_ = spec["vars"]

    # FORMTYPE gates the zero rules and the conditional sums; compile first.
    formtype = c._coalesce_scalar_sql(vars_["FORMTYPE"]["xpaths"])

    exprs: dict[str, str] = {}

    # pass 1: scalars (incl. recodes + rules)
    for var, s in vars_.items():
        if s.get("kind") != "scalar":
            continue
        if s.get("collapse") == " ":
            x = c._collapsed_matches_sql(s["xpaths"], " ")
        elif "recode_present" in s:
            x = (
                f"CASE WHEN {c._any_present_sql(s['xpaths'])} "
                f"THEN {_sq(s['recode_present'])} END"
            )
        else:
            x = c._coalesce_scalar_sql(s["xpaths"])
        exprs[var] = _apply_rule_sql(x, s.get("rule"), formtype)

    # pass 2: derived variables referencing pass-1 expressions
    for var, s in vars_.items():
        kind = s.get("kind")
        if kind == "concat_collapse":
            parts = ", ".join(f"coalesce({exprs[v]}, '')" for v in s["components"])
            exprs[var] = f"nullif(concat({parts}), '')"
        elif kind == "conditional_sum":
            total = " + ".join(
                f"coalesce({_num_sql(exprs[v])}, 0)" for v in s["pc_components"]
            )
            pc = f"CAST((0 + {total}) AS STRING)"
            ez = c._coalesce_scalar_sql(s["ez_xpaths"])
            x = f"CASE WHEN {formtype} = '990' THEN {pc} ELSE {ez} END"
            exprs[var] = _apply_rule_sql(x, s.get("rule"), formtype)
        elif kind == "sum_with_fallback":
            comps = [exprs[v] for v in s["pc_components"]]
            all_null = " AND ".join(f"({x} IS NULL)" for x in comps)
            total = " + ".join(f"coalesce({_num_sql(x)}, 0)" for x in comps)
            ez = c._coalesce_scalar_sql(s["ez_xpaths"])
            x = (
                f"CASE WHEN {all_null} THEN {ez} "
                f"ELSE CAST((0 + {total}) AS STRING) END"
            )
            exprs[var] = _apply_rule_sql(x, s.get("rule"), formtype)
        elif kind == "schedule_flag":
            exprs[var] = f"contains(`{xml_col}`, {_sq(s['schedule'])})"
        elif kind == "url":
            exprs[var] = "`url`"
        elif kind == "object_id_from_url":
            exprs[var] = "`object_id`"
    return exprs


def compile_core_columns(c: ExprCompiler, xml_col: str = "xml") -> dict[str, Column]:
    """Column view of ``compile_core_sql`` (one F.expr per variable) —
    for builders that need individual header columns (Schedule N)."""
    return {v: F.expr(x) for v, x in compile_core_sql(c, xml_col).items()}


_NUM_LEAF_SUFFIXES = ("Amt", "Cnt", "Nbr", "Qty")
_DATE_LEAF_SUFFIXES = ("Dt", "Date")


def core_type_map() -> dict[str, str]:
    """CORE variable → logical type for typed mode, derived from the
    IRS XSD leaf-name conventions (USAmountType leaves end in Amt,
    counts in Cnt/Nbr, dates in Dt — SURVEY §1.2): numeric if ANY
    version's leaf carries a numeric suffix (older XSDs drop the
    suffix), date likewise; recodes/labels stay string; schedule flags
    are already boolean; conditional sums are numeric by construction."""
    spec = load_core_spec()
    out: dict[str, str] = {}
    for var, s in spec["vars"].items():
        kind = s.get("kind")
        if kind in ("conditional_sum", "sum_with_fallback"):
            out[var] = "long"
            continue
        if kind != "scalar" or "recode_present" in s or s.get("collapse"):
            continue
        leaves = [xp.rstrip("/").rsplit("/", 1)[-1] for xp in s.get("xpaths", [])]
        if any(lf.endswith(_NUM_LEAF_SUFFIXES) for lf in leaves):
            out[var] = "long"
        elif any(lf.endswith(_DATE_LEAF_SUFFIXES) for lf in leaves):
            out[var] = "date"
    return out


def build_core(
    returns: DataFrame,
    columns: list[str] | None = None,
    typed: bool = False,
) -> DataFrame:
    """returns (url, xml, doc, object_id) → CORE, one row per filing,
    columns in the reference's namedList order (:2768-2850).

    ``columns`` overrides the output column list (e.g. deduplicated —
    the reference's namedList carries ORGDISSOLVED twice).

    ``typed=True`` upgrades the reference's all-string model to real
    types (amounts/counts → long, dates → date) per ``core_type_map``;
    the default string mode stays bit-compatible with the golden
    oracle for parity checks (SURVEY §1.3)."""
    _, builder = build_return_schema()
    c = ExprCompiler(builder)
    exprs = compile_core_sql(c)
    spec = load_core_spec()
    cols = spec["columns"] if columns is None else columns
    if typed:
        # try_cast: ANSI mode would otherwise abort the whole build on
        # one unparseable amount/date; NULL-degrade matches as.numeric
        tmap = core_type_map()
        exprs = {
            v: (f"try_cast({x} AS {tmap[v]})" if v in tmap else x)
            for v, x in exprs.items()
        }
    # ONE py4j crossing for the whole 237-column projection
    return returns.selectExpr(
        *[f"{exprs[v]} AS `{v}`" for v in cols]
    )
