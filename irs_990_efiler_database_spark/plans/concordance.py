"""Concordance planner: the metadata → extraction-plan algorithms.

Ports of the reference's driver-side algorithms (cited file:line into
/root/reference/BUILD_SCRIPTS/build_efile_database_functions.R):

- ``find_group_names`` (:121-134): the first path segment where a
  table's xpaths diverge names the repeating-group roots (with the
  IRS990EZ→IRS990 rewrite).
- ``get_var_map`` (:141-151): XSD leaf element name → canonical
  variable name.

These run on the driver over the (tiny) concordance metadata and emit
the plan the Spark compiler turns into Column expressions — replacing
the reference's R source-code generation (create_code_chunks,
:5186-5291) with data-driven plan construction.
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from pathlib import Path

_META = Path(__file__).resolve().parent.parent / "metadata"


@lru_cache(maxsize=1)
def load_rdb_spec() -> tuple[dict, ...]:
    return tuple(json.loads((_META / "rdb_tables.json").read_text()))


@lru_cache(maxsize=1)
def load_core_spec() -> dict:
    return json.loads((_META / "core_spec.json").read_text())


@lru_cache(maxsize=1)
def load_schedn_spec() -> dict:
    """Schedule N spec (header vars + TABLE-00..03), derived from the
    reference's hand-rolled explode section (:2875-4140) by
    tools/derive_990_metadata.py."""
    return json.loads((_META / "schedn_spec.json").read_text())


@lru_cache(maxsize=1)
def load_master_index() -> tuple[tuple[str, str, str, str], ...]:
    """The FULL master concordance crosswalk as packaged metadata:
    (var, location, scope, xpath) rows — the same crosswalk the
    reference's generic metaprogram ``create_code_chunks``
    (build_efile_database_functions.R:5186-5291) consumes slices of.
    Emitted by tools/derive_990_metadata.py."""
    return tuple(
        tuple(r) for r in json.loads((_META / "master_index.json").read_text())
    )


# leaf-name suffix conventions of the IRS XSD: integral money/count
# leaves vs. free text — the master index carries no DATA_TYPE, so
# typed-mode consumers infer it the same way the rdb builder does
_NUM_SUFFIXES = ("Amt", "Cnt", "Nbr", "Qty", "Amount", "Pct", "Rt")
_BOOL_SUFFIXES = ("Ind", "Checkbox")


def _infer_type(xpaths: list[str]) -> str:
    """A variable's xpaths are XSD-version renames of the SAME field,
    so if ANY vintage names the leaf with a numeric suffix
    (TotalAssetsEOY → TotalAssetsEOYAmt) the variable is numeric;
    checkbox only when every vintage says so (mixed text+Ind would
    silently NULL the text arm under try_cast otherwise)."""
    leaves = [x.rstrip("/").rsplit("/", 1)[-1] for x in xpaths]
    if any(lf.endswith(_NUM_SUFFIXES) for lf in leaves):
        return "numeric"
    if all(lf.endswith(_BOOL_SUFFIXES) for lf in leaves):
        # "boolean" is the type name rdb_builder._typed recodes
        # (X/1/true → true) — master slices must match the per-table
        # concordance checkbox semantics in typed builds
        return "boolean"
    return "text"


def _split_xpath_cell(xp: str) -> list[str]:
    """'/Return/.../IRS990/X; Return/.../IRS990EZ/X' → both arms,
    normalized to a leading '/'. Single-path cells pass through."""
    arms = []
    for part in xp.split(";"):
        part = part.strip()
        if not part:
            continue
        if not part.startswith("/"):
            part = "/" + part
        arms.append(part)
    return arms


def master_table_rows(
    location: str,
    scope: str | None = None,
    table_name: str | None = None,
    cardinality: str = "ONE",
    group_roots: list[str] | None = None,
) -> list[dict]:
    """ANY master-concordance LOCATION slice → the spec-row shape
    ``build_rdb_table`` consumes (the Spark analog of feeding an
    arbitrary ``dat`` slice to the reference's create_code_chunks,
    :5186-5291 — which emits one pipe-union scalar extraction per
    VARIABLE_NAME_NEW plus the six denormalized keys).

    ``location`` matches exactly or as a part prefix
    ('SCHED-A-PART-01' pulls its '-LINE-…' sublocations too).
    The reference metaprogram is doc-level-scalar only, so the
    default is ONE-cardinality rows (multi-version xpaths coalesce,
    P2 semantics). ``cardinality='MANY'`` routes the slice through
    build_rdb_table's explode path instead — group roots inferred by
    find_group_names/concrete_groups exactly like the per-table
    concordances (for repeating master slices such as the 990PF
    Part VIII officer/contractor tables).

    ``group_roots`` (implies MANY): names of the repeating XML
    elements. The master's LOCATION labels are too coarse to infer
    roots automatically (one "line" mixes several top-level members),
    so MANY slices declare their repeating elements; rows are
    filtered to xpaths passing through one of them and stamped with
    the concrete ``group_root`` path ``concrete_groups`` consumes."""
    name = table_name or location
    if group_roots:
        cardinality = "MANY"
    by_var: dict[str, list[tuple[str, str]]] = {}
    for var, loc, sc, xp in load_master_index():
        if loc != location and not loc.startswith(location + "-"):
            continue
        if scope is not None and sc != scope:
            continue
        by_var.setdefault(var, []).append((sc, xp))
    out: list[dict] = []
    for var, pairs in by_var.items():
        # the master crosswalk joins multi-form vintages in ONE cell
        # with '; ' for PZ-scope variables ('/Return/.../IRS990/X;
        # Return/.../IRS990EZ/X' — 342 such cells); each is a separate
        # coalesce arm, not a literal path. Split here (the single
        # consumption point) so the schema, the compiler, AND the
        # golden all see real arms — verbatim treatment silently made
        # those variables never extract from either form.
        xps = list(
            dict.fromkeys(
                arm
                for _, xp in pairs
                for arm in _split_xpath_cell(xp)
            )
        )
        for xp in xps:
            row = {
                "xpath": xp,
                "variable": var,
                "data_type": _infer_type(xps),
                "cardinality": cardinality,
                "rdb_table": name,
                "scope": pairs[0][0],
                "production_rule": "",
            }
            if group_roots:
                parts = xp.strip("/").split("/")
                # INNERMOST matching segment wins: group containers
                # nest across vintages (Schedule N's
                # LiquidationTable/LiquidationDetail — the Detail
                # repeats; the same Table name IS the repeating
                # element in another vintage), and anchoring at the
                # outer match would leave the inner repeated element
                # unexploded, returning arrays where scalars belong
                # (found by the r13 derived-catalog fuzz)
                hits = [
                    i for i, seg in enumerate(parts) if seg in group_roots
                ]
                if not hits:
                    continue  # xpath outside the declared groups
                row["group_root"] = "/" + "/".join(parts[: hits[-1] + 1])
            out.append(row)
    return out


# master-slice tables registered at runtime (name → spec rows); the
# default proof slices below are always present
_MASTER_TABLES: dict[str, list[dict]] = {}

# Schedule A public-charity-status + public-support (the VERDICT r4
# missing-#1 proof tables: concordance groups NOT covered by the two
# per-table CSVs) and the 990PF balance sheet (r4 stretch #7: the
# index advertises FormType=990PF; the master carries its xpaths)
# (name, location, cardinality, group_roots) — group_roots only for
# MANY slices; the PF Part VIII officer list spans both XSD vintages
# (OfcrDirTrusteesOrKeyEmployee pre-2013, OfficerDirTrstKeyEmplGrp
# post-2013) and the ragged unionByName merges them
_DEFAULT_MASTER_SLICES = (
    ("SCHED-A-PART-01", "SCHED-A-PART-01", "ONE", None),
    ("SCHED-A-PART-02", "SCHED-A-PART-02", "ONE", None),
    ("IRS990PF-PART-02", "IRS990PF-PART-02", "ONE", None),
    (
        "PF-P08-OFFICERS",
        "IRS990PF-PART-08-LINE-1",
        "MANY",
        ("OfcrDirTrusteesOrKeyEmployee", "OfficerDirTrstKeyEmplGrp"),
    ),
    (
        "PF-P08-CONTRACTORS",
        "IRS990PF-PART-08-LINE-3",
        "MANY",
        ("CompensationOfHghstPaidCntrct", "CompensationOfHghstPdCntrctGrp"),
    ),
)


def register_master_table(
    location: str,
    scope: str | None = None,
    table_name: str | None = None,
    cardinality: str = "ONE",
    group_roots: list[str] | None = None,
) -> str:
    """Make a master LOCATION slice available to ``build_rdb_table``
    (and the golden oracle) under ``table_name`` (default: the
    location itself). Clears the cached superset XML schema so the
    slice's xpaths join the parse struct."""
    name = table_name or location
    rows = master_table_rows(location, scope, name, cardinality, group_roots)
    if not rows:
        raise KeyError(f"no master-concordance rows at location {location!r}")
    _MASTER_TABLES[name] = rows
    from ..sources.xml_source import build_return_schema  # cycle-safe here

    build_return_schema.cache_clear()
    return name


def load_many_catalog() -> dict[str, list[str]]:
    """The derived MANY-cardinality catalog for the master crosswalk
    (VERDICT r12 next-round #2): location → verified repeating-group
    root names, for every LOCATION with structural repeating-group
    evidence. Derived by tools/derive_many_catalog.py from the IRS XSD
    naming conventions + cross-vintage token matching, cross-checked
    against the per-table concordances' cardinality ground truth
    (ConcordancePartVII.csv:1) — the master CSV itself carries no
    cardinality column, so until this catalog each MANY slice needed
    hand-declared ``group_roots``."""
    data = json.loads((_META / "master_many_catalog.json").read_text())
    return {loc: list(roots) for loc, roots in data["locations"].items()}


def register_catalog_many_table(
    location: str, table_name: str | None = None
) -> str:
    """Register the MANY slice of ``location`` with its catalog-derived
    group roots (one call instead of hand-declaring roots)."""
    roots = load_many_catalog().get(location)
    if not roots:
        raise KeyError(
            f"location {location!r} has no derived MANY roots — see "
            "metadata/master_many_catalog.json (re-derive with "
            "tools/derive_many_catalog.py)"
        )
    return register_master_table(
        location,
        table_name=table_name or f"MC-{location}",
        group_roots=roots,
    )


def _ensure_default_master() -> None:
    for name, loc, card, roots in _DEFAULT_MASTER_SLICES:
        if name not in _MASTER_TABLES:
            _MASTER_TABLES[name] = master_table_rows(
                loc,
                table_name=name,
                cardinality=card,
                group_roots=list(roots) if roots else None,
            )


def master_table_names() -> list[str]:
    _ensure_default_master()
    return sorted(_MASTER_TABLES)


def table_rows(table_name: str) -> list[dict]:
    rows = [r for r in load_rdb_spec() if r["rdb_table"] == table_name]
    if rows:
        return rows
    _ensure_default_master()
    return _MASTER_TABLES.get(table_name, [])


def table_names() -> list[str]:
    return sorted({r["rdb_table"] for r in load_rdb_spec()})


_SCHED_MEMBER = re.compile(r"^IRS990Schedule[A-Z]$|^IRS990PF$")


def schedule_guard(rows: list[dict]) -> str | None:
    """Data-driven schedule guard (reference: buildSchedJ's presence
    gate, :4428): when EVERY xpath of a table passes through the same
    schedule-like ReturnData member (IRS990ScheduleX / IRS990PF),
    that member's presence gates row emission. Mixed-member tables
    (990/990EZ body tables) get no guard — matching the hardcoded
    SJ-/SN- prefix behavior this generalizes."""
    members = set()
    for r in rows:
        parts = r["xpath"].strip("/").split("/")
        if len(parts) >= 3 and parts[0] == "Return" and parts[1] == "ReturnData":
            members.add(parts[2])
        else:
            return None  # header xpath — not schedule-scoped
    if len(members) == 1:
        m = next(iter(members))
        if _SCHED_MEMBER.match(m):
            return m
    return None


def find_group_names(xpaths: list[str]) -> list[str]:
    """First-divergent-segment inference (reference :121-134).

    Returns the distinct element names at the first path position where
    the table's xpaths differ (after rewriting IRS990EZ→IRS990, which
    makes the EZ and PC variants of a group collapse onto one root).
    """
    rewritten = [x.replace("IRS990EZ", "IRS990") for x in xpaths]
    split = [x.strip("/").split("/") for x in rewritten]
    depth = min(len(p) for p in split)
    for i in range(depth):
        seg = [p[i] for p in split]
        if len(set(seg)) > 1:
            out: list[str] = []
            for s in seg:  # preserve first-seen order like unique()
                if s not in out:
                    out.append(s)
            return out
    # all xpaths identical prefix (single-variable table): the leaf
    return [split[0][-1]]


def get_var_map(rows: list[dict]) -> dict[str, str]:
    """XSD leaf name → canonical variable (reference :141-151).

    The builder path uses ``concrete_groups`` (rel-path → variable,
    which also disambiguates same-named leaves under different roots);
    this reference-exact E2 port is kept as the cross-check the tests
    pin the two against (tests/test_concordance.py)."""
    out: dict[str, str] = {}
    for r in rows:
        leaf = r["xpath"].strip("/").split("/")[-1]
        out.setdefault(leaf, r["variable"])
    return out


def concrete_groups(rows: list[dict]) -> dict[str, dict[str, str]]:
    """For a MANY-cardinality table: concrete repeated-element path →
    {relative leaf path: variable}.

    Full xpaths are NOT EZ-rewritten (IRS990 and IRS990EZ parents are
    distinct struct fields in the Spark schema). Two refinements mirror
    the reference's runtime root-climb (get_table :173-184):

    - container roots: when every leaf under an inferred root shares the
      same first segment and that segment is itself an inferred root
      (e.g. Form990PartVIISectionB/ContractorCompensation), the group
      descends to the real repeating element;
    - leaf roots: when the divergent segment IS the leaf (e.g. the
      SCHED-O checkbox variants), the relative path is empty and the
      repeated element is the leaf itself.

    Rows carrying an explicit ``group_root`` (master slices registered
    with ``group_roots=…`` — the master's LOCATION labels are too
    coarse for automatic inference) bypass inference entirely: the
    declared concrete root IS the repeated element.
    """
    groups: dict[str, dict[str, str]] = {}
    inferred = [r for r in rows if not r.get("group_root")]
    for r in rows:
        if r.get("group_root"):
            gp = r["group_root"]
            rel = r["xpath"].strip("/")[len(gp.strip("/")) :].strip("/")
            groups.setdefault(gp, {})[rel] = r["variable"]
    if not inferred:
        return groups
    roots = set(find_group_names([r["xpath"] for r in inferred]))
    for r in inferred:
        parts = r["xpath"].strip("/").split("/")
        for i, seg in enumerate(parts):
            if seg in roots or seg.replace("IRS990EZ", "IRS990") in roots:
                gp = "/" + "/".join(parts[: i + 1])
                rel = "/".join(parts[i + 1 :])
                groups.setdefault(gp, {})[rel] = r["variable"]
                break
    # container-root push-down
    changed = True
    while changed:
        changed = False
        for gp, leaves in list(groups.items()):
            firsts = {rel.split("/")[0] for rel in leaves if rel}
            if len(firsts) == 1 and len(leaves) == len([r for r in leaves if r]):
                s = next(iter(firsts))
                if s in roots:
                    new_gp = f"{gp}/{s}"
                    new_leaves = {
                        "/".join(rel.split("/")[1:]): var for rel, var in leaves.items()
                    }
                    del groups[gp]
                    groups.setdefault(new_gp, {}).update(new_leaves)
                    changed = True
    return groups
