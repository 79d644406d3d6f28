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


def table_rows(table_name: str) -> list[dict]:
    return [r for r in load_rdb_spec() if r["rdb_table"] == table_name]


def table_names() -> list[str]:
    return sorted({r["rdb_table"] for r in load_rdb_spec()})


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
    """
    roots = set(find_group_names([r["xpath"] for r in rows]))
    groups: dict[str, dict[str, str]] = {}
    for r in rows:
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
