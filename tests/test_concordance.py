"""Concordance-planner algorithm tests (E1/E2 ports, reference
:121-151): group-root inference and the leaf→variable map, pinned
against each other and against the derived metadata."""

from __future__ import annotations

from irs_990_efiler_database_spark.plans.concordance import (
    concrete_groups,
    find_group_names,
    get_var_map,
    table_names,
    table_rows,
)


def test_find_group_names_part_vii():
    rows = [
        r
        for r in table_rows("F9-P07-TABLE-01-DTK-COMPENSATION")
        if r["cardinality"] == "MANY"
    ]
    roots = find_group_names([r["xpath"] for r in rows])
    assert "Form990PartVIISectionAGrp" in roots or "Form990PartVIISectionA" in roots


def test_get_var_map_agrees_with_concrete_groups():
    # E2 (leaf -> variable) must assign every leaf that E3/E4's group
    # decomposition extracts to the same canonical variable — the two
    # algorithms are alternate views of the same concordance
    for table in table_names():
        rows = [r for r in table_rows(table) if r["cardinality"] == "MANY"]
        if not rows:
            continue
        vmap = get_var_map(rows)
        expected: dict[str, set[str]] = {}
        for leaves in concrete_groups(rows).values():
            for rel, var in leaves.items():
                leaf = (rel or "").split("/")[-1] or "-"
                if leaf != "-":
                    expected.setdefault(leaf, set()).add(var)
        for leaf, vars_ in expected.items():
            assert vmap[leaf] in vars_, (table, leaf, vmap[leaf], vars_)


def test_concrete_groups_cover_all_many_rows():
    for table in table_names():
        rows = [r for r in table_rows(table) if r["cardinality"] == "MANY"]
        if not rows:
            continue
        covered = sum(len(le) for le in concrete_groups(rows).values())
        distinct = len({(r["xpath"]) for r in rows})
        assert covered == distinct, table
