"""Round-11 structural invariant: every query sub-family module must
import cleanly STANDALONE (fresh interpreter, nothing else imported
first). The failure mode this pins: a split module that imports its
sibling at module level creates a cycle through the parent's tail
re-export — the star import of a partially-initialized sibling binds
nothing (silently!) or raises on an underscore re-export, but only
for whichever import order a given entry point happens to use. Found
by review in round 11 (dedup_eval raised ImportError when imported
first; relational lost every relational_quality name when
relational_quality was imported first)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

QUERIES_DIR = (
    Path(__file__).resolve().parent.parent
    / "irs_990_efiler_database_spark"
    / "queries"
)

MODULES = sorted(
    p.stem for p in QUERIES_DIR.glob("*.py") if p.stem != "__init__"
)


@pytest.mark.parametrize("module", MODULES)
def test_query_module_imports_standalone(module):
    repo = str(QUERIES_DIR.parent.parent)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            f"import sys; sys.path.insert(0, {repo!r});"
            f" import irs_990_efiler_database_spark.queries.{module}",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        f"queries.{module} failed to import standalone:\n{proc.stderr[-2000:]}"
    )


def test_aggregators_expose_moved_names_in_either_order():
    """The silent variant: import the CHILD first, then the parent —
    the parent's tail star re-export must still bind the moved names
    (before the round-11 restructure it bound nothing)."""
    pairs = [
        ("relational_quality", "relational", "profile_orders_columns"),
        ("similarity_pq", "similarity_ops", "sim_pq_adc_topk"),
        ("dedup_eval", "dedup_ops", "match_fellegi_sunter"),
        ("stats_models", "stats_ops", "stat_bh_fdr"),
        ("events_trends", "events_ops", "events_kaplan_meier"),
    ]
    repo = str(QUERIES_DIR.parent.parent)
    for child, parent, name in pairs:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import sys; sys.path.insert(0, {repo!r});"
                f" import irs_990_efiler_database_spark.queries.{child};"
                f" from irs_990_efiler_database_spark.queries.{parent}"
                f" import {name}",
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, (
            f"{child} -> {parent}.{name} broke:\n{proc.stderr[-2000:]}"
        )
