"""Query registry: every operator family from SURVEY.md §2 exposed as a
named query over the synthetic star schema, each paired with an ANSI-SQL
oracle string (DuckDB dialect-compatible) producing identical column
names, types, and values.

Determinism rules (so a value-hash comparison against another engine can
succeed):

- Money/quantity aggregates are computed in DECIMAL (exact, associative,
  order-independent) and only cast to DOUBLE in the final projection.
  Floating-point sums are order-dependent and shuffle order is not —
  decimal is the only sound way to hash-compare a distributed sum.
- Averages = exact decimal sum cast to double, divided by the bigint
  count (one deterministic double division).
- Timestamps are projected as formatted strings; integer-ish computed
  columns are cast to bigint on both sides (Spark's year() is int,
  DuckDB's is bigint).
- Ties in top-k / window ranking are always broken by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        # a duplicate name would SILENTLY shadow the earlier query in
        # every downstream surface (driver gate, sweep, bench) — make
        # it a load-time error instead (a real near-miss: a second
        # events_markov_transitions overwrote the first for a commit)
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_REGISTRY)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module registers its queries
    from . import (  # noqa: F401
        dedup_ops,
        events_ops,
        extract_990,
        graph_ops,
        index_ops,
        multimodal_ops,
        relational,
        scalars,
        similarity_ops,
        sketch_ops,
        stats_ops,
        text_ops,
        tpch,
    )

    _LOADED = True
