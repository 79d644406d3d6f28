"""Cache-lifetime contract for query builders.

Several builders persist() an intermediate frame that the returned
plan references more than once (dedup funnels, graph edge frames,
ngram document-frequency joins). Spark materializes the block on
first use and reuses it within the same action — but the block stays
pinned in executor storage after the action finishes, so a library
consumer composing many builders in one session would accumulate
cached frames unless it calls spark.catalog.clearCache() (which is a
blunt instrument: it also evicts the CONSUMER's own caches).

Contract: every persist() issued inside this package goes through
:func:`tracked_persist`, which records the frame in a registry scoped
to this package only. Consumers release engine-held blocks — and
nothing else — with either:

- :func:`release_cached` after consuming the returned frames, or
- ``with cached_scope():`` around a batch of build-and-consume calls
  (releases the frames persisted inside the block on exit).

The harnesses (tools/check_oracle.py, bench.py) drain caches per
query with spark.catalog.clearCache() — correct for them, since a
harness holds no consumer caches of its own (check_oracle.py
additionally drains the registry via release_cached(), so the scoped
path is exercised on every sweep). The contract above is for LIBRARY
consumers, for whom clearCache would evict their own frames;
tests/test_caching.py asserts zero persistent RDDs after a
multi-query session that never touches clearCache().
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_REGISTRY: List[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() a frame and register it for later release.

    Returns the same DataFrame (persist is in-place on the plan), so
    call sites read ``df = tracked_persist(df)`` exactly like the bare
    ``df.persist()`` they replace.
    """
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    with _LOCK:
        _REGISTRY.append(out)
    return out


def release_cached() -> int:
    """Unpersist every frame the engine has persisted since the last
    release. Blocking=False: eviction is async, callers that need a
    hard guarantee (the contract test) poll getPersistentRDDs.
    Returns the number of frames released."""
    with _LOCK:
        frames = _REGISTRY[:]
        _REGISTRY.clear()
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to hold
            pass
    return n


@contextmanager
def cached_scope() -> Iterator[None]:
    """Release engine-persisted frames created inside the block on
    exit. Scopes nest by high-water mark; composition is expected to
    be single-threaded (concurrent builders in other threads may have
    their frames released early — acceptable, unpersist only drops
    the cache, never correctness)."""
    with _LOCK:
        mark = len(_REGISTRY)
    try:
        yield
    finally:
        with _LOCK:
            frames = _REGISTRY[mark:]
            del _REGISTRY[mark:]
        for f in frames:
            try:
                f.unpersist()
            except Exception:
                pass
