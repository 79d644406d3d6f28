"""Interleaved A/B of the streaming drains' per-query state-partition
count (guide §1 / VERDICT r14 #3): wraps
``streaming.run_available_now`` so ``state_partitions`` is overridden
per arm, alternating arms inside ONE session so host drift cancels.

Usage:
    python tools/probe_stream_partitions_ab.py QUERY [QUERY ...]
        [--parts 8,4,2,1] [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--parts", default="8,2")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    parts = [int(p) for p in args.parts.split(",")]

    from irs_990_efiler_database_spark import streaming
    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("stream-parts-ab")
    qs = all_queries()
    orig = streaming.run_available_now

    override = {"n": None}

    def patched(stream, query_name, checkpoint_dir, **kw):
        if override["n"] is not None:
            kw["state_partitions"] = override["n"]
        return orig(stream, query_name, checkpoint_dir, **kw)

    streaming.run_available_now = patched

    # warm the streaming machinery once (untimed)
    qs[args.queries[0]](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    try:
        for name in args.queries:
            results: dict[int, list[float]] = {p: [] for p in parts}
            for r in range(args.rounds):
                order = parts if r % 2 == 0 else parts[::-1]
                for p in order:
                    override["n"] = p
                    spark.sparkContext.setJobDescription(
                        f"ab {name} parts={p}"
                    )
                    t0 = time.perf_counter()
                    qs[name](spark, args.sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    results[p].append(round(time.perf_counter() - t0, 4))
                    spark.catalog.clearCache()
            for p in parts:
                print(
                    f"{name}: parts={p} min={min(results[p]):.3f} "
                    f"{results[p]}",
                    flush=True,
                )
    finally:
        streaming.run_available_now = orig
    spark.stop()


if __name__ == "__main__":
    main()
