"""Interleaved A/B of the streaming drains' fixed overhead knobs
(guide §1 / VERDICT r14 #3): state-partition count AND state-store
provider, toggled per arm by monkeypatching
``streaming.run_available_now`` inside ONE session so host drift
cancels.

Arms are (parts, store) pairs, e.g. ``--arms 8:rocksdb,2:rocksdb,2:hdfs``.
``store=hdfs`` unsets the per-query rocksdb pin AND pins the HDFS-backed
provider (overriding the session-level RocksDB default);
``store=rocksdb`` keeps the query's own pin (or adds it). TWS queries
refuse to run on the HDFS provider — don't pass hdfs arms for them.

Usage:
    python tools/probe_stream_overhead_ab.py QUERY [QUERY ...]
        [--arms 8:rocksdb,2:rocksdb,1:rocksdb] [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--arms", default="8:rocksdb,2:rocksdb")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    arms: list[tuple[int, str]] = []
    for a in args.arms.split(","):
        p, s = a.split(":")
        arms.append((int(p), s))

    from irs_990_efiler_database_spark import streaming
    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("stream-overhead-ab")
    qs = all_queries()
    orig = streaming.run_available_now

    override: dict = {"parts": None, "store": None}

    def patched(stream, query_name, checkpoint_dir, **kw):
        if override["parts"] is not None:
            kw["state_partitions"] = override["parts"]
        if override["store"] == "hdfs":
            kw["state_store"] = None
            sp = stream.sparkSession
            prev = sp.conf.get(streaming._PROVIDER_CONF, None)
            sp.conf.set(streaming._PROVIDER_CONF, _HDFS_PROVIDER)
            try:
                return orig(stream, query_name, checkpoint_dir, **kw)
            finally:
                if prev is None:
                    sp.conf.unset(streaming._PROVIDER_CONF)
                else:
                    sp.conf.set(streaming._PROVIDER_CONF, prev)
        elif override["store"] == "rocksdb":
            kw["state_store"] = "rocksdb"
        return orig(stream, query_name, checkpoint_dir, **kw)

    streaming.run_available_now = patched

    # warm the streaming machinery once (untimed)
    override["parts"], override["store"] = arms[0]
    qs[args.queries[0]](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()

    try:
        for name in args.queries:
            results: dict[tuple[int, str], list[float]] = {a: [] for a in arms}
            for r in range(args.rounds):
                order = arms if r % 2 == 0 else arms[::-1]
                for arm in order:
                    override["parts"], override["store"] = arm
                    spark.sparkContext.setJobDescription(
                        f"ab {name} parts={arm[0]} store={arm[1]}"
                    )
                    t0 = time.perf_counter()
                    qs[name](spark, args.sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    results[arm].append(round(time.perf_counter() - t0, 4))
                    spark.catalog.clearCache()
            for arm in arms:
                print(
                    f"{name}: parts={arm[0]} store={arm[1]} "
                    f"min={min(results[arm]):.3f} {results[arm]}",
                    flush=True,
                )
    finally:
        streaming.run_available_now = orig
    spark.stop()


if __name__ == "__main__":
    main()
