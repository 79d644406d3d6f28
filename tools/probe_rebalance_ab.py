"""Interleaved A/B of the documents/embeddings scan rebalance for one
or more registered queries: patches the query module's ``load_table``
so the rebalance kwarg is forced True / False on alternating runs
inside ONE session (host drift cancels; guide §1).

Usage:
    python tools/probe_rebalance_ab.py MODULE:QUERY [MODULE:QUERY ...]
        [--rounds N] [--sf DIR]

MODULE is the submodule of irs_990_efiler_database_spark.queries whose
``load_table`` binding the query resolves (e.g. ``text_lm``).
"""

from __future__ import annotations

import argparse
import importlib
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("targets", nargs="+", help="module:query")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list: force the rebalance only for these tables "
        "(others keep their call-site default) — e.g. lineitem,orders",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("rebalance-ab")
    qs = all_queries()

    from irs_990_efiler_database_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    for target in args.targets:
        mod_name, qname = target.split(":")
        mod = importlib.import_module(
            f"irs_990_efiler_database_spark.queries.{mod_name}"
        )
        orig = mod.load_table
        results: dict[bool, list[float]] = {True: [], False: []}

        def patched_factory(force: bool):
            def patched(spark_, sf_dir_, name_, rebalance=None):
                if only is not None and name_ not in only:
                    return orig(spark_, sf_dir_, name_, rebalance=rebalance)
                return orig(spark_, sf_dir_, name_, rebalance=force)

            return patched

        # warm both arms once (untimed)
        for force in (True, False):
            mod.load_table = patched_factory(force)
            qs[qname](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        for r in range(args.rounds):
            for force in (True, False) if r % 2 == 0 else (False, True):
                mod.load_table = patched_factory(force)
                spark.sparkContext.setJobDescription(
                    f"ab {qname} rebalance={force}"
                )
                t0 = time.perf_counter()
                qs[qname](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[force].append(round(time.perf_counter() - t0, 4))
                spark.catalog.clearCache()
        mod.load_table = orig
        print(
            f"{qname}: ON  min={min(results[True]):.3f} {results[True]}\n"
            f"{qname}: OFF min={min(results[False]):.3f} {results[False]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
