"""Per-query optimization probe (guide §1): time one or more registered
queries in isolation against the noop sink (best-of-N), and dump
``explain("formatted")`` for each to a file.

Usage:
    python tools/opt_probe.py QUERY [QUERY ...] [--runs N] [--sf DIR]
        [--plans-dir plans/r14] [--suffix before|after]

Prints one line per query: name, best, all runs. Writes
``<plans-dir>/<query>_<suffix>.txt`` when --plans-dir is given.
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true", help="plans only")
    args = ap.parse_args()

    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("opt-probe")
    qs = all_queries()

    # warm base tables once (untimed) so probes measure compute
    from irs_990_efiler_database_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"probe: {name}")
        if args.plans_dir:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = Path(args.plans_dir)
            out.mkdir(parents=True, exist_ok=True)
            (out / f"{name}_{args.suffix}.txt").write_text(plan)
            spark.catalog.clearCache()
        if args.no_time:
            print(f"{name}: plan written")
            continue
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        print(f"{name}: best={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
