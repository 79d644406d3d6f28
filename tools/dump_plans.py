"""Dump `.explain("formatted")` physical plans for named queries.

Evidence generator for the per-round ``plans/rN/`` directory: run at
the commit whose plans you are claiming (VERDICT r14 #6: a plan dump is
invalid if its generating commit isn't the closing commit).

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX QUERY [QUERY...] [--sf DIR]

writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each query.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix", choices=["before", "after"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from irs_990_efiler_database_spark.queries import all_queries
    from irs_990_efiler_database_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    reg = all_queries()
    for name in args.queries:
        df = reg[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = out / f"{name}_{args.suffix}.txt"
        p.write_text(txt)
        print(f"wrote {p} ({len(txt.splitlines())} lines)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
