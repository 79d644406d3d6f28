"""One-off interleaved A/B for the events_trends tracked_persist change
(events_sliding_distinct_users / events_dau_wau_mau /
events_dow_seasonality). Variant A patches caching.tracked_persist to
identity (the pre-change recompute behavior); variant B is the real
persist. Alternating within one session so host drift cancels.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from irs_990_efiler_database_spark import caching
from irs_990_efiler_database_spark.queries import all_queries
from irs_990_efiler_database_spark.session import get_spark

SF = "/root/testdata/sf0.1"
QUERIES = sys.argv[1:] or [
    "events_sliding_distinct_users",
    "events_dau_wau_mau",
    "events_dow_seasonality",
]
ROUNDS = 4

real_persist = caching.tracked_persist


def identity_persist(df, storage_level=None):
    return df


def run_once(spark, qs, name):
    t0 = time.perf_counter()
    qs[name](spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    caching.release_cached()
    spark.catalog.clearCache()
    return round(dt, 4)


def main():
    spark = get_spark("events-persist-ab")
    qs = all_queries()
    from irs_990_efiler_database_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF, t).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    times = {n: {"A": [], "B": []} for n in QUERIES}
    # warmup both variants once, untimed
    for n in QUERIES:
        run_once(spark, qs, n)
    for r in range(ROUNDS):
        for n in QUERIES:
            for variant in ("A", "B") if r % 2 == 0 else ("B", "A"):
                import irs_990_efiler_database_spark.queries.events_trends as et

                et_persist = identity_persist if variant == "A" else real_persist
                caching.tracked_persist = et_persist
                try:
                    times[n][variant].append(run_once(spark, qs, n))
                finally:
                    caching.tracked_persist = real_persist
    for n in QUERIES:
        a, b = times[n]["A"], times[n]["B"]
        print(
            f"{n}: A(no-persist) best={min(a)} {a}  B(persist) best={min(b)} {b}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
