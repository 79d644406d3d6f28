"""Interleaved A/B for the signSGD per-iteration weight persist:
toggle stats_models._SGN_PERSIST_W inside one session, alternating
variants per round so host drift cancels (bench-host-contention rule).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from irs_990_efiler_database_spark.queries import stats_models  # noqa: E402
from irs_990_efiler_database_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("probe-signgd-ab")
    from irs_990_efiler_database_spark.catalog import load_table

    load_table(spark, SF, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    results: dict[str, list[float]] = {"persist": [], "no-persist": []}
    for rnd in range(4):
        for flag, key in ((True, "persist"), (False, "no-persist")):
            stats_models._SGN_PERSIST_W = flag
            t0 = time.perf_counter()
            stats_models.stat_signgd_text_classifier(spark, SF).write.format(
                "noop"
            ).mode("overwrite").save()
            results[key].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    stats_models._SGN_PERSIST_W = True
    for k, v in results.items():
        print(f"{k}: min={min(v)} median={sorted(v)[len(v)//2]} runs={v}")
    spark.stop()


if __name__ == "__main__":
    main()
