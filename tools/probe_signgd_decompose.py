"""Decompose stat_signgd_text_classifier: time the feature build alone,
then the full query at 0..3 iterations (monkeypatching _SGN_ITERS), all
interleaved in one session (bench-host-contention rule). Shows whether
the cost is the tokenize/feature phase or per-iteration stage latency.
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
    spark = get_spark("probe-signgd")
    from irs_990_efiler_database_spark.catalog import load_table

    load_table(spark, SF, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    results: dict[str, list[float]] = {}
    for rnd in range(3):
        for iters in (0, 1, 2, 3):
            stats_models._SGN_ITERS = iters
            t0 = time.perf_counter()
            stats_models.stat_signgd_text_classifier(spark, SF).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            results.setdefault(f"iters={iters}", []).append(round(dt, 3))
            spark.catalog.clearCache()
    stats_models._SGN_ITERS = 3
    for k, v in results.items():
        print(f"{k}: min={min(v)} runs={v}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
