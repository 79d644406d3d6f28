"""Dated TTL re-probe (VERDICT r10 #5 / r11 #8): the one TWS sub-surface
the engine cannot ship — ValueState TTL requires timeMode
"processingTime", and in this sandbox's Spark 4.1.2 + RocksDB a
processing-time TWS query hangs AFTER the data batch commits, in the
trailing "No new data but cleaning up state" maintenance batch (the
probe's data is 1 row; the hang is upstream state-cleanup machinery,
not data volume). Event-time and none modes — every shipped TWS
operator — are unaffected.

This script IS the minimal repro that earlier rounds ran inline
(BENCH_NOTES r10/r11 notes): 1 row, ValueState ttlDurationMs=60000,
timeMode="processingTime", availableNow, RocksDB + changelog, fresh
local[4] session, 150 s watchdog. Committed as a tool so the re-probe
is one command on any Spark/RocksDB change:

    python tools/ttl_probe.py            # 150 s cap, prints verdict

Verdicts: "TTL-OK" (query terminated; wire ttlDurationMs through
running_totals + an oracle row next) or "TTL-HANG <status-json>"
(refresh the dated BENCH_NOTES line, stay env-blocked).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CAP_SEC = 150.0


def main() -> None:
    from pyspark.sql import SparkSession

    from irs_990_efiler_database_spark.compat import ensure_protobuf
    from irs_990_efiler_database_spark.streaming import (
        _CHANGELOG_CONF,
        _PROVIDER_CONF,
        _ROCKSDB_PROVIDER,
    )

    tmp = Path(tempfile.mkdtemp(prefix="ttl_probe_"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("ttl_probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config(_PROVIDER_CONF, _ROCKSDB_PROVIDER)
        .config(_CHANGELOG_CONF, "true")
        .getOrCreate()
    )
    ensure_protobuf(spark)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    src = tmp / "src"
    spark.range(1).select(
        F.col("id").alias("user_id"), F.lit(1).cast("long").alias("n")
    ).write.parquet(str(src))

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    class TtlCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "cnt", "n LONG", ttlDurationMs=60000
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            prev = self._state.get()
            n = (prev[0] if prev is not None else 0) + sum(
                len(pdf) for pdf in rows
            )
            self._state.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    stream = (
        spark.readStream.schema("user_id LONG, n LONG")
        .parquet(str(src))
        .groupBy("user_id")
        .transformWithStateInPandas(
            TtlCount(), out_schema, "append", "processingTime"
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ttl_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    terminated = q.awaitTermination(CAP_SEC)
    dt = time.time() - t0
    if terminated:
        rows = spark.sql("select * from ttl_probe").collect()
        print(f"TTL-OK terminated in {dt:.1f}s rows={len(rows)}")
    else:
        status = q.status
        print(f"TTL-HANG {dt:.0f}s {json.dumps(status)}")
        q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
