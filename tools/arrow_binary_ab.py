"""Binary-payload transport A/B (VERDICT r11 #3): the Arrow connector
twin exists because Arrow IPC moves opaque binary columns with zero
per-row Python and zero text encoding — but through round 11 it was
only ever measured on small tabular rows. This benchmarks the shape it
is FOR: multimodal media rows (opaque ``payload: binary`` + typed meta
struct, the SURVEY multimodal data model) at a configurable volume,
through all three sinks:

- ``arrowcommit``  — RecordBatches into Arrow IPC stream files
- ``jsonlcommit``  — row-at-a-time JSON staging (base64 for binary;
                     the documented audit/dead-letter path)
- ``parquet``      — the JVM-native reference point

Each leg times write and manifest-gated read-back separately, and
validates the read with a distributed xxhash-free checksum
(sum of crc32(payload) + count) so a lossy path can never post a
number.

Usage:
  python tools/arrow_binary_ab.py                 # 4,000 x 64 KB ≈ 256 MB
  python tools/arrow_binary_ab.py --rows 1000 --kb 64
  python tools/arrow_binary_ab.py --skip-jsonl    # jsonl leg is ~10-16x;
                                                   # skip when probing

Prints a markdown table (paste into BENCH_NOTES.md) + one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _media_frame(spark, rows: int, kb: int):
    """Deterministic media corpus: payload = kb KiB of per-row-seeded
    non-UTF8 bytes (numpy PCG on the executor — never shipped from the
    driver), meta struct + kind like operators.multimodal."""
    from pyspark.sql import functions as F

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [
                np.random.default_rng(int(i)).integers(
                    0, 256, kb * 1024, dtype=np.uint8
                ).tobytes()
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [
                        ("image", "audio", "video")[int(i) % 3] for i in ids
                    ],
                    "payload": payloads,
                }
            )

    return (
        spark.range(rows)
        .repartition(32)
        .mapInPandas(gen, "media_id long, kind string, payload binary")
        .withColumn(
            "meta",
            F.struct(
                F.lit(64).alias("w"),
                F.lit(48).alias("h"),
                F.length("payload").alias("bytes"),
            ),
        )
    )


def _checksum(df) -> tuple[int, int]:
    from pyspark.sql import functions as F

    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32("payload")).alias("c"),
    ).collect()[0]
    return int(r["n"]), int(r["c"])


def main() -> None:
    argv = sys.argv[1:]

    def opt(name: str, default: int) -> int:
        return (
            int(argv[argv.index(name) + 1]) if name in argv else default
        )

    rows = opt("--rows", 4_000)
    kb = opt("--kb", 64)
    skip_jsonl = "--skip-jsonl" in argv

    from irs_990_efiler_database_spark.caching import tracked_persist
    from irs_990_efiler_database_spark.session import get_spark
    from irs_990_efiler_database_spark.sources.pydatasource import (
        ArrowCommitDataSource,
        JsonlCommitDataSource,
        read_jsonl_commit,
    )

    spark = get_spark("arrow_binary_ab")
    spark.dataSource.register(ArrowCommitDataSource)
    spark.dataSource.register(JsonlCommitDataSource)

    df = tracked_persist(_media_frame(spark, rows, kb))
    want = _checksum(df)
    mb = rows * kb / 1024
    schema = df.schema

    legs: dict[str, dict] = {}
    tmp = tempfile.mkdtemp(prefix="arrow_ab_")
    try:
        def run(name: str, write, read) -> None:
            path = f"{tmp}/{name}"
            t0 = time.perf_counter()
            write(path)
            tw = time.perf_counter() - t0
            t0 = time.perf_counter()
            got = _checksum(read(path))
            tr = time.perf_counter() - t0
            if got != want:
                raise RuntimeError(
                    f"{name} round-trip corrupted payloads: {got} != {want}"
                )
            disk = sum(
                f.stat().st_size for f in Path(path).rglob("*") if f.is_file()
            )
            legs[name] = {
                "write_sec": round(tw, 3),
                "read_sec": round(tr, 3),
                "write_mb_s": round(mb / tw, 1),
                "read_mb_s": round(mb / tr, 1),
                "disk_mb": round(disk / 1e6, 1),
            }
            print(f"# {name}: write {tw:.2f}s read {tr:.2f}s", file=sys.stderr)

        run(
            "parquet",
            lambda p: df.write.mode("overwrite").parquet(p),
            lambda p: spark.read.parquet(p),
        )
        run(
            "arrowcommit",
            lambda p: df.write.format("arrowcommit")
            .mode("overwrite")
            .save(p),
            lambda p: spark.read.format("arrowcommit").load(p),
        )
        if not skip_jsonl:
            import warnings

            with warnings.catch_warnings():
                # the row sink's >100k-row volume advisory is expected
                warnings.simplefilter("ignore", RuntimeWarning)
                run(
                    "jsonlcommit",
                    lambda p: df.write.format("jsonlcommit")
                    .mode("overwrite")
                    .save(p),
                    lambda p: read_jsonl_commit(spark, p, schema),
                )
    finally:
        df.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)

    print("\n| sink | write s | read s | write MB/s | read MB/s | disk MB |")
    print("|---|---|---|---|---|---|")
    for name, leg in legs.items():
        print(
            f"| {name} | {leg['write_sec']} | {leg['read_sec']} | "
            f"{leg['write_mb_s']} | {leg['read_mb_s']} | {leg['disk_mb']} |"
        )
    arrow, pq = legs["arrowcommit"], legs["parquet"]
    print(
        f"\narrow vs parquet: write {arrow['write_sec'] / pq['write_sec']:.2f}x, "
        f"read {arrow['read_sec'] / pq['read_sec']:.2f}x"
    )
    if "jsonlcommit" in legs:
        j = legs["jsonlcommit"]
        print(
            f"arrow vs jsonl: write {j['write_sec'] / arrow['write_sec']:.1f}x "
            f"faster, read {j['read_sec'] / arrow['read_sec']:.1f}x faster"
        )
    print(
        json.dumps(
            {
                "metric": "binary_payload_sink_ab",
                "rows": rows,
                "payload_kb": kb,
                "total_mb": round(mb, 1),
                "legs": legs,
                "checksum_rows": want[0],
            }
        )
    )


if __name__ == "__main__":
    main()
