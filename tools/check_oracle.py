"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same scale factor; compare row count, schema, and an order-insensitive
value hash.

Usage: python tools/check_oracle.py [--spark-only] [--vanilla] [--shard K/N] [sf_dir] [query_name ...]
(--spark-only skips the DuckDB compare and prints per-query Spark wall
time; --shard K/N runs every N-th query starting at K (0-based) so a
full-registry sweep can fan out over N processes — e.g.
``for k in 0 1 2 3; do python tools/check_oracle.py --shard $k/4 & done``;
--vanilla runs the sweep on a BARE ``SparkSession.builder`` session —
no ``session.get_spark`` tuning (default state-store provider, default
ANSI/AQE, default session timezone) — to prove every registered query
carries the confs it needs at the query site instead of silently
depending on the repo's session factory. Only resource knobs are set
(driver memory, UI off): they change capacity, never semantics.)
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of a double is unambiguous and identical across engines
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return len(rows), h.hexdigest()


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--spark-only", "--vanilla")]
    spark_only = "--spark-only" in sys.argv[1:]
    vanilla = "--vanilla" in sys.argv[1:]
    shard_k, shard_n = 0, 1
    for i, a in enumerate(list(argv)):
        if a == "--shard":
            shard_k, shard_n = (int(x) for x in argv[i + 1].split("/"))
            del argv[i : i + 2]
            break
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    if vanilla:
        # the driver's harness builds its own session; replicate that
        # worst case — no repo tuning at all, resource knobs only
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        from irs_990_efiler_database_spark.session import get_spark

        spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for qi, (name, fn) in enumerate(sorted(qs.items())):
        if only and name not in only:
            continue
        if qi % shard_n != shard_k:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sn, shash = frame_fingerprint(scols, srows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # builders may persist() reused intermediates; without this,
            # cached frames accumulate across a full-registry sweep.
            # release_cached() first (drains the package's tracked-
            # persist registry — the library-consumer path, exercised
            # here on every sweep), then clearCache() as the backstop
            from irs_990_efiler_database_spark.caching import release_cached

            release_cached()
            spark.catalog.clearCache()
        if spark_only:
            print(f"TIME {name}: {sn} rows [{time.time()-t0:.2f}s]")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {sn} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
            dn, dhash = frame_fingerprint(dcols, drows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok = ok_cols and sn == dn and shash == dhash
        status = "PASS" if ok else "FAIL"
        extra = ""
        if not ok_cols:
            extra = f" cols spark={sorted(scols)} duck={sorted(dcols)}"
        elif sn != dn:
            extra = f" rows spark={sn} duck={dn}"
        elif shash != dhash:
            extra = " value-hash mismatch"
            srt = sorted(srows, key=lambda r: tuple(_canon(x) for x in r))
            drt = sorted(drows, key=lambda r: tuple(_canon(x) for x in r))
            for a, b in zip(srt, drt):
                if tuple(map(_canon, a)) != tuple(map(_canon, b)):
                    extra += f"\n  first diff:\n   spark {dict(zip(scols, a))}\n   duck  {dict(zip(dcols, b))}"
                    break
        print(f"{status} {name}: {sn} rows [{time.time()-t0:.1f}s]{extra}")
        if not ok:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
