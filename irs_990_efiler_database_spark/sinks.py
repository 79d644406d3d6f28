"""Table sinks — the Spark replacement for the reference's per-chunk
saveRDS/write.csv outputs (build_efile_database_functions.R:5136-5163)
and its manual chunk/restart bookkeeping (BUILD_SCRIPTS/README.md:
294-355).

Partitioned parquet with DYNAMIC partition overwrite is the scale
design: re-running a year's build atomically replaces exactly that
year's partitions (idempotent restart — the chunk/redo list becomes a
no-op), and every downstream read prunes on tax_year/form_type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PARTITION_COLS = ("TAXYR", "FORMTYPE")


def write_table(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] | None = DEFAULT_PARTITION_COLS,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink (replaces saveRDS, :5136-5148).

    Partition values are preserved as-is; rows whose partition column
    is NULL land in the Hive default partition and round-trip as NULL.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = df.write.mode(mode)
    cols = [c for c in (partition_by or ()) if c in df.columns]
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (replaces write.csv, :5151-5163). Single-header CSV
    directory; arrays/structs are not CSV-able so flat tables only."""
    df.write.mode(mode).option("header", True).csv(path)


def write_dead_letter(dead: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Dead-letter sink (FAIL_LIST.csv analog, :5096-5101): parquet of
    (url, xml, reason, captured_at) for replay.

    Default is overwrite-per-run so the DEAD-LETTER table honors the
    same idempotent-restart guarantee as the data tables (a re-run of
    build_database must not accumulate duplicate dead rows); pass
    mode='append' to accumulate across distinct corpora instead."""
    dead.withColumn("captured_at", F.current_timestamp()).write.mode(
        mode
    ).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Re-read a sink table; the glob-concat chunk re-reader
    (bind_data, BUILD_SCRIPTS/README.md:388-409) is just this scan —
    parquet directories ARE the concatenation."""
    # keep partition values exactly as written (all-string output model)
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles rows into
    ``n_buckets`` files keyed by ``bucket_by``, so every later join or
    aggregation on that key reads co-located buckets with NO exchange.

    This is the pay-once-shuffle-forever path for the 100 TB fact
    tables (the reference has no analog — its chunked RDS files are
    keyed by position): bucketed lineitem ⋈ bucketed orders on
    orderkey is a zero-shuffle sort-merge join (asserted in
    tests/test_operators.py)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def upsert_partitions(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_by: tuple[str, ...] = DEFAULT_PARTITION_COLS,
) -> None:
    """Merge-by-partition-rewrite: upsert ``updates`` into an existing
    partitioned table — the amended-filing story (an IRS correction
    replaces the prior version of that return; the reference's only
    recourse is a full rebuild of the year).

    Mechanics: only partitions PRESENT in ``updates`` are touched —
    the existing table is semi-joined to the updates' distinct
    partition values (a broadcast join over partition columns, which
    dynamic partition pruning turns into a pruned scan), matched keys
    are dropped (anti-join), and the union is written back with
    dynamic partition overwrite. Untouched partitions' files are never
    read or rewritten, so the cost is proportional to the amended
    partitions, not the table."""
    existing = read_table(spark, path)
    part_cols = [c for c in partition_by if c in updates.columns]
    keys = [c for c in key_cols if c in existing.columns]
    affected = existing.join(
        F.broadcast(updates.select(*part_cols).distinct()), part_cols, "left_semi"
    )
    keep = affected.join(
        F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
    )
    merged = keep.unionByName(updates.select(*existing.columns))
    # the write overwrites files the plan reads — materialize the
    # merged partitions (executor-local blocks, affected partitions
    # only) and truncate lineage before touching the directory
    merged = merged.localCheckpoint(eager=True)
    write_table(merged, path, partition_by=tuple(part_cols))


def write_stata(df: DataFrame, path: str, version: int = 118) -> None:
    """Stata .dta export of a bounded table — the reference ships its
    index as Stata/SPSS alongside CSV (Build-Efiler-Index.md:170-193,
    via haven::write_dta). Stata files are single-file, non-splittable
    containers, so this is a DRIVER-side export for index-scale data
    (millions of rows), not a distributed sink — the distributed
    formats are parquet/CSV; this exists for parity with the
    reference's downstream-stats-user story."""
    import pandas as pd  # noqa: F401 — to_stata ships with pandas

    pdf = df.toPandas()
    pdf.to_stata(path, write_index=False, version=version)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite a parquet table so each output
    file approaches ``target_file_bytes``. Returns the file count
    written.

    The reference's chunked build (BUILD_SCRIPTS/README.md:294-355)
    emits one output per chunk; an incremental/streaming build emits
    one per micro-batch. At 100 TB that accretes millions of KB-sized
    files and scan planning — not I/O — becomes the bottleneck (one
    footer read + one task per file). Compaction is the standing
    maintenance job: size the file count from the actual on-disk bytes,
    rewrite with a round-robin repartition (no keys, so no skew), swap
    atomically via a sibling directory + rename. Partitioned tables
    compact per-partition (pass ``partition_by``) so the swap stays
    partition-atomic and readers never see a half-compacted table."""
    import math
    import shutil
    from pathlib import Path

    p = Path(path)
    data_files = [f for f in p.rglob("*.parquet") if f.is_file()]
    total_bytes = sum(f.stat().st_size for f in data_files)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = str(p.with_name(p.name + "._compacting"))
    w = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*[c for c in partition_by if c in df.columns])
    w.parquet(tmp)
    bak = str(p.with_name(p.name + "._precompact"))
    shutil.move(str(p), bak)
    shutil.move(tmp, str(p))
    shutil.rmtree(bak)
    return n_files


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
) -> None:
    """Time-layout sink: partition directories by the event DATE,
    parquet row groups sorted by the timestamp inside each partition.

    The two-level pruning story for 100 TB event tables: a time-range
    predicate first prunes whole partition directories (Catalyst
    partition pruning — scans never even list the other days), then the
    in-partition sort tightens parquet min/max row-group statistics so
    the remaining files skip non-matching row groups at the footer
    level. Same layout the incremental build writes per `_batch`."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition(F.col("event_date"))
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 10,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet: rows sorted by the interleaved-bit
    (Morton) code of two columns, so parquet min/max footer statistics
    stay tight on BOTH dimensions at once — a filter on either column
    skips most files/row groups, where a single-column sort only ever
    serves one predicate.

    Mechanics: each column is affinely scaled to [0, 2^bits) from its
    global min/max (one tiny agg — no sort, no sampling), the Morton
    code is a codegen'd bit-interleave expression, and the layout is
    repartitionByRange + sortWithinPartitions on that code: exactly
    two passes over the data regardless of size."""
    a, b = cols
    mm = df.agg(
        F.min(a).alias("amin"),
        F.max(a).alias("amax"),
        F.min(b).alias("bmin"),
        F.max(b).alias("bmax"),
    ).collect()[0]
    top = (1 << bits) - 1

    def scaled(col: str, lo, hi) -> Column:
        if hi == lo:
            return F.lit(0)
        return F.least(
            F.lit(top),
            F.floor(
                (F.col(col) - F.lit(lo))
                / F.lit(float(hi - lo))
                * F.lit(1 << bits)
            ).cast("long"),
        )

    x, y = scaled(a, mm["amin"], mm["amax"]), scaled(b, mm["bmin"], mm["bmax"])
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
