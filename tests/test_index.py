"""Index pipeline tests (buildIndex analog, reference :54-89)."""

from __future__ import annotations

from irs_990_efiler_database_spark.queries.index_ops import (
    _GLOB,
    _golden_index_rows,
)
from irs_990_efiler_database_spark.sources.index import (
    build_index,
    filter_index,
)


def test_build_index_dedupes_and_derives_tax_year(spark):
    idx = build_index(spark, _GLOB)
    rows = {r["ObjectId"]: r.asDict() for r in idx.collect()}
    golden = {r["ObjectId"]: r for r in _golden_index_rows()}
    assert len(rows) == len(golden) == 25  # 26 raw - 1 duplicate
    for obj, g in golden.items():
        assert rows[obj] == g


def test_tax_year_rule(spark):
    # Dec period-end → TaxYear == period year; otherwise year - 1
    idx = build_index(spark, _GLOB)
    for r in idx.select("TaxPeriod", "TaxYear").collect():
        yr, month = int(r["TaxPeriod"][:4]), r["TaxPeriod"][4:6]
        assert r["TaxYear"] == (yr if month == "12" else yr - 1)


def test_ein_filter_is_broadcast_semi_join(spark):
    eins = spark.createDataFrame([("100000001",)], ["EIN"])
    out = filter_index(build_index(spark, _GLOB), eins=eins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert out.count() == 3  # one filing per fixture year


def test_custom_python_datasource_matches_native_reader(spark):
    """The Spark-4 Python DataSource connector must return exactly the
    rows the plan-native wholetext+from_json reader returns, with one
    input partition per index file (the executor-parallel contract)."""
    from irs_990_efiler_database_spark.queries.index_ops import _GLOB
    from irs_990_efiler_database_spark.sources.index import read_index_files
    from irs_990_efiler_database_spark.sources.pydatasource import (
        Irs990IndexDataSource,
    )

    spark.dataSource.register(Irs990IndexDataSource)
    via_ds = spark.read.format("irs990index").load(_GLOB)
    native = read_index_files(spark, _GLOB)
    assert via_ds.schema == native.schema
    key = lambda r: (r["ObjectId"], r["URL"])  # noqa: E731
    assert sorted(via_ds.collect(), key=key) == sorted(
        native.collect(), key=key
    )
    assert via_ds.rdd.getNumPartitions() == 3  # one per yearly file


def test_custom_python_datasource_streams_new_files_exactly_once(
    spark, tmp_path
):
    """The streaming side of the connector: an availableNow run over
    the landing dir ingests every file; a file that lands later is
    picked up by the next run from the same checkpoint WITHOUT
    re-reading the old ones (offset log = sorted-name file count)."""
    import glob
    import shutil

    from irs_990_efiler_database_spark.queries.index_ops import _GLOB
    from irs_990_efiler_database_spark.sources.pydatasource import (
        Irs990IndexDataSource,
    )

    src_files = sorted(glob.glob(_GLOB))
    assert len(src_files) >= 3
    land = tmp_path / "landing"
    land.mkdir()
    for f in src_files[:2]:
        shutil.copy(f, land)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.dataSource.register(Irs990IndexDataSource)

    def run_once():
        q = (
            spark.readStream.format("irs990index")
            .load(str(land / "*.json"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    batch_2 = spark.read.format("irs990index").load(str(land / "*.json"))
    assert n_first == batch_2.count()

    shutil.copy(src_files[2], land)
    run_once()
    got = spark.read.parquet(out)
    batch_3 = spark.read.format("irs990index").load(str(land / "*.json"))
    # exactly-once: total rows equal the batch read of all 3 files —
    # nothing duplicated, nothing missed
    assert got.count() == batch_3.count()
    key = lambda r: (r["ObjectId"], r["URL"])  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(
        batch_3.collect(), key=key
    )
