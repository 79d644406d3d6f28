"""Fixture-driven tests for the 990 extraction engine.

The Spark pipeline (wholetext source → from_xml superset struct →
compiled Column expressions) is compared against ``extract.golden`` —
an independent ElementTree re-implementation of the reference's
per-document semantics (scrapeXML / build_rdb_table,
build_efile_database_functions.R:307-2860, :210-276) — on the canonical
4-document fixture matrix (BUILD_SCRIPTS/README.md:44-50 analog).
"""

from __future__ import annotations

import pytest

from irs_990_efiler_database_spark.extract.core_builder import build_core
from irs_990_efiler_database_spark.extract.golden import (
    fixture_files,
    golden_core_row,
    golden_rdb_rows,
    golden_schedn_rows,
)
from irs_990_efiler_database_spark.extract.rdb_builder import build_rdb_table
from irs_990_efiler_database_spark.extract.schedn_builder import (
    build_schedn_table,
    schedn_table_names,
)
from irs_990_efiler_database_spark.plans.concordance import (
    load_core_spec,
    table_names,
)
from irs_990_efiler_database_spark.sources.xml_source import (
    read_return_xml_files,
)

GLOB = "tests/fixtures/*.xml"


@pytest.fixture(scope="module")
def returns(spark):
    df = read_return_xml_files(spark, GLOB).cache()
    df.count()
    yield df
    df.unpersist()


def test_wholetext_one_row_per_file(returns):
    # regression: .option("wholetext", True) silently read one row per
    # LINE; the kwarg form gives one row per file
    assert returns.count() == len(fixture_files()) == 6


def test_object_id_derived_from_url(returns):
    ids = {r["object_id"] for r in returns.select("object_id").collect()}
    assert ids == {
        "100000001",
        "100000002",
        "100000003",
        "100000004",
        "100000005",
        "100000006",
    }


def _rows_as_dicts(df):
    return [r.asDict() for r in df.collect()]


def test_core_matches_golden(returns):
    cols = list(dict.fromkeys(load_core_spec()["columns"]))
    spark_rows = {r["URL"]: r for r in _rows_as_dicts(build_core(returns, columns=cols))}
    assert len(spark_rows) == 6
    for p in fixture_files():
        url = p.resolve().as_uri()
        golden = golden_core_row(url, p.read_text())
        got = spark_rows[url]
        diffs = {
            c: (got[c], golden[c]) for c in cols if got[c] != golden[c]
        }
        assert not diffs, f"{p.name}: {diffs}"


@pytest.mark.parametrize("table", table_names())
def test_rdb_table_matches_golden(returns, table):
    df = build_rdb_table(returns, table)
    golden_rows: list[dict] = []
    golden_cols: list[str] = []
    for p in fixture_files():
        c, r = golden_rdb_rows(p.resolve().as_uri(), p.read_text(), table)
        for col in c:
            if col not in golden_cols:
                golden_cols.append(col)
        golden_rows.extend(r)
    assert sorted(df.columns) == sorted(golden_cols)

    def key(d):
        return tuple(str(d.get(c)) for c in sorted(golden_cols))

    got = sorted(_rows_as_dicts(df), key=key)
    want = sorted(
        [{c: r.get(c) for c in golden_cols} for r in golden_rows], key=key
    )
    assert got == want, f"{table}: spark != golden"


@pytest.mark.parametrize("table", schedn_table_names())
def test_schedn_table_matches_golden(returns, table):
    df = build_schedn_table(returns, table)
    golden_rows: list[dict] = []
    golden_cols: list[str] = []
    for p in fixture_files():
        c, r = golden_schedn_rows(p.resolve().as_uri(), p.read_text(), table)
        for col in c:
            if col not in golden_cols:
                golden_cols.append(col)
        golden_rows.extend(r)
    assert sorted(df.columns) == sorted(golden_cols)

    def key(d):
        return tuple(str(d.get(c)) for c in sorted(golden_cols))

    got = sorted(_rows_as_dicts(df), key=key)
    want = sorted(
        [{c: r.get(c) for c in golden_cols} for r in golden_rows], key=key
    )
    assert got == want, f"{table}: spark != golden"


def test_typed_core_mode(returns):
    from datetime import date

    from irs_990_efiler_database_spark.extract.core_builder import (
        core_type_map,
    )

    cols = list(dict.fromkeys(load_core_spec()["columns"]))
    tmap = core_type_map()
    typed = build_core(returns, columns=cols, typed=True)
    dtypes = dict(typed.dtypes)
    assert tmap["GROSSRECEIPTS"] == "long" and dtypes["GROSSRECEIPTS"] == "bigint"
    assert tmap["STYEAR"] == "date" and dtypes["STYEAR"] == "date"
    assert dtypes["EIN"] == "string"  # identifiers stay string
    # values: typed == cast(string-mode) per row
    strings = {r["URL"]: r for r in _rows_as_dicts(build_core(returns, columns=cols))}
    for r in _rows_as_dicts(typed):
        s = strings[r["URL"]]
        for var, t in tmap.items():
            sv = s[var]
            if t == "long":
                assert r[var] == (int(sv) if sv is not None else None), var
            elif t == "date":
                assert r[var] == (
                    date.fromisoformat(sv) if sv is not None else None
                ), var


def test_typed_rdb_mode(returns):
    typed = build_rdb_table(returns, "F9-P07-TABLE-01-DTK-COMPENSATION", typed=True)
    dtypes = dict(typed.dtypes)
    # concordance numeric + Amt leaf -> bigint; hours/rates -> double
    assert dtypes["F9_07_PZ_COMP_DIRECT"] == "bigint"
    assert dtypes["F9_07_PZ_DTK_AVE_HOURS_WEEK"] == "double"
    rows = _rows_as_dicts(typed)
    assert any(isinstance(r["F9_07_PZ_COMP_DIRECT"], int) for r in rows)


def test_schedn_row_counts(returns):
    # fixture 5 (2014 XSD): 2 liquidation details, 0 dispositions, 1 suppl
    # fixture 6 (2012 XSD): 1 liquidation, 2 dispositions, 1 part-III note
    counts = {
        t: build_schedn_table(returns, t).count() for t in schedn_table_names()
    }
    assert counts == {
        "SCHED-N-TABLE-00": 2,
        "SCHED-N-TABLE-01": 3,
        "SCHED-N-TABLE-02": 2,
        "SCHED-N-TABLE-03": 2,
    }


def test_typed_mode_degrades_unparseable_values_to_null(spark):
    """ANSI mode: a stray-text amount must yield NULL (try_cast), not
    abort the whole typed build — one bad filing can't fail the job."""
    from irs_990_efiler_database_spark.sources.xml_source import with_parsed_return

    fixture = (
        '<?xml version="1.0" encoding="utf-8"?>'
        '<Return xmlns="http://www.irs.gov/efile" returnVersion="2014v5.0">'
        "<ReturnHeader><ReturnTypeCd>990</ReturnTypeCd>"
        "<TaxPeriodEndDt>not-a-date</TaxPeriodEndDt>"
        "<Filer><EIN>100000001</EIN></Filer></ReturnHeader>"
        "<ReturnData><IRS990>"
        "<CYTotalRevenueAmt>twelve thousand</CYTotalRevenueAmt>"
        "</IRS990></ReturnData></Return>"
    )
    raw = spark.createDataFrame(
        [("file:///t/201400000000000000_public.xml", fixture)], ["url", "xml"]
    )
    typed = build_core(
        with_parsed_return(raw), columns=["EIN", "TOTALREVCURRENT", "ENDYEAR"], typed=True
    )
    row = typed.collect()[0]  # must not raise CAST_INVALID_INPUT
    assert row["EIN"] == "100000001"
    assert row["TOTALREVCURRENT"] is None
    assert row["ENDYEAR"] is None  # "not-a-date" NULL-degrades too
    dtypes = dict(typed.dtypes)
    assert dtypes["TOTALREVCURRENT"] == "bigint"
    assert dtypes["ENDYEAR"] == "date"
