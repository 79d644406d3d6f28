"""Streaming/batch parity: the availableNow streaming pipeline over the
events table must produce exactly the batch query's rows."""

from __future__ import annotations

import shutil

import pytest

from irs_990_efiler_database_spark.catalog import table_path
from irs_990_efiler_database_spark.queries.events_ops import (
    events_sessionize_gap,
    events_tumbling_5min,
)
from irs_990_efiler_database_spark.streaming import (
    run_available_now,
    session_counts,
    stream_events,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # the file stream source wants a directory it can watch for new
    # files — stage the events parquet into one (the "landing prefix")
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(table_path(SF, "events"), d / "part-000.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, tmp_path, events_dir):
    stream = tumbling_counts(stream_events(spark, events_dir))
    got = run_available_now(stream, "stream_tumbling", str(tmp_path / "ckpt"))
    want = events_tumbling_5min(spark, SF)
    cols = ["win_start", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_sessionize_matches_batch(spark, tmp_path, events_dir):
    stream = session_counts(stream_events(spark, events_dir))
    got = run_available_now(stream, "stream_sessions", str(tmp_path / "ckpt"))
    # session_window merges events within the gap — same semantics as
    # the batch lag+running-sum sessionizer; compare the multiset of
    # (user_id, session size)
    want = events_sessionize_gap(spark, SF).select("user_id", "n_events")
    cols = ["user_id", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
