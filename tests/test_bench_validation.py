"""bench.py extraction self-validation: a run with wrong row counts or
a physically impossible wall time must raise, not post a number.
BENCH_r06 recorded a 0.165 s / 2000-doc build (~40x below any real
measured run) because nothing validated the entry — VERDICT r6 #1."""

from __future__ import annotations

import pytest

from bench import (
    EXTRACT_MIN_NONEMPTY_TABLES,
    _validate_extract_run,
)

GOOD_ROWS = {
    "CORE": 2000,
    **{f"T{i:02d}": 10 + i for i in range(EXTRACT_MIN_NONEMPTY_TABLES)},
}


def test_valid_run_passes():
    _validate_extract_run(GOOD_ROWS, 0, 2000, 4.0)


def test_zero_core_rows_fails_loudly():
    rows = dict(GOOD_ROWS, CORE=0)
    with pytest.raises(RuntimeError, match="CORE rows 0 != n_docs 2000"):
        _validate_extract_run(rows, 0, 2000, 4.0)


def test_missing_child_tables_fails_loudly():
    rows = {"CORE": 2000, "T00": 5}  # only 2 non-empty tables
    with pytest.raises(RuntimeError, match="non-empty tables"):
        _validate_extract_run(rows, 0, 2000, 4.0)


def test_sub_physical_floor_timing_fails_loudly():
    from bench import extract_floor_sec

    # the r6 artifact: 0.165 s for 2000 docs — still below the
    # fixed+marginal floor at every corpus size
    assert 0.165 < extract_floor_sec(2000)
    with pytest.raises(RuntimeError, match="physical floor"):
        _validate_extract_run(GOOD_ROWS, 0, 2000, 0.165)
    # ...while a REAL at-size build (3.9 s / 20k docs, round-11
    # 3-point fit) passes: the old linear 0.5 ms/doc floor wrongly
    # discarded it (marginal wall is ~0.06 ms/doc once the ~3 s fixed
    # overhead is out of the numerator)
    assert 3.9 >= extract_floor_sec(20_000)
    _validate_extract_run(dict(GOOD_ROWS, CORE=20_000), 0, 20_000, 3.9)


def test_dead_letter_rows_fail_loudly():
    with pytest.raises(RuntimeError, match="dead-letter"):
        _validate_extract_run(GOOD_ROWS, 3, 2000, 4.0)


def test_rows_validation_split_from_timing_floor():
    """The bench loop applies the floor PER-RUN (one clock artifact
    discards that run, not the whole bench); row validation alone must
    not raise on timing and the combined validator must."""
    from bench import _validate_extract_rows

    _validate_extract_rows(GOOD_ROWS, 0, 2000)  # no timing arg, no raise
    with pytest.raises(RuntimeError, match="CORE rows"):
        _validate_extract_rows(dict(GOOD_ROWS, CORE=5), 0, 2000)


def test_entry_flags_sub_floor_and_high_spread():
    """VERDICT r7 #3: every per-query entry carries plausibility flags.
    A best below the scheduling floor is marked sub_floor (r6's
    0.020 s doc_quality_deciles class); a spread exceeding the best is
    marked high_spread; clean entries produce NO key at all."""
    from bench import QUERY_FLOOR_SEC, entry_flags

    timings = {
        "fast_fake": 0.02,          # below floor
        "noisy": 0.4,               # spread 0.6 > best 0.4
        "clean": 1.2,               # clean
        "small_clean": 0.06,        # above floor, tiny spread
    }
    spreads = {
        "fast_fake": 0.001,
        "noisy": 0.6,
        "clean": 0.1,
        "small_clean": 0.01,
    }
    flags = entry_flags(timings, spreads)
    assert flags == {"fast_fake": ["sub_floor"], "noisy": ["high_spread"]}
    assert QUERY_FLOOR_SEC == 0.05


def _fake_payload(n_queries: int = 93) -> dict:
    qs = {f"q_{i:03d}": round(0.05 + i * 0.037, 4) for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_wall",
        "value": round(sum(qs.values()), 4),
        "unit": "sec",
        "queries": qs,
        "spread": {k: 0.01 for k in qs},
        "flags": {"q_000": ["sub_floor"]},
        "contention_ratio": 1.87,
        "sf": 0.1,
        "cpus": 32,
        "master": "local[32]",
        "cpu_calibration_sec": 0.8,
        "cpu_calibration_end_sec": 0.82,
        "cpu_calibration_mc_sec": 1.5,
        "extract": {"docs": 2000, "sec": 4.2, "docs_per_sec": 476.2,
                    "rows_ok": True, "runs_valid": 2},
    }


def test_compact_summary_schema_and_top5():
    """VERDICT r9 #1: the digest keeps the required
    {metric, value, unit, queries, sf} schema, cuts queries to the 5
    slowest, and carries the cross-round signals (contention ratio,
    extraction throughput, flagged entries)."""
    import json

    from bench import compact_summary

    payload = _fake_payload()
    digest = compact_summary(payload)
    assert digest["metric"] == payload["metric"]
    assert digest["value"] == payload["value"]
    assert digest["unit"] == "sec"
    assert digest["sf"] == 0.1
    assert digest["entries"] == 93
    # top-5 slowest, not first-5
    assert list(digest["queries"]) == [f"q_{i:03d}" for i in (92, 91, 90, 89, 88)]
    assert digest["contention_ratio"] == 1.87
    assert digest["extract_docs_per_sec"] == 476.2
    assert digest["flagged_entries"] == ["q_000"]
    # parallelism stamp (VERDICT r14 #2b): the scaling comparison needs
    # the actual core count in the driver-visible digest
    assert digest["cpus"] == 32
    assert digest["master"] == "local[32]"
    json.dumps(digest)  # serializable


def test_compact_summary_bounded_when_every_entry_flags():
    """The digest must stay inside the tail window even on a round so
    contended that EVERY entry trips high_spread — an unbounded
    flagged-entries list would reproduce the exact truncation failure
    the digest exists to fix, in the round where the flag signal
    matters most."""
    import json

    from bench import compact_summary

    payload = _fake_payload()
    # realistic long registry names (the real worst case is ~39 chars)
    long = {
        f"events_stream_session_close_timers_{i:03d}": v
        for i, v in enumerate(payload["queries"].values())
    }
    payload["queries"] = long
    payload["spread"] = {k: 0.01 for k in long}
    payload["flags"] = {k: ["high_spread"] for k in long}  # all 93
    digest = compact_summary(payload)
    assert digest["flagged_n"] == 93
    assert len(digest["flagged_entries"]) == 8  # bounded sample
    assert len(json.dumps(digest)) < 1900


def test_compact_summary_survives_2000_char_tail_capture():
    """The driver records the LAST 2000 chars of stdout and json-parses
    them; BENCH_r07-r09 were all ``parsed: null`` because the full JSON
    line overflows that window. Reproduce the capture over the exact
    print sequence bench.main emits and assert every plausible driver
    parse strategy succeeds on the tail."""
    import json

    from bench import compact_summary

    payload = _fake_payload()
    compact_line = json.dumps(compact_summary(payload))
    assert len(compact_line) < 1900  # digest must FIT the window
    stdout = json.dumps(payload) + "\n" + "\n" * 2000 + compact_line + "\n"
    tail = stdout[-2000:]
    # raw-tail loads (leading whitespace is legal JSON)
    assert json.loads(tail)["value"] == payload["value"]
    # stripped-tail and last-non-empty-line strategies
    assert json.loads(tail.strip())["entries"] == 93
    last_line = [ln for ln in tail.splitlines() if ln.strip()][-1]
    assert json.loads(last_line)["metric"] == payload["metric"]


def test_entry_flags_both_flags_and_spread_absolute_guard():
    """A sub-floor entry with huge relative spread gets both flags;
    a micro-entry whose spread is relatively large but under the 50 ms
    absolute guard stays clean (pure scheduling jitter)."""
    from bench import entry_flags

    flags = entry_flags({"bad": 0.01, "jitter": 0.06}, {"bad": 0.09, "jitter": 0.04})
    assert flags["bad"] == ["sub_floor", "high_spread"]
    assert "jitter" not in flags
