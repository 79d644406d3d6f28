"""bench.py extraction self-validation: a run with wrong row counts or
a physically impossible wall time must raise, not post a number.
BENCH_r06 recorded a 0.165 s / 2000-doc build (~40x below any real
measured run) because nothing validated the entry — VERDICT r6 #1."""

from __future__ import annotations

import pytest

from bench import (
    EXTRACT_FLOOR_SEC_PER_DOC,
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
    # the r6 artifact: 0.165 s for 2000 docs (floor is 1.0 s)
    assert 0.165 < 2000 * EXTRACT_FLOOR_SEC_PER_DOC
    with pytest.raises(RuntimeError, match="physical floor"):
        _validate_extract_run(GOOD_ROWS, 0, 2000, 0.165)


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
