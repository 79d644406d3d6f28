"""Python DataSource WRITE surface (SURVEY §2.1): the jsonlcommit sink
— batch writer() with manifest-gated visibility, streaming
streamWriter() with a per-batch commit log (exactly-once via
batch-keyed idempotent log rewrite), and abort invisibility."""

from __future__ import annotations

import json
import os


SCHEMA = "k LONG, s STRING, v DOUBLE"


def _register(spark):
    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitDataSource,
    )

    try:
        spark.dataSource.register(JsonlCommitDataSource)
    except Exception:
        pass  # already registered in this session


def test_jsonlcommit_batch_roundtrip_overwrite_and_append(spark, tmp_path):
    from irs_990_efiler_database_spark.sources.pydatasource import (
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    df1 = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], SCHEMA)
    df1.repartition(2).write.format("jsonlcommit").mode("overwrite").save(
        str(sink)
    )
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(1, "a", 1.5), (2, "b", 2.5)}

    # append merges into the manifest
    df2 = spark.createDataFrame([(3, "c", 3.5)], SCHEMA)
    df2.write.format("jsonlcommit").mode("append").save(str(sink))
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)}

    # overwrite resets visibility to the new write alone
    df2.write.format("jsonlcommit").mode("overwrite").save(str(sink))
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(3, "c", 3.5)}

    manifest = json.loads((sink / "_manifest.json").read_text())
    assert manifest["rows"] == 1
    # staged files were all promoted — staging holds nothing visible
    assert list((sink / "_staging").glob("*.jsonl")) == []


def test_jsonlcommit_stream_commits_per_batch_exactly_once(spark, tmp_path):
    """availableNow drain through the streaming writer: every input row
    lands exactly once, one commit-log entry per micro-batch, and the
    manifest-gated reader sees precisely the committed union."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        read_jsonl_commit,
    )

    _register(spark)
    land = tmp_path / "land"
    land.mkdir()
    sink = tmp_path / "sink"
    sink.mkdir()

    def _stage(name, rows, mtime):
        out = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(out))
        (part,) = out.glob("part-*.parquet")
        dest = land / f"{name}.parquet"
        part.rename(dest)
        os.utime(dest, (mtime, mtime))

    import time

    now = time.time()
    _stage("b0", [(1, "a", 1.0), (2, "b", 2.0)], now)
    _stage("b1", [(3, "c", 3.0)], now + 10)

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
        .writeStream.format("jsonlcommit")
        .option("path", str(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    commits = sorted((sink / "_commits").glob("*.json"))
    assert len(commits) >= 2  # one log entry per micro-batch
    total = sum(json.loads(c.read_text())["rows"] for c in commits)
    assert total == 3
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)}


def test_jsonlcommit_uncommitted_and_replayed_output_invisible(spark, tmp_path):
    """The visibility contract: stage files without a log entry are
    invisible to the reader, and a REPLAYED streaming batch rewrites
    its own commit entry whole (idempotent overwrite — retry replaces,
    never doubles)."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)

    # an orphaned stage file (task that died before commit)
    (sink / "_staging" / "task-9-999.jsonl").write_text(
        '{"k": 99, "s": "orphan", "v": 0.0}\n'
    )
    assert read_jsonl_commit(spark, str(sink), SCHEMA).count() == 0

    # first attempt of batch 0 commits two files
    w = JsonlCommitStreamWriter({"path": str(sink)})
    for name, line in [
        ("task-0-1.jsonl", '{"k": 1, "s": "x", "v": 1.0}\n'),
        ("task-1-2.jsonl", '{"k": 2, "s": "y", "v": 2.0}\n'),
    ]:
        (sink / "_staging" / name).write_text(line)
    w.commit(
        [_JsonlCommit("task-0-1.jsonl", 1), _JsonlCommit("task-1-2.jsonl", 1)],
        batchId=0,
    )
    assert read_jsonl_commit(spark, str(sink), SCHEMA).count() == 2

    # the batch replays (e.g. driver restart before the offset commit):
    # new attempt stages fresh files, commit REWRITES entry 0 and
    # garbage-collects the superseded attempt's promoted files
    (sink / "_staging" / "task-0-7.jsonl").write_text(
        '{"k": 1, "s": "x", "v": 1.0}\n{"k": 2, "s": "y", "v": 2.0}\n'
    )
    w.commit([_JsonlCommit("task-0-7.jsonl", 2)], batchId=0)
    got = read_jsonl_commit(spark, str(sink), SCHEMA)
    assert got.count() == 2  # replaced, not doubled
    assert {tuple(r) for r in got.collect()} == {(1, "x", 1.0), (2, "y", 2.0)}
    assert not (sink / "batch-0-task-0-1.jsonl").exists()
    assert not (sink / "batch-0-task-1-2.jsonl").exists()

    # abort: staged files removed, log untouched
    (sink / "_staging" / "task-3-3.jsonl").write_text('{"k": 5}\n')
    w.abort([_JsonlCommit("task-3-3.jsonl", 1)], batchId=1)
    assert not (sink / "_staging" / "task-3-3.jsonl").exists()
    assert read_jsonl_commit(spark, str(sink), SCHEMA).count() == 2


def test_jsonlcommit_overwrite_resets_streaming_visibility_and_gc(
    spark, tmp_path
):
    """Batch overwrite must reset the WHOLE sink — including batches a
    streaming writer committed: the _commits log is cleared and every
    superseded data file deleted (only after the new manifest is
    durable). Also: the streaming writer refuses truncate semantics
    (complete/update modes) at construction, and staged names embed a
    per-writer run id so a second application's append can never
    clobber a first application's committed files."""
    import pytest

    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)

    # a streaming batch commits one file
    w = JsonlCommitStreamWriter({"path": str(sink)})
    (sink / "_staging" / "task-s-0-1.jsonl").write_text(
        '{"k": 1, "s": "old", "v": 1.0}\n'
    )
    w.commit([_JsonlCommit("task-s-0-1.jsonl", 1)], batchId=0)
    assert read_jsonl_commit(spark, str(sink), SCHEMA).count() == 1

    # batch overwrite: only the new rows remain visible, the commit
    # log is gone, the old data file is gone
    df = spark.createDataFrame([(7, "new", 7.0)], SCHEMA)
    df.write.format("jsonlcommit").mode("overwrite").save(str(sink))
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(7, "new", 7.0)}
    assert list((sink / "_commits").glob("*.json")) == []
    assert not (sink / "batch-0-task-s-0-1.jsonl").exists()

    # truncate semantics refused loudly
    with pytest.raises(ValueError, match="append output mode only"):
        JsonlCommitStreamWriter({"path": str(sink)}, overwrite=True)

    # two distinct writer instances (= two applications) appending:
    # run-id-scoped names keep their files disjoint even if Spark's
    # task attempt counters coincide
    df.write.format("jsonlcommit").mode("append").save(str(sink))
    names = [
        f["file"]
        for f in __import__("json").loads(
            (sink / "_manifest.json").read_text()
        )["files"]
    ]
    assert len(names) == len(set(names)) == 2
    run_ids = {n.split("-")[1] for n in names}
    assert len(run_ids) == 2  # a fresh run id per writer instance


def test_jsonlcommit_compaction_folds_log_into_manifest(spark, tmp_path):
    """compact_jsonl_commit_log folds every per-batch commit entry into
    the manifest (O(1) listing afterwards), moves no data files, is
    idempotent, and changes nothing the reader sees."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        compact_jsonl_commit_log,
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)
    w = JsonlCommitStreamWriter({"path": str(sink)})
    for b in range(3):
        (sink / "_staging" / f"task-c-{b}-0.jsonl").write_text(
            f'{{"k": {b}, "s": "b{b}", "v": {b}.0}}\n'
        )
        w.commit([_JsonlCommit(f"task-c-{b}-0.jsonl", 1)], batchId=b)
    before = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert len(before) == 3

    assert compact_jsonl_commit_log(str(sink)) == 3
    assert list((sink / "_commits").glob("*.json")) == []
    after = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert after == before
    # idempotent: nothing left to fold, nothing changes
    assert compact_jsonl_commit_log(str(sink)) == 0
    assert {
        tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()
    } == before


def test_jsonlcommit_visibility_state_machine_property(tmp_path):
    """Property: under ANY sequence of streaming commits, replays
    (same batchId re-committed with different rows), aborts and
    compactions, the committed-file listing exposes exactly the LAST
    committed payload per batchId and nothing else — verified
    pure-Python (the Spark read path is pinned by the other tests)."""
    import json

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        _committed_names,
        compact_jsonl_commit_log,
    )

    op = st.one_of(
        st.tuples(
            st.just("commit"),
            st.integers(min_value=0, max_value=3),
            st.lists(st.integers(0, 99), min_size=1, max_size=3),
        ),
        st.tuples(
            st.just("abort"),
            st.integers(min_value=0, max_value=3),
            st.lists(st.integers(0, 99), min_size=1, max_size=3),
        ),
        st.tuples(st.just("compact"), st.just(0), st.just([])),
        st.tuples(
            st.just("append"),
            st.just(0),
            st.lists(st.integers(0, 99), min_size=1, max_size=3),
        ),
        st.tuples(
            st.just("overwrite"),
            st.just(0),
            st.lists(st.integers(0, 99), min_size=1, max_size=3),
        ),
        # round-11 orphan classes: a dead staged attempt (task died, no
        # commit message) and a crash-stranded promoted file (promoted,
        # then crash before the log write). Neither may EVER become
        # visible, and the maintenance barriers (overwrite/compact)
        # sweep them.
        st.tuples(st.just("strand"), st.just(0), st.just([])),
    )

    counter = {"n": 0}

    @given(ops=st.lists(op, min_size=1, max_size=12))
    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(ops):
        counter["n"] += 1
        from irs_990_efiler_database_spark.sources.pydatasource import (
            JsonlCommitWriter,
        )

        sink = tmp_path / f"sink{counter['n']}"
        (sink / "_staging").mkdir(parents=True)
        w = JsonlCommitStreamWriter({"path": str(sink)})
        model: dict[int, list[int]] = {}  # streaming: last commit per id
        bmodel: list[list[int]] = []  # batch appends since last overwrite
        strays: list = []  # orphans planted; must never become visible
        seq = 0
        for kind, bid, ks in ops:
            if kind == "strand":
                seq += 1
                run = f"{seq:012x}"
                dead = sink / "_staging" / f"task-{run}-0-9.jsonl"
                dead.write_text('{"k": -1}\n')
                stray = sink / f"batch-8-task-{run}-0-1.jsonl"
                stray.write_text('{"k": -2}\n')
                strays += [dead, stray]
                continue
            if kind == "compact":
                compact_jsonl_commit_log(str(sink))
                # the stopped-stream barrier swept every orphan
                assert not any(p.exists() for p in strays)
                strays = []
                continue
            seq += 1
            name = f"task-p-{seq}-0.jsonl"
            (sink / "_staging" / name).write_text(
                "".join(f'{{"k": {k}}}\n' for k in ks)
            )
            msg = [_JsonlCommit(name, len(ks))]
            if kind == "commit":
                w.commit(msg, batchId=bid)
                model[bid] = ks
            elif kind == "abort":
                w.abort(msg, batchId=bid)
            elif kind == "append":
                JsonlCommitWriter({"path": str(sink)}, overwrite=False).commit(
                    msg
                )
                bmodel.append(ks)
            else:  # overwrite: whole-sink visibility reset
                JsonlCommitWriter({"path": str(sink)}, overwrite=True).commit(
                    msg
                )
                bmodel = [ks]
                model = {}
                # the overwrite barrier swept every planted orphan
                assert not any(p.exists() for p in strays)
                strays = []
        visible: list[int] = []
        for n in _committed_names(str(sink)):
            with open(sink / n, encoding="utf-8") as fh:
                visible += [json.loads(line)["k"] for line in fh]
        want = sorted(
            [k for ks in model.values() for k in ks]
            + [k for ks in bmodel for k in ks]
        )
        assert sorted(visible) == want

    check()


def test_arrowcommit_roundtrip_batch_and_stream(spark, tmp_path):
    """The Arrow-native twin: DataSourceArrowWriter (RecordBatches into
    IPC stream files, zero per-row Python) shares the row sink's whole
    commit-log contract, and the manifest-gated Arrow reader yields
    RecordBatches back — values and schema round-trip exactly, batch
    and streaming, with schema inference from the IPC header."""
    import os
    import time

    from irs_990_efiler_database_spark.sources.pydatasource import (
        ArrowCommitDataSource,
    )

    try:
        spark.dataSource.register(ArrowCommitDataSource)
    except Exception:
        pass

    sink = tmp_path / "sink"
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)], SCHEMA
    )
    df.repartition(2).write.format("arrowcommit").mode("overwrite").save(
        str(sink)
    )
    back = spark.read.format("arrowcommit").load(str(sink))  # inferred
    assert dict(back.dtypes) == dict(df.dtypes)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    # append then overwrite behave like the row sink (shared commit code)
    df.limit(1).write.format("arrowcommit").mode("append").save(str(sink))
    assert spark.read.format("arrowcommit").load(str(sink)).count() == 4
    df.limit(1).write.format("arrowcommit").mode("overwrite").save(str(sink))
    assert spark.read.format("arrowcommit").load(str(sink)).count() == 1

    # streaming drain: per-batch commit entries, exactly-once union
    land = tmp_path / "land"
    land.mkdir()
    ssink = tmp_path / "ssink"
    ssink.mkdir()
    now = time.time()
    for i, rows in enumerate([[(1, "a", 1.0)], [(2, "b", 2.0)]]):
        out = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(out))
        (part,) = out.glob("part-*.parquet")
        dest = land / f"b{i}.parquet"
        part.rename(dest)
        os.utime(dest, (now + 10 * i, now + 10 * i))
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
        .writeStream.format("arrowcommit")
        .option("path", str(ssink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(list((ssink / "_commits").glob("*.json"))) >= 2
    got = {
        tuple(r)
        for r in spark.read.format("arrowcommit").load(str(ssink)).collect()
    }
    assert got == {(1, "a", 1.0), (2, "b", 2.0)}


def test_jsonlcommit_overwrite_crash_window_is_fenced(spark, tmp_path):
    """The overwrite's crash window (new manifest written, commit-log
    deletion never ran): the manifest's ignore_commits fence makes the
    visibility reset ATOMIC with the manifest write — a surviving stale
    commit-log entry must stay invisible, a later compaction finishes
    the GC and clears the fence, and a LATER streaming commit of the
    same batchId lifts its fence (new visibility intent)."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        compact_jsonl_commit_log,
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)

    w = JsonlCommitStreamWriter({"path": str(sink)})
    (sink / "_staging" / "task-f-0-1.jsonl").write_text(
        '{"k": 1, "s": "old", "v": 1.0}\n'
    )
    w.commit([_JsonlCommit("task-f-0-1.jsonl", 1)], batchId=0)
    stale_log = (sink / "_commits" / "0.json").read_text()
    stale_data = (sink / "batch-0-task-f-0-1.jsonl").read_text()

    spark.createDataFrame([(7, "new", 7.0)], SCHEMA).coalesce(1).write.format(
        "jsonlcommit"
    ).mode("overwrite").save(str(sink))

    # simulate the crash: the GC'd log + data file come back
    (sink / "_commits").mkdir(exist_ok=True)
    (sink / "_commits" / "0.json").write_text(stale_log)
    (sink / "batch-0-task-f-0-1.jsonl").write_text(stale_data)

    # fenced: the resurrected entry is invisible
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(7, "new", 7.0)}

    # compaction finishes the GC: fenced log + its file removed, fence
    # cleared, visibility unchanged (0 entries folded)
    assert compact_jsonl_commit_log(str(sink)) == 0
    assert not (sink / "_commits" / "0.json").exists()
    assert not (sink / "batch-0-task-f-0-1.jsonl").exists()
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(7, "new", 7.0)}

    # a NEW streaming commit of batch 0 (fresh fence scenario) is
    # visible again: re-fence, then commit id 0
    spark.createDataFrame([(8, "new2", 8.0)], SCHEMA).coalesce(1).write.format(
        "jsonlcommit"
    ).mode("overwrite").save(str(sink))
    (sink / "_staging" / "task-f-0-9.jsonl").write_text(
        '{"k": 2, "s": "fresh", "v": 2.0}\n'
    )
    (sink / "_commits").mkdir(exist_ok=True)
    (sink / "_commits" / "0.json").write_text(stale_log)  # crash again
    w.commit([_JsonlCommit("task-f-0-9.jsonl", 1)], batchId=0)
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(8, "new2", 8.0), (2, "fresh", 2.0)}


def test_arrowcommit_empty_sink_reads_as_typed_empty(spark, tmp_path):
    """An arrowcommit sink whose manifest lists no files must read back
    as an empty frame under an explicit schema (pyspark runs one task
    with a None partition for an empty partitions() list) — the same
    contract as the jsonl twin."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        ArrowCommitDataSource,
    )

    try:
        spark.dataSource.register(ArrowCommitDataSource)
    except Exception:
        pass
    sink = tmp_path / "sink"
    spark.createDataFrame([], SCHEMA).write.format("arrowcommit").mode(
        "overwrite"
    ).save(str(sink))
    got = spark.read.format("arrowcommit").schema(SCHEMA).load(str(sink))
    assert got.count() == 0
    assert dict(got.dtypes) == {"k": "bigint", "s": "string", "v": "double"}


def test_jsonlcommit_second_overwrite_collects_fenced_strays(spark, tmp_path):
    """A fenced commit log left by a half-GC'd overwrite references
    data files _committed_names hides; a SECOND overwrite must delete
    those files too (snapshotting what the sink HOLDS, not just what it
    shows) — otherwise invisible orphans accumulate across
    crash+overwrite cycles."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)

    w = JsonlCommitStreamWriter({"path": str(sink)})
    (sink / "_staging" / "task-g-0-1.jsonl").write_text(
        '{"k": 1, "s": "old", "v": 1.0}\n'
    )
    w.commit([_JsonlCommit("task-g-0-1.jsonl", 1)], batchId=0)
    stale_log = (sink / "_commits" / "0.json").read_text()
    stale_data = (sink / "batch-0-task-g-0-1.jsonl").read_text()

    # overwrite #1 "crashes" mid-GC: log + data resurrected under fence
    spark.createDataFrame([(7, "a", 7.0)], SCHEMA).coalesce(1).write.format(
        "jsonlcommit"
    ).mode("overwrite").save(str(sink))
    (sink / "_commits").mkdir(exist_ok=True)
    (sink / "_commits" / "0.json").write_text(stale_log)
    (sink / "batch-0-task-g-0-1.jsonl").write_text(stale_data)

    # overwrite #2 runs to completion: the fenced stray's log AND its
    # data file are gone, and only the new rows are visible
    spark.createDataFrame([(8, "b", 8.0)], SCHEMA).coalesce(1).write.format(
        "jsonlcommit"
    ).mode("overwrite").save(str(sink))
    assert not (sink / "batch-0-task-g-0-1.jsonl").exists()
    assert list((sink / "_commits").glob("*.json")) == []
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(8, "b", 8.0)}


def test_jsonlcommit_crash_before_unfence_stays_invisible(
    spark, tmp_path, monkeypatch
):
    """Crash-injection for the unfence ordering: a replayed commit of a
    FENCED batchId that dies after writing its new per-batch log but
    before lifting the fence must leave the batch invisible (Spark
    retries an uncommitted batch) — and the retry then converges to
    exactly-once visibility. This is the window the fence-lift-last
    ordering exists for: lifting first would resurrect the stale
    pre-overwrite entry instead."""
    from irs_990_efiler_database_spark.sources import pydatasource as pds

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)

    # leave a fence for batch 0: overwrite after a streaming commit
    w = pds.JsonlCommitStreamWriter({"path": str(sink)})
    (sink / "_staging" / "task-x-0-1.jsonl").write_text(
        '{"k": 1, "s": "old", "v": 1.0}\n'
    )
    w.commit([pds._JsonlCommit("task-x-0-1.jsonl", 1)], batchId=0)
    spark.createDataFrame([(7, "kept", 7.0)], SCHEMA).coalesce(1).write.format(
        "jsonlcommit"
    ).mode("overwrite").save(str(sink))
    # simulate the overwrite's own crash window: stale log survives
    (sink / "_commits").mkdir(exist_ok=True)
    (sink / "_commits" / "0.json").write_text(
        '{"batchId": 0, "files": [{"file": "ghost.jsonl", "rows": 1}],'
        ' "rows": 1}'
    )

    # retry batch 0 — crash exactly on the UNFENCE manifest write
    real = pds._atomic_write_json

    def crashing(dest, payload):
        if dest.endswith("_manifest.json"):
            raise OSError("injected crash before unfence")
        real(dest, payload)

    (sink / "_staging" / "task-x-0-9.jsonl").write_text(
        '{"k": 2, "s": "new", "v": 2.0}\n'
    )
    monkeypatch.setattr(pds, "_atomic_write_json", crashing)
    import pytest

    with pytest.raises(OSError, match="injected crash"):
        w.commit([pds._JsonlCommit("task-x-0-9.jsonl", 1)], batchId=0)
    monkeypatch.setattr(pds, "_atomic_write_json", real)

    # the half-committed batch is INVISIBLE (its new log exists but the
    # fence still hides it); the overwrite's rows are untouched
    got = {
        tuple(r)
        for r in pds.read_jsonl_commit(spark, str(sink), SCHEMA).collect()
    }
    assert got == {(7, "kept", 7.0)}

    # Spark retries the uncommitted batch: same id, fresh stage file —
    # converges to exactly-once visibility, fence lifted
    (sink / "_staging" / "task-x-0-11.jsonl").write_text(
        '{"k": 2, "s": "new", "v": 2.0}\n'
    )
    w.commit([pds._JsonlCommit("task-x-0-11.jsonl", 1)], batchId=0)
    got = {
        tuple(r)
        for r in pds.read_jsonl_commit(spark, str(sink), SCHEMA).collect()
    }
    assert got == {(7, "kept", 7.0), (2, "new", 2.0)}


def test_jsonlcommit_overwrite_sweeps_dead_attempts_and_strays(spark, tmp_path):
    """Orphan GC at the overwrite barrier: staged files from
    failed/killed task attempts (abort() never sees them) and promoted
    data files referenced by no log (a crash between promotion and the
    commit-log write) are collected by the next overwrite — while
    foreign files in the sink directory are never touched."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    df1 = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    df1.write.format("jsonlcommit").mode("overwrite").save(str(sink))

    # a dead attempt's staged file (valid task-attempt name shape, but
    # its task never completed so no commit message ever named it)
    dead = sink / "_staging" / "task-deadbeef0123-0-99.jsonl"
    dead.write_text('{"k": 9, "s": "dead", "v": 9.0}\n')
    # a crash-stranded promoted stray: commit() promoted it, then died
    # before the batch's log write — referenced by nothing
    stray = sink / "batch-7-task-deadbeef0123-0-1.jsonl"
    stray.write_text('{"k": 8, "s": "stray", "v": 8.0}\n')
    # foreign files: not this sink's naming contract → never swept
    (sink / "_SUCCESS").write_text("")
    (sink / "notes.txt").write_text("keep me")

    df2 = spark.createDataFrame([(2, "b", 2.0)], SCHEMA)
    df2.write.format("jsonlcommit").mode("overwrite").save(str(sink))

    assert not dead.exists() and list((sink / "_staging").iterdir()) == []
    assert not stray.exists()
    assert (sink / "_SUCCESS").exists() and (sink / "notes.txt").exists()
    got = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert got == {(2, "b", 2.0)}


def test_jsonlcommit_compaction_sweeps_orphans(spark, tmp_path):
    """Orphan GC at the stopped-stream barrier: compaction collects
    dead staged attempts and never-referenced promoted strays — even
    when there are no logs left to fold (the no-op fold still runs the
    sweep) — and the visible row set is unchanged either way."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        JsonlCommitStreamWriter,
        _JsonlCommit,
        compact_jsonl_commit_log,
        read_jsonl_commit,
    )

    _register(spark)
    sink = tmp_path / "sink"
    (sink / "_staging").mkdir(parents=True)
    w = JsonlCommitStreamWriter({"path": str(sink)})
    for b in range(2):
        name = f"task-aabbccdd00{b}0-{b}-0.jsonl"
        (sink / "_staging" / name).write_text(
            f'{{"k": {b}, "s": "b{b}", "v": {b}.0}}\n'
        )
        w.commit([_JsonlCommit(name, 1)], batchId=b)

    dead = sink / "_staging" / "task-deadbeef0123-1-77.jsonl"
    dead.write_text('{"k": 9, "s": "dead", "v": 9.0}\n')
    stray = sink / "batch-9-task-deadbeef0123-0-2.jsonl"
    stray.write_text('{"k": 8, "s": "stray", "v": 8.0}\n')

    before = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert compact_jsonl_commit_log(str(sink)) == 2
    assert not dead.exists() and not stray.exists()
    after = {tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()}
    assert after == before

    # no-logs branch: everything already folded, but the sweep is
    # still this pass's job
    dead.write_text('{"k": 9, "s": "dead", "v": 9.0}\n')
    stray.write_text('{"k": 8, "s": "stray", "v": 8.0}\n')
    assert compact_jsonl_commit_log(str(sink)) == 0
    assert not dead.exists() and not stray.exists()
    assert {
        tuple(r) for r in read_jsonl_commit(spark, str(sink), SCHEMA).collect()
    } == before


def test_row_sink_volume_warning_fires_only_on_row_path(tmp_path):
    """The VERDICT r10 watch-item made loud: a commit moving more than
    ROW_SINK_VOLUME_WARN rows through the per-row JSONL path warns and
    names the Arrow sink; the Arrow twin commits the same volume
    silently (it IS the data path)."""
    import warnings

    import pytest

    from irs_990_efiler_database_spark.sources.pydatasource import (
        ROW_SINK_VOLUME_WARN,
        ArrowCommitStreamWriter,
        JsonlCommitStreamWriter,
        _JsonlCommit,
    )

    big = ROW_SINK_VOLUME_WARN + 1

    sink = tmp_path / "row"
    (sink / "_staging").mkdir(parents=True)
    (sink / "_staging" / "task-aaaabbbbcccc-0-0.jsonl").write_text('{"k":1}\n')
    w = JsonlCommitStreamWriter({"path": str(sink)})
    with pytest.warns(RuntimeWarning, match="arrowcommit"):
        w.commit([_JsonlCommit("task-aaaabbbbcccc-0-0.jsonl", big)], batchId=0)

    arrow = tmp_path / "arrow"
    (arrow / "_staging").mkdir(parents=True)
    (arrow / "_staging" / "task-aaaabbbbcccc-0-1.arrow").write_bytes(b"")
    aw = ArrowCommitStreamWriter({"path": str(arrow)}, overwrite=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> test failure
        aw.commit([_JsonlCommit("task-aaaabbbbcccc-0-1.arrow", big)], batchId=0)

    # same contract on the BATCH writers (the warn call sits in the
    # most-rewritten method in this file — pin both paths)
    from irs_990_efiler_database_spark.sources.pydatasource import (
        ArrowCommitWriter,
        JsonlCommitWriter,
    )

    bsink = tmp_path / "brow"
    (bsink / "_staging").mkdir(parents=True)
    (bsink / "_staging" / "task-aaaabbbbcccc-1-0.jsonl").write_text('{"k":2}\n')
    bw = JsonlCommitWriter({"path": str(bsink)}, overwrite=False)
    with pytest.warns(RuntimeWarning, match="arrowcommit"):
        bw.commit([_JsonlCommit("task-aaaabbbbcccc-1-0.jsonl", big)])

    barrow = tmp_path / "barrow"
    (barrow / "_staging").mkdir(parents=True)
    (barrow / "_staging" / "task-aaaabbbbcccc-1-1.arrow").write_bytes(b"")
    baw = ArrowCommitWriter({"path": str(barrow)}, overwrite=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        baw.commit([_JsonlCommit("task-aaaabbbbcccc-1-1.arrow", big)])

    # the advisory must NEVER affect commit outcome: under
    # warnings-as-errors the row-path commit still completes and its
    # log is durable (the warn fires after durability and swallows the
    # raise)
    sink2 = tmp_path / "row2"
    (sink2 / "_staging").mkdir(parents=True)
    (sink2 / "_staging" / "task-aaaabbbbcccc-2-0.jsonl").write_text('{"k":3}\n')
    w2 = JsonlCommitStreamWriter({"path": str(sink2)})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        w2.commit([_JsonlCommit("task-aaaabbbbcccc-2-0.jsonl", big)], batchId=0)
    assert (sink2 / "_commits" / "0.json").exists()


def test_jsonlcommit_binary_and_struct_roundtrip(spark, tmp_path):
    """Binary payloads round-trip BIT-EXACT through the row sink:
    pre-r12 the JSON staging serialized bytearrays via default=str —
    "bytearray(b'..')" on disk, silent corruption for any binary
    column (VERDICT r11 #3's multimodal-payload shape). Staging now
    base64-encodes bytes (what Spark's JSON reader decodes for
    BinaryType) and converts nested struct Rows recursively."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        read_jsonl_commit,
    )

    _register(spark)
    schema = "media_id long, payload binary, meta struct<w:int,h:int>"
    rows = [
        (i, bytes(range(256)) * (i + 1), (i, i * 2)) for i in range(5)
    ] + [(99, None, None)]
    df = spark.createDataFrame(rows, schema)
    sink = str(tmp_path / "s")
    df.write.format("jsonlcommit").mode("overwrite").save(sink)
    back = read_jsonl_commit(spark, sink, schema)
    assert dict(back.dtypes) == dict(df.dtypes)

    def norm(frame):
        return sorted(
            (
                r["media_id"],
                None if r["payload"] is None else bytes(r["payload"]),
                None if r["meta"] is None else tuple(r["meta"]),
            )
            for r in frame.collect()
        )

    assert norm(back) == norm(df)
    # non-UTF8 bytes survived bit-exact (the case str() mangled)
    got = {r[0]: r[1] for r in norm(back)}
    assert got[0] == bytes(range(256))


def test_arrowcommit_binary_payload_roundtrip(spark, tmp_path):
    """The Arrow twin at the BINARY-payload shape it exists for
    (VERDICT r11 #3): synthetic media rows (opaque payload bytes +
    typed meta struct) through arrowcommit, values bit-exact both
    directions, schema inferred from the IPC header."""
    from irs_990_efiler_database_spark.sources.pydatasource import (
        ArrowCommitDataSource,
    )

    try:
        spark.dataSource.register(ArrowCommitDataSource)
    except Exception:
        pass
    schema = "media_id long, kind string, payload binary, meta struct<w:int,h:int>"
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes(range(256)) * 40, (64, 48))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, schema)
    sink = str(tmp_path / "sink")
    df.repartition(4).write.format("arrowcommit").mode("overwrite").save(sink)
    back = spark.read.format("arrowcommit").load(sink)
    assert dict(back.dtypes) == dict(df.dtypes)

    def norm(frame):
        return sorted(
            (r["media_id"], r["kind"], bytes(r["payload"]), tuple(r["meta"]))
            for r in frame.collect()
        )

    assert norm(back) == norm(df)
