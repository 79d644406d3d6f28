"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
for the yearly filing-index files — the connector-surface counterpart
of ``sources.index.read_index_files``.

Why both exist: the wholetext+``from_json`` path is the plan-native
route (JVM parsing, Catalyst all the way down) and stays the default;
this DataSource demonstrates the engine's *extension* surface — the
same one a user would implement for a REST catalog, a proprietary
archive format, or a paginated API the built-in readers can't express.
The scale contract is the partition list: ONE InputPartition per index
file, so a 30-file index fans out to 30 executor-side tasks, each
parsing its own file with the stdlib ``json`` module and yielding
tuples; no driver-side row materialization.

Registration:
    spark.dataSource.register(Irs990IndexDataSource)
    spark.read.format("irs990index").load("/path/index_*.json")
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .index import INDEX_ENTRY


class _IndexFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class Irs990IndexReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("irs990index requires a path (load(<glob>))")

    def partitions(self) -> list[InputPartition]:
        # driver-side listing only — file CONTENTS are read on
        # executors. glob covers local/NFS test paths; a cloud
        # deployment would list via its object-store SDK here.
        import glob as _glob

        paths = sorted(_glob.glob(self.path))
        if not paths:
            raise FileNotFoundError(self.path)
        return [_IndexFilePartition(p) for p in paths]

    def read(self, partition: _IndexFilePartition):
        import json

        with open(partition.path, encoding="utf-8") as fh:
            wrapped = json.load(fh)
        fields = [f.name for f in INDEX_ENTRY.fields]
        # the wrapping key varies per year ({"Filings2015": [...]})
        for entries in wrapped.values():
            for e in entries:
                yield tuple(e.get(name) for name in fields)


class Irs990IndexDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "irs990index"

    def schema(self):
        return INDEX_ENTRY

    def reader(self, schema) -> Irs990IndexReader:
        return Irs990IndexReader(self.options)

    def streamReader(self, schema) -> "Irs990IndexStreamReader":
        return Irs990IndexStreamReader(self.options)


class Irs990IndexStreamReader(DataSourceStreamReader):
    """Streaming variant of the index connector: the landing prefix is
    watched and each micro-batch reads exactly the files that arrived
    since the last committed offset — the connector-surface analog of
    jobs.build_database_incremental's file-source watcher, for sources
    the built-in file stream can't express (REST catalogs, paginated
    APIs).

    Offset = a lexicographic HIGH-WATER MARK (the largest filename
    included so far), not a positional count: partitions(start, end)
    selects names strictly in ``(start.hwm, end.hwm]``, so a file that
    lands between latestOffset() and partitions() can never shift the
    selection (a count-into-a-re-evaluated-sorted-list slice could
    silently skip one already-present file and re-read another). Every
    name belongs to exactly one non-overlapping interval → exactly-once
    via Spark's offset log, with replay re-selecting the identical set
    (files are immutable once landed).

    The remaining assumption is MONOTONIC ARRIVAL: names must land in
    ascending sort order (yearly index files do). A backfilled file
    sorting at or below the committed mark would fall in an
    already-committed interval and be lost — so latestOffset() tracks
    every name listed this run and raises a hard error when a
    never-seen name appears at or below the high-water mark, instead of
    dropping it silently. (Across a driver restart the in-run ledger is
    gone; a file backfilled while the stream was down is not
    detectable — re-land it under a name above the mark.)"""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("irs990index requires a path (load(<glob>))")
        self._hwm_listed = ""  # largest name this run has offered
        self._names_listed: set[str] = set()
        # snapshot of the listing behind the most recent latestOffset(),
        # so partitions() never re-globs a moving directory mid-batch
        self._snapshot: tuple[str, list[str]] | None = None

    def _files(self) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"hwm": ""}

    def latestOffset(self) -> dict:
        files = self._files()
        late = [
            f
            for f in files
            if f <= self._hwm_listed and f not in self._names_listed
        ]
        if late:
            raise RuntimeError(
                "irs990index stream: out-of-order arrival — "
                f"{late} sort at or below the high-water mark "
                f"{self._hwm_listed!r} and would be silently skipped. "
                "Names must arrive in ascending sort order; re-land the "
                "file under a name above the mark."
            )
        self._names_listed.update(files)
        if files:
            self._hwm_listed = max(self._hwm_listed, files[-1])
        self._snapshot = (self._hwm_listed, files)
        return {"hwm": self._hwm_listed}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = start.get("hwm", ""), end.get("hwm", "")
        if self._snapshot is not None and self._snapshot[0] == e:
            # same-run path: the exact list latestOffset() saw — a file
            # landing in the latestOffset→partitions window cannot
            # change this batch's selection
            listing = self._snapshot[1]
        else:
            # replay after restart: files are immutable and (by the
            # validated contract) monotonic, so a fresh listing
            # filtered to the committed name range reproduces the batch
            listing = self._files()
        files = [f for f in listing if s < f <= e]
        return [_IndexFilePartition(p) for p in files]

    def read(self, partition: _IndexFilePartition):
        import json

        with open(partition.path, encoding="utf-8") as fh:
            wrapped = json.load(fh)
        fields = [f.name for f in INDEX_ENTRY.fields]
        for entries in wrapped.values():
            for e in entries:
                yield tuple(e.get(name) for name in fields)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint offset log; nothing to
        # acknowledge source-side (files are immutable once landed)
        return None
