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

    Offset = the count of files processed over the SORTED name order.
    Index files are append-only by contract (a yearly file lands once),
    so name-sorted prefixes are a valid total order: latestOffset()
    lists the directory on the driver (names only), partitions(start,
    end) hands each NEW file to one executor-side InputPartition, and
    read() is byte-identical to the batch reader. Exactly-once comes
    from Spark's offset log: a batch replays with the same [start, end)
    file slice after a crash."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("irs990index requires a path (load(<glob>))")

    def _files(self) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(self._files())}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = self._files()[start["n"] : end["n"]]
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
