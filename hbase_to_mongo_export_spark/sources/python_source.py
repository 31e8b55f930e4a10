"""Python DataSource (Spark 4 DataSource API) for the envelope fixture.

``sources.fixtures.source_records`` builds rows on the driver — fine for
unit tests, wrong for volume. This source generates the SAME deterministic
envelope records (fixtures.envelope_row) inside executor tasks, split into
range partitions — the scalable form: generation cost is spread across the
cluster, no driver materialization, and each partition is independently
re-executable (Spark task retry semantics, the engine's answer to the
reference's scan resume — SURVEY §2.1 S2).

It is also the engine's demonstration of the Python DataSource V2 surface
itself: schema(), partitions(), per-partition read() — the same contract a
real HBase-backed Python source would implement.

Usage::

    register_python_sources(spark)
    df = (spark.read.format("envelope_fixture")
          .option("n", 100_000).option("partitions", 32).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FIXTURE_SOURCE_NAME = "envelope_fixture"
FIXTURE_SOURCE_SCHEMA = "key binary, ts bigint, value string"


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EnvelopeFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 10_000))
        self.database = options.get("database", "database")
        self.collection = options.get("collection", "collection")
        self.plaintext = str(options.get("plaintext", "false")).lower() == "true"
        self.n_partitions = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        per = -(-self.n // self.n_partitions)  # ceil
        return [
            _Range(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ] or [_Range(0, 0)]

    def read(self, partition: _Range):
        # import inside the task: the generator runs executor-side
        from .fixtures import envelope_row

        for i in range(partition.start, partition.end):
            key, ts, value = envelope_row(
                i, self.database, self.collection, plaintext=self.plaintext
            )
            yield (key, ts, value)


class EnvelopeFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FIXTURE_SOURCE_NAME

    def schema(self) -> str:
        return FIXTURE_SOURCE_SCHEMA

    def reader(self, schema) -> EnvelopeFixtureReader:
        return EnvelopeFixtureReader(dict(self.options))


def register_python_sources(spark) -> None:
    """Idempotently register the package's Python data sources."""
    spark.dataSource.register(EnvelopeFixtureDataSource)


def read_fixture_source(
    spark,
    n: int = 10_000,
    partitions: int = 8,
    database: str = "database",
    collection: str = "collection",
    plaintext: bool = False,
):
    """Distributed fixture source: same rows as fixtures.source_records,
    generated in ``partitions`` parallel executor tasks."""
    register_python_sources(spark)
    return (
        spark.read.format(FIXTURE_SOURCE_NAME)
        .option("n", n)
        .option("partitions", partitions)
        .option("database", database)
        .option("collection", collection)
        .option("plaintext", str(plaintext).lower())
        .load()
    )


# ---------------------------------------------------------------------------
# Writer side of the Python DataSource API: a transactional local JSONL
# sink. Demonstrates the full writer contract the MongoDB sink would
# implement: per-task write -> commit message, driver-side commit
# manifest, abort cleanup. Files land as part-<taskid>-<uuid>.jsonl and
# become visible only through the _MANIFEST the driver writes on commit —
# the same visibility discipline as a real object-store committer.
# ---------------------------------------------------------------------------

JSONL_SINK_NAME = "jsonl_local"


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, records: int):
        self.path = path
        self.records = records


class JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        _os.makedirs(self.path, exist_ok=True)
        tid = TaskContext.get().partitionId() if TaskContext.get() else 0
        name = f"part-{tid:05d}-{_uuid.uuid4().hex[:8]}.jsonl"
        full = _os.path.join(self.path, name)
        n = 0
        with open(full, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(full, n)

    def commit(self, messages):
        import json as _json
        import os as _os

        manifest = {
            "files": sorted(m.path for m in messages if m is not None),
            "records": sum(m.records for m in messages if m is not None),
        }
        with open(_os.path.join(self.path, "_MANIFEST"), "w") as fh:
            _json.dump(manifest, fh)

    def abort(self, messages):
        import os as _os

        for m in messages or []:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class LocalJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return JSONL_SINK_NAME

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(dict(self.options))


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(LocalJsonlDataSource)


# ---------------------------------------------------------------------------
# Streaming half of the Python DataSource API: micro-batch envelope
# fixture stream with replayable offsets. Offsets are record indices, so
# readBetweenOffsets regenerates any batch deterministically — the
# exactly-once recovery contract (a failed batch replays identically).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class EnvelopeFixtureStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 10_000))
        self.batch = max(1, int(options.get("batch", 1000)))
        self.database = options.get("database", "database")
        self.collection = options.get("collection", "collection")
        self.plaintext = str(options.get("plaintext", "false")).lower() == "true"

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, start: int, end: int):
        from .fixtures import envelope_row

        for i in range(start, end):
            yield envelope_row(
                i, self.database, self.collection, plaintext=self.plaintext
            )

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.n)
        # list-backed iterator: Spark's prefetch cache copy.copy()s it,
        # which a generator can't survive
        return iter(list(self._rows(lo, hi))), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["i"]), int(end["i"]))


def _fixture_simple_stream_reader(self, schema):
    return EnvelopeFixtureStreamReader(dict(self.options))


# attach the streaming reader to the same registered source
EnvelopeFixtureDataSource.simpleStreamReader = _fixture_simple_stream_reader
