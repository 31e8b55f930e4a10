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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
