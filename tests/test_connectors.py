"""Connector edge (SURVEY §2.1 S1): option wiring for the HBase source
and the MongoDB sink, exercised WITHOUT connector jars via registered
Python DataSources that echo the options they receive.

The table-name mapping mirrors the reference's topic→table logic
(TextUtils.kt:7-8, HBaseReader.kt:121-128): `[db.]namespace.table` →
`namespace:table` with hyphens replaced by underscores.
"""

import json

import pytest

from hbase_to_mongo_export_spark.sources.connectors import (
    ConnectorUnavailable,
    read_hbase,
    topic_to_table,
    write_mongo,
)


# ---------------------------------------------------------------------------
# topic_to_table: pure mapping, reference parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,expected",
    [
        ("db.core.claimant", ("core", "claimant")),
        ("core.claimant", ("core", "claimant")),
        ("db.core.claimant-data", ("core", "claimant_data")),
        ("db.agent-core.claimant-event", ("agent_core", "claimant_event")),
        ("core:claimant", ("core", "claimant")),
        ("core:claimant-data", ("core", "claimant_data")),
    ],
)
def test_topic_to_table_valid(name, expected):
    assert topic_to_table(name) == expected


@pytest.mark.parametrize(
    "bad", ["claimant", "", "a.b.c.d", "ns:", ":tbl", "a:b:c", "a b.c!"]
)
def test_topic_to_table_malformed_raises_value_error(bad):
    with pytest.raises(ValueError, match="malformed"):
        topic_to_table(bad)


# ---------------------------------------------------------------------------
# Fake HBase source: echoes the options read_hbase builds
# ---------------------------------------------------------------------------

import sys  # noqa: E402

import pyspark.cloudpickle as _cp  # noqa: E402
from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
)

# the fake sources below run inside executor Python workers, which cannot
# import this test module by name — ship them by value
_cp.register_pickle_by_value(sys.modules[__name__])


class _EchoReader(DataSourceReader):
    def __init__(self, options):
        self.options = dict(options)

    def read(self, partition):
        yield (b"k1", 100, json.dumps(self.options, sort_keys=True))


class FakeHBaseSource(DataSource):
    @classmethod
    def name(cls):
        return "fake_hbase"

    def schema(self):
        return "key binary, ts bigint, value string"

    def reader(self, schema):
        return _EchoReader(dict(self.options))


def _read_options(spark, **kwargs):
    spark.dataSource.register(FakeHBaseSource)
    df = read_hbase(spark, fmt="fake_hbase", **kwargs)
    assert df.columns == ["key", "ts", "value"]
    [row] = df.collect()
    return json.loads(row["value"])


def test_read_hbase_catalog_from_topic_name(spark):
    opts = _read_options(spark, table="db.core.claimant-data")
    catalog = json.loads(opts["catalog"])
    assert catalog["table"] == {"namespace": "core", "name": "claimant_data"}
    assert catalog["rowkey"] == "key"
    assert catalog["columns"]["value"] == {
        "cf": "cf",
        "col": "record",
        "type": "string",
    }
    # defaults: caching 1000, block cache off, no time range, no TIMELINE
    assert opts["hbase.spark.scanner.caching"] == "1000"
    assert opts["hbase.spark.scanner.cacheblocks"] == "false"
    assert "hbase.spark.query.timerange.start" not in opts
    assert "hbase.spark.query.consistency" not in opts


def test_read_hbase_time_range_and_timeline(spark):
    opts = _read_options(
        spark,
        table="core:claimant",
        ts_start=1000,
        ts_end=253402300800000,
        scanner_caching=500,
        cache_blocks=True,
        timeline_consistency=True,
    )
    assert opts["hbase.spark.query.timerange.start"] == "1000"
    assert opts["hbase.spark.query.timerange.end"] == "253402300800000"
    assert opts["hbase.spark.scanner.caching"] == "500"
    assert opts["hbase.spark.scanner.cacheblocks"] == "true"
    assert opts["hbase.spark.query.consistency"] == "TIMELINE"


def test_read_hbase_malformed_table_is_clear_error(spark):
    # the r4 verdict's latent bug: a namespace-less name used to crash
    # with a bare TypeError from '%'-formatting
    with pytest.raises(ValueError, match="malformed topic name"):
        read_hbase(spark, table="claimant", fmt="fake_hbase")


def test_read_hbase_missing_format_raises_connector_unavailable(spark):
    with pytest.raises(ConnectorUnavailable, match="not on the classpath"):
        read_hbase(spark, table="core:claimant", fmt="no.such.DataSource")


# ---------------------------------------------------------------------------
# Fake Mongo sink: captures the options write_mongo passes
# ---------------------------------------------------------------------------


class _SinkCommit(WriterCommitMessage):
    def __init__(self, n):
        self.n = n


class _CaptureWriter(DataSourceWriter):
    def __init__(self, options):
        self.options = dict(options)

    def write(self, iterator):
        return _SinkCommit(sum(1 for _ in iterator))

    def commit(self, messages):
        with open(self.options["connection.uri"], "w") as f:
            json.dump(
                {
                    "options": self.options,
                    "rows": sum(m.n for m in messages),
                },
                f,
            )

    def abort(self, messages):
        pass


class FakeMongoSink(DataSource):
    @classmethod
    def name(cls):
        return "fake_mongo"

    def writer(self, schema, overwrite):
        return _CaptureWriter(dict(self.options))


def test_write_mongo_option_wiring(spark, tmp_path):
    spark.dataSource.register(FakeMongoSink)
    sink = str(tmp_path / "mongo_capture.json")
    df = spark.range(7).selectExpr("CAST(id AS STRING) AS _id")
    write_mongo(
        df,
        uri=sink,
        database="core",
        collection="claimant",
        fmt="fake_mongo",
    )
    with open(sink) as f:
        captured = json.load(f)
    assert captured["rows"] == 7
    assert captured["options"]["database"] == "core"
    assert captured["options"]["collection"] == "claimant"
    assert captured["options"]["ordered"] == "false"
    assert captured["options"]["connection.uri"] == sink


def test_write_mongo_missing_format_raises_connector_unavailable(spark):
    df = spark.range(1).selectExpr("CAST(id AS STRING) AS _id")
    with pytest.raises(ConnectorUnavailable, match="not on the classpath"):
        write_mongo(df, uri="x", database="d", collection="c",
                    fmt="no.such.Sink")
