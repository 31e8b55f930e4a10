"""Pluggable external connectors: HBase source, MongoDB sink.

The engine's pipelines consume/produce plain DataFrames, so connectors are
a thin edge layer (BASELINE.json approach: "Spark HBase connector read +
MongoDB Spark connector write"). Neither connector jar ships in this
container, so each entry point probes for its data source at call time and
raises a clear ``ConnectorUnavailable`` otherwise; the parquet fixture
source (``sources.catalog`` / ``sources.fixtures``) is the in-repo stand-in
with the identical (key, ts, value) contract.

Scale notes:
- the HBase connector exposes region boundaries as input splits — the
  moral equivalent of the reference's first-byte range partitioner
  (HBasePartitioner.kt:12-37); time-range and column filters push down to
  region servers;
- the Mongo connector writes per-partition bulk upserts; ``ordered=false``
  + sharded-collection splitVector keep 1000-executor writes balanced.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConnectorUnavailable(RuntimeError):
    pass


# The reference's qualified-table pattern (TextUtils.kt:7-8): an optional
# leading environment prefix (`db.`), then namespace, then table —
# `db.core.claimant` / `core.claimant` both map to namespace `core`,
# table `claimant`. Hyphens become underscores in the HBase name
# (HBaseReader.kt:121-128).
_QUALIFIED_TABLE = re.compile(r"^(?:\w+\.)?([-\w]+)\.([-\w]+)$")


def topic_to_table(name: str) -> tuple[str, str]:
    """Map a topic name (or an already-qualified ``namespace:table``) to
    the (namespace, table) pair the HBase catalog needs.

    Mirrors ``TextUtils.topicNameTableMatcher`` + the qualified-name
    construction in ``HBaseReader.newScanner`` (HBaseReader.kt:121-128):
    ``db.core.claimant-data`` → ``("core", "claimant_data")``. Raises a
    clear ``ValueError`` for malformed names instead of the opaque
    format-string crash a bare ``split(':')`` used to produce."""
    if ":" in name:
        namespace, _, table = name.partition(":")
        if not namespace or not table or ":" in table:
            raise ValueError(
                f"malformed qualified table name {name!r}; expected "
                "'namespace:table'"
            )
        # reference replaces '-' across the whole qualified name
        # (HBaseReader.kt:124): namespace AND table
        return namespace.replace("-", "_"), table.replace("-", "_")
    m = _QUALIFIED_TABLE.match(name)
    if not m:
        raise ValueError(
            f"malformed topic name {name!r}; expected "
            "'[db.]namespace.table' (TextUtils.kt:7-8) or 'namespace:table'"
        )
    return m.group(1).replace("-", "_"), m.group(2).replace("-", "_")


def _probe_format(spark: SparkSession, fmt: str, options: dict) -> DataFrame:
    try:
        return spark.read.format(fmt).options(**options).load()
    except Exception as e:  # jar missing / class not found
        raise ConnectorUnavailable(
            f"data source {fmt!r} is not on the classpath; add the connector "
            f"jar (spark.jars.packages) or use the parquet fixture source"
        ) from e


def read_hbase(
    spark: SparkSession,
    table: str,
    ts_start: int | None = None,
    ts_end: int | None = None,
    scanner_caching: int | None = 1000,
    cache_blocks: bool = False,
    timeline_consistency: bool = False,
    fmt: str = "org.apache.hadoop.hbase.spark",
) -> DataFrame:
    """HBase table → DataFrame[key: binary, ts: long, value: string].

    Mirrors the reference read surface (HBaseReader.kt:34-60,145-187):
    single column family ``cf``, qualifier ``record``, newest cell within
    the optional time range (connector-side maxVersions=1 + time-range
    pushdown), client scanner caching (``scan.cache.size``, default 1000),
    block-cache opt-out for the one-shot snapshot scan
    (``scan.cache.blocks``), and TIMELINE consistency for region-replica
    reads (``HBaseReader.kt:152-154``)."""
    namespace, table_name = topic_to_table(table)
    catalog = json.dumps(
        {
            "table": {"namespace": namespace, "name": table_name},
            "rowkey": "key",
            "columns": {
                "key": {"cf": "rowkey", "col": "key", "type": "binary"},
                "value": {"cf": "cf", "col": "record", "type": "string"},
            },
        },
        separators=(",", ":"),
    )
    options = {"catalog": catalog, "hbase.spark.use.hbasecontext": "false"}
    if ts_start is not None:
        options["hbase.spark.query.timerange.start"] = str(ts_start)
    if ts_end is not None:
        options["hbase.spark.query.timerange.end"] = str(ts_end)
    if scanner_caching is not None:
        options["hbase.spark.scanner.caching"] = str(scanner_caching)
    options["hbase.spark.scanner.cacheblocks"] = str(cache_blocks).lower()
    if timeline_consistency:
        options["hbase.spark.query.consistency"] = "TIMELINE"
    df = _probe_format(spark, fmt, options)
    # the connector exposes the cell timestamp as metadata when requested;
    # normalize to the engine's (key, ts, value) contract
    if "ts" not in df.columns:
        df = df.withColumn("ts", F.lit(0).cast("long"))
    return df.select("key", "ts", "value")


def write_mongo(
    records: DataFrame,
    uri: str,
    database: str,
    collection: str,
    ordered: bool = False,
    fmt: str = "mongodb",
) -> None:
    """Write the export pipeline's records to MongoDB via the Spark
    connector (one bulk writer per partition; unordered bulks tolerate
    retried tasks)."""
    try:
        (
            records.write.format(fmt)
            .mode("append")
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .option("ordered", str(ordered).lower())
            .save()
        )
    except Exception as e:
        raise ConnectorUnavailable(
            f"data source {fmt!r} is not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector to spark.jars.packages"
        ) from e
