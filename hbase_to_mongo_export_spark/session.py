"""SparkSession factory.

Centralizes the configuration we want everywhere: AQE (runtime re-planning,
skew-join handling), Arrow for pandas UDFs, UTC session timezone (so results
agree with the DuckDB oracle), and a shuffle-partition count sized to the
local test harness while remaining overridable for cluster deployment.

At 100 TB the same code runs with ``master=None`` (cluster-provided) and
``shuffle_partitions`` sized ~2-3× total executor cores; AQE coalesces
small post-shuffle partitions so over-provisioning is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hbase-to-mongo-export-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    conf: dict[str, str] = {
        # Runtime re-planning: coalesce small shuffle partitions, convert
        # sort-merge joins to broadcast when runtime stats allow, split skewed
        # partitions (the salting-for-skew story at scale).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Arrow: vectorized transfer for pandas UDFs / toPandas.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Deterministic wall-clock semantics; matches the DuckDB oracle.
        "spark.sql.session.timeZone": "UTC",
        # Parquet scans: keep pushdown + vectorized reader on (defaults, but
        # pinned here so a misconfigured environment can't silently regress).
        # Scan split size: 16 MB suits a single-node many-core box reading
        # modest files (32-way parallelism instead of 1 task per small
        # file); cluster deployments at 100 TB should override to the
        # 128-256 MB range via SPARK_GRAFT_MAX_PARTITION_BYTES.
        "spark.sql.files.maxPartitionBytes": os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"
        ),
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.enableVectorizedReader": "true",
        # Write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96
        # carries NO parquet min/max statistics, so timestamp predicates
        # could never data-skip on MERGE-table files (and Iceberg/Delta
        # forbid INT96 outright).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # Driver testdata uses TIMESTAMP(NANOS); read as long + convert
        # (sources.catalog truncates to microseconds, DuckDB-compatible).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Local mode is a single JVM: cap the UI off for speed/quiet.
        "spark.ui.enabled": "false",
        # Local-mode JVM heap defaults to 1g — far below this box's RAM —
        # and an undersized heap turns big sorts/joins into
        # SparkOutOfMemoryError instead of spills. Only effective before
        # JVM start (i.e. for sessions this builder creates).
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "8g"),
        # JVM unified logging (e.g. [warning][gc,alloc] under memory
        # pressure) writes to STDOUT, which must stay pure for callers
        # that parse our output (bench.py emits exactly one JSON line).
        "spark.driver.extraJavaOptions": "-Xlog:disable",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
