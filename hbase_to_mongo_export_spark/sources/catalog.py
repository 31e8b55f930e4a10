"""Table catalog over the driver-generated parquet fixtures.

The reference addresses data by "topic" name mapped to an HBase table
(``src/main/kotlin/app/utils/TextUtils.kt:7-8`` in the reference); here the
analogous surface is a named-table catalog over a directory of parquet
files, registered as temp views so the full Spark SQL surface applies.

Scale note: ``spark.read.parquet`` gives Catalyst the native vectorized
scan with predicate pushdown and column pruning; partition count follows
``spark.sql.files.maxPartitionBytes`` (128 MB default), which is the right
knob at 100 TB — never ``repartition()`` right after a scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class TableUnavailableError(Exception):
    """The source table/path does not exist — the reference's
    TableNotFoundException, which is NEVER skipped (JobConfiguration.kt:57-61)
    and folds to the Table_Unavailable export status
    (JobCompletionNotificationListener.kt:69-91)."""


def read_export_source(spark: SparkSession, path: str) -> DataFrame:
    """Read an export-source table, raising TableUnavailableError when the
    path is missing (local or file:// paths; object-store URIs surface the
    same condition as Spark's PATH_NOT_FOUND, which run_export also maps
    to Table_Unavailable)."""
    local = path[len("file://"):] if path.startswith("file://") else path
    if "://" not in path and not os.path.exists(local):
        raise TableUnavailableError(f"source table not found: {path}")
    return _read_parquet_nanos_safe(spark, path)


# Per-session memo of the fixture-table DataFrames. ``spark.read.parquet``
# re-resolves schema and file listing on EVERY call — pure driver latency
# that a query pays once per build (a 6-table join re-resolves 6 tables,
# and the bench rebuilds each query 4×). Spark itself caches file listings
# per session for exactly this reason (guide §6); this extends that to
# the resolved relation. The memo holds LOGICAL PLANS, not data: every
# action still scans the parquet inputs, and the memo dies with the
# session/process (nothing persists across bench/oracle invocations).
# Safe because fixture dirs are immutable within a session — the contract
# is that NOTHING may write to a path later passed to load_table() in the
# same session (all lakehouse/staging writes go to _qstage mkdtemp dirs,
# never into sf_dir). Keyed on the PySpark session OBJECT via weak
# references: identity keying cannot collide across sessions (the JVM
# hashCode it previously used is not unique), entries die with their
# session, and two concurrently live sessions each keep their own dict
# instead of thrashing a shared one.
import weakref

_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def clear_table_memo() -> None:
    """Drop every memoized relation (all sessions). Bench hygiene hook:
    bench.py clears the memo between queries so each query's first build
    pays full relation resolution (cold driver), while the query's own
    repeat builds within one measurement share it the way a long-lived
    production session would."""
    _TABLE_MEMO.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        per = _TABLE_MEMO.get(spark)
        if per is None:
            per = {}
            _TABLE_MEMO[spark] = per
    except TypeError:
        # session implementation that is unhashable or rejects weakrefs
        # (e.g. a future Connect session) — skip memoization, stay correct
        per = {}
    key = (os.path.abspath(sf_dir), name)
    df = per.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = _read_parquet_nanos_safe(spark, path)
        if name == "events":
            df = normalize_event_ts(df)
        per[key] = df
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """The events.ts column has shipped as TIMESTAMP(NANOS) (read as long
    nanos under the legacy flag) and as TIMESTAMP_NTZ(micros) across
    testdata generations; normalize both to session-zone TIMESTAMP
    (UTC session ⇒ value-identical to DuckDB's TIMESTAMP)."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) (unsupported by Spark's
    converter) via the session-settable nanosAsLong legacy flag."""
    try:
        return spark.read.parquet(path)
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# ---------------------------------------------------------------------------
# Multi-format IO: the engine's generic source/sink surface beyond parquet.
# The reference's only output format is JSONL-with-manifest (SURVEY §2.1
# S4-S6); re-reading those snapshots with spark.read.json makes exports
# directly queryable, and CSV/ORC round out interchange formats.
# ---------------------------------------------------------------------------

_FORMATS = ("parquet", "json", "csv", "orc")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatched read. CSV defaults to header+inferSchema unless a
    schema is given (at 100 TB always pass a schema: inference scans the
    data twice). JSON likewise: with an explicit schema the reader is a
    single streaming pass with full predicate/column pruning on the
    projected columns."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    reader = spark.read
    if fmt == "csv":
        # header must be skipped whether or not a schema is supplied
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).format(fmt).load(path)


def write_any(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Format-dispatched write (overwrite). CSV writes a header so the
    output is self-describing for read_any."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.options(**options).format(fmt).save(path)
