"""Data-layout maintenance: small-file compaction and multi-dimensional
clustering.

Two jobs a 100 TB lake runs constantly that the query layer depends on:

- ``compact``: streaming/incremental sinks (our foreachBatch export, any
  micro-batch writer) accumulate many small files; scans then pay one
  task + one open per file. Compaction rewrites a table into
  target-sized files. Range-partitioning by a sort key keeps each output
  file covering a narrow key interval, so parquet min/max row-group
  stats prune file scans for range predicates after the rewrite.

- ``morton_cluster``: a single sort key only prunes predicates on that
  key. Interleaving the bits of two normalized keys (Morton / Z-order
  curve) gives a layout where files are simultaneously narrow in BOTH
  dimensions — the standard multi-dim clustering trick (Delta/Iceberg
  OPTIMIZE ZORDER) built here from plain column expressions:
  rank-normalize each key to 16 bits via ntile, interleave with
  shift/or, repartitionByRange on the code.

Everything is built-in expressions — no UDFs, no collect; the only data
movement is the one range-exchange the rewrite itself requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compact(
    df: DataFrame,
    path: str,
    sort_col: str | None = None,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` as ``target_files`` parquet files (default: the
    session's shuffle parallelism), optionally range-clustered on
    ``sort_col`` so min/max stats stay selective."""
    if target_files is None:
        target_files = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    out = (
        df.repartitionByRange(target_files, F.col(sort_col))
        if sort_col
        else df.repartition(target_files)
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns
    into a single Z-order key (a's bits in even positions)."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        code = (
            code.bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return code


def morton_cluster(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    target_files: int = 16,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` Z-ordered on (col_a, col_b).

    The raw values are first rank-normalized to [0, 2^bits) with ntile —
    Z-order needs uniformly distributed coordinates or one skewed
    dimension dominates the interleave. ntile is a global window (one
    pass); at extreme scale substitute approx-quantile bucket edges
    computed on a sample and a range-bucket join, which removes the
    single-partition window at the cost of approximate ranks."""
    n = 1 << bits
    wa = Window.orderBy(F.col(col_a))
    wb = Window.orderBy(F.col(col_b))
    coded = df.withColumn(
        "__z",
        morton_code(
            (F.ntile(n).over(wa) - 1),
            (F.ntile(n).over(wb) - 1),
            bits,
        ),
    )
    (
        coded.repartitionByRange(target_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
