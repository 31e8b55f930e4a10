"""Structured Streaming surface.

The reference's "incremental" mode is a batch time-range predicate
(SURVEY §2.2 P4). The continuous-operation analogue is Structured
Streaming: the same envelope pipeline fed by ``readStream`` with a
watermark on the version timestamp, plus generic windowed aggregation
over event streams.

Both entry points use ``Trigger.AvailableNow`` semantics for testability —
they drain whatever data exists and stop, which is also the recommended
incremental-batch deployment shape (run-on-schedule, checkpoint carries
progress; at 100 TB this gives exactly-once file-to-file pipelines without
a long-running cluster).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Tumbling-window counts per event_type over a parquet-backed stream.

    Returns the final (batch) result table after draining available input —
    identical to the batch ``groupBy(window(...))`` answer, which is how
    it's oracle-checked."""
    from ..sources.catalog import _read_parquet_nanos_safe

    batch_df = _read_parquet_nanos_safe(spark, events_path)
    # file source needs a directory; point at the single file via glob
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    if dict(stream.dtypes).get("ts") == "bigint":  # TIMESTAMP(NANOS) source
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink_table = f"stream_out_{uuid.uuid4().hex[:8]}"
    ckpt = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"ckpt_{uuid.uuid4().hex[:8]}"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def incremental_export(
    spark: SparkSession,
    source_dir: str,
    cfg,
    checkpoint_dir: str,
) -> None:
    """Continuous variant of the export pipeline: stream the HBase-shaped
    source and run the full parse→decrypt→normalize→sanitise pipeline per
    micro-batch via foreachBatch (checkpointed, exactly-once to files).

    ``cfg`` is a plans.export.ExportConfig; latest-per-key dedup applies
    within each micro-batch (cross-batch versions resolve by downstream
    latest-wins readers, matching the reference's repeated-incremental
    semantics)."""
    from ..plans.export import build_export
    from ..plans import sink as sink_mod
    from ..sources.fixtures import SOURCE_SCHEMA

    stream = spark.readStream.schema(SOURCE_SCHEMA).parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        records, _ = build_export(batch_df, cfg)
        out_dir = os.path.join(cfg.output_dir, f"batch={batch_id}")
        records.select("record").write.mode("overwrite").text(out_dir)
        manifest_dir = os.path.join(
            cfg.manifest_dir or cfg.output_dir + "/_manifest", f"batch={batch_id}"
        )
        records.select(
            sink_mod.manifest_line_col().alias("value")
        ).write.mode("overwrite").text(manifest_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
