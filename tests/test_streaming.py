"""Structured Streaming tests: windowed aggregation equals its batch
answer; incremental export drains the source exactly once and resumes
from its checkpoint."""

import glob
import json
import os

from hbase_to_mongo_export_spark.plans.export import ExportConfig
from hbase_to_mongo_export_spark.sources import fixtures
from hbase_to_mongo_export_spark.streaming import (
    incremental_export,
    windowed_event_counts,
)


def test_windowed_counts_equal_batch(spark, sf_dir, tables):
    from pyspark.sql import functions as F

    out = windowed_event_counts(
        spark, os.path.join(sf_dir, "events.parquet"), window_duration="1 hour"
    )
    batch = (
        tables["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    got = sorted(map(str, out.collect()))
    expect = sorted(map(str, batch.collect()))
    assert got == expect


def test_incremental_export_with_checkpoint_resume(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # batch 1: 20 records
    fixtures.source_records(spark, n=20).write.mode("append").parquet(src_dir)
    cfg = ExportConfig(
        topic="db.database.collection",
        output_dir=out_dir,
        manifest_dir=str(tmp_path / "manifest"),
    )
    incremental_export(spark, src_dir, cfg, ckpt)
    lines1 = []
    for f in glob.glob(os.path.join(out_dir, "batch=*", "part-*")):
        with open(f, encoding="utf-8") as fh:
            lines1 += fh.read().splitlines()
    assert len(lines1) == 20
    for ln in lines1:
        json.loads(ln)

    # batch 2: 10 more records appended; checkpoint must skip the first 20
    fixtures.source_records(spark, n=10, database="database2").write.mode(
        "append"
    ).parquet(src_dir)
    incremental_export(spark, src_dir, cfg, ckpt)
    lines2 = []
    for f in glob.glob(os.path.join(out_dir, "batch=*", "part-*")):
        with open(f, encoding="utf-8") as fh:
            lines2 += fh.read().splitlines()
    assert len(lines2) == 30  # 20 from batch 0 + 10 new, no reprocessing dupes


def test_stateful_running_user_stats_equals_batch(spark, sf_dir, tables):
    from pyspark.sql import functions as F

    from hbase_to_mongo_export_spark.streaming.stateful import running_user_stats

    out = running_user_stats(spark, os.path.join(sf_dir, "events.parquet"))
    batch = (
        tables["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    got = sorted(map(str, out.collect()))
    expect = sorted(map(str, batch.collect()))
    assert got == expect
