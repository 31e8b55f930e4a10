"""Manifest-protocol evidence run: commit-log and resolution costs over
a long commit history.

The round-6 manifest redesign (operators/merge.py) claims Delta's
economics: a commit writes a log entry proportional to its DELTA (not
the table's file count), and resolving the latest version loads one
checkpoint plus at most CHECKPOINT_INTERVAL entries (not the whole
history). This script drives N real insert-MERGEs through the public
API — the table's file count grows by one per commit, the worst case
for any full-file-list manifest — then measures, for a FRESH reader:

- bytes of the last log entry vs the last checkpoint (entry must stay
  ~flat while the checkpoint grows with the table),
- how many manifest JSON files resolution actually reads, with the
  checkpoints present vs deleted (the contrast is the point: bounded
  replay vs O(N) replay),
- wall time of both resolutions.

Run:  python tools/manifest_stress.py [--commits 120]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=120)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("manifest-stress")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hbase_to_mongo_export_spark.operators import merge as M

    root = tempfile.mkdtemp(prefix="manifest_stress_")
    out: dict = {"commits": args.commits, "interval": M.CHECKPOINT_INTERVAL}
    try:
        t = M.ParquetMergeTable(spark, os.path.join(root, "tbl"))
        t.create(spark.createDataFrame([(0, 0.0)], "id bigint, val double"))
        t0 = time.perf_counter()
        for i in range(1, args.commits + 1):
            t.merge(
                spark.createDataFrame([(i, float(i))], "id bigint, val double"),
                on=["id"],
            )
        wall = time.perf_counter() - t0
        v = t.current_version()
        m = t._manifest(v)
        out["versions"] = v
        out["files_in_table"] = len(m["files"])
        out["rows_total"] = m["rows_total"]
        out["commit_sec_avg"] = round(wall / args.commits, 3)
        out["log_entry_bytes_last"] = os.path.getsize(t._log_path(v))
        ckpts = t._checkpoints()
        out["checkpoint_bytes_last"] = os.path.getsize(t._ckpt_path(ckpts[-1]))

        def fresh_resolution() -> tuple[int, float, int]:
            r = M.ParquetMergeTable(spark, t.path)
            reads = []
            orig = M.ParquetMergeTable._read_json
            r._read_json = lambda p: (reads.append(p), orig(r, p))[1]
            s = time.perf_counter()
            got = r._manifest(v)
            return got["rows_total"], round(time.perf_counter() - s, 4), len(reads)

        rows_a, sec_a, reads_a = fresh_resolution()
        out["resolve_with_checkpoints"] = {"reads": reads_a, "sec": sec_a}
        # contrast: strip the checkpoints → full O(N) log replay
        for c in ckpts:
            os.remove(t._ckpt_path(c))
        rows_b, sec_b, reads_b = fresh_resolution()
        out["resolve_full_replay"] = {"reads": reads_b, "sec": sec_b}
        assert rows_a == rows_b == args.commits + 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
