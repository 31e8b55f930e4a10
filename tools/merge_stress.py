"""MERGE-pruning evidence run: copy-on-write upsert economics at scale.

The 100 TB claim in operators/merge.py is that a small delta rewrites
only the data files that contain matched keys. This script measures that
directly: it builds a versioned table from the sf0.1 lineitem table
(~600k rows, key-clustered into --files data files), merges a --delta-pct
delta (re-priced rows spanning a narrow key range, the clustered-update
shape of a daily feed), and reports how many files were rewritten, how
many bytes the new version wrote vs the table size, and wall time —
then repeats with a SCATTERED delta (same row count, keys spread
uniformly) to show the worst case where clustering doesn't help.

The ``full`` shape is the broadcast-guard stress: a TABLE-SIZED delta
(every row re-priced) that, before round 6, was force-broadcast into
every MERGE join — the same driver-OOM class SCALE_EVIDENCE.md §1
measured for LSH. With --broadcast-max-rows below the delta size the
source side sort-merges instead; run with --driver-memory 2g to prove a
full-table backfill completes under a heap the broadcast would kill:

    python tools/merge_stress.py --shapes full \
        --broadcast-max-rows 100000 --driver-memory 2g

Run:  python tools/merge_stress.py [--files 64] [--delta-pct 0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(files: list[str]) -> int:
    return sum(os.path.getsize(f) for f in files if os.path.exists(f))


def _make_store(kind: str, latency_s: float):
    """None → the table's default LocalLogStore; 'cput' → the emulated
    conditional-PUT backend with injected per-call latency."""
    if kind == "cput":
        from hbase_to_mongo_export_spark.operators.merge import (
            ConditionalPutLogStore,
        )

        return ConditionalPutLogStore(latency_s=latency_s)
    return None


def _proc_writer(
    table_path: str,
    w: int,
    n_batches: int,
    batch_rows: int,
    top: int,
    store_kind: str,
    latency_s: float,
) -> None:
    """One CROSS-PROCESS contention writer: its own interpreter, its own
    JVM/SparkSession, its own LogStore handle — nothing shared with the
    parent or its siblings except the table directory. If the commit
    mutex were the GIL, thread scheduling, or in-process memoization,
    THIS harness would lose updates; only the filesystem create-if-absent
    primitive serializes these writers."""
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName(f"merge-stress-proc-w{w}")
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hbase_to_mongo_export_spark.operators.merge import ParquetMergeTable

    store = _make_store(store_kind, latency_s)
    h = ParquetMergeTable(spark, table_path, log_store=store)
    try:
        for b in range(n_batches):
            lo = top + 1 + (w * n_batches + b) * batch_rows
            df = spark.range(lo, lo + batch_rows).select(
                F.col("id").alias("l_orderkey"),
                F.col("id").alias("l_partkey"),
                F.lit(1.0).alias("l_quantity"),
                F.lit(1.0).alias("l_extendedprice"),
                F.col("id").cast("int").alias("key"),
            )
            h.append(df, txn_app_id=f"w{w}", txn_version=b)
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--delta-pct", type=float, default=0.1)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument(
        "--shapes", default="clustered,scattered",
        help="comma list of clustered|scattered|full|bigdelete|cdfspool|"
             "vectorpurge|contended|contended-proc|ckptcrash|nestedevo|"
             "colmap|clone",
    )
    ap.add_argument(
        "--log-store", default="local", choices=["local", "cput"],
        help="commit backend for the contended shapes: local (os.link) "
             "or cput (emulated conditional-PUT with --latency-ms RTT)",
    )
    ap.add_argument(
        "--writers", type=int, default=4,
        help="contended/contended-proc: number of racing writers",
    )
    ap.add_argument(
        "--batches", type=int, default=5,
        help="contended/contended-proc: blind-append batches per writer",
    )
    ap.add_argument(
        "--latency-ms", type=float, default=0.0,
        help="injected per-call log-store latency for --log-store cput — "
             "widens the stage→commit race window to object-store RTTs",
    )
    ap.add_argument(
        "--broadcast-max-rows", type=int, default=None,
        help="override ParquetMergeTable.BROADCAST_MAX_SOURCE_ROWS",
    )
    ap.add_argument(
        "--delete-rows-per-file", type=int, default=None,
        help="override ParquetMergeTable.DELETE_ROWS_PER_FILE (bigdelete: "
             "prove the vector write fans out past one task)",
    )
    ap.add_argument(
        "--spool-rows-per-file", type=int, default=100_000,
        help="cdfspool: rows per spooled CDF part before a commit splits "
             "into a multi-task directory unit",
    )
    ap.add_argument(
        "--driver-memory", default=None,
        help="JVM heap for the local driver+executors (e.g. 2g) — use with "
             "--shapes full to prove the guarded path survives small heaps",
    )
    args = ap.parse_args()

    import shutil
    import tempfile

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("merge-stress")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if args.driver_memory:
        builder = builder.config("spark.driver.memory", args.driver_memory)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from hbase_to_mongo_export_spark.operators.merge import (
        ParquetMergeTable,
        src,
    )

    if args.broadcast_max_rows is not None:
        ParquetMergeTable.BROADCAST_MAX_SOURCE_ROWS = args.broadcast_max_rows
    if args.delete_rows_per_file is not None:
        ParquetMergeTable.DELETE_ROWS_PER_FILE = args.delete_rows_per_file
        ParquetMergeTable.CHANGE_ROWS_PER_FILE = args.delete_rows_per_file

    li = (
        spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
        .select(
            F.monotonically_increasing_id().alias("row_id"),
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
        )
        # stable synthetic unique key clustered like the order key
        .withColumn(
            "key",
            F.row_number().over(
                Window.orderBy("l_orderkey", "l_partkey", "row_id")
            ),
        )
        .drop("row_id")
    )

    out: dict = {
        "delta_pct": args.delta_pct,
        "files": args.files,
        "broadcast_max_rows": ParquetMergeTable.BROADCAST_MAX_SOURCE_ROWS,
        "driver_memory": args.driver_memory,
    }
    root = tempfile.mkdtemp(prefix="merge_stress_")
    try:
        for shape in [s.strip() for s in args.shapes.split(",") if s.strip()]:
            t = ParquetMergeTable(spark, os.path.join(root, shape))
            t.create(
                li.repartitionByRange(args.files, F.col("key")).sortWithinPartitions(
                    "key"
                )
            )
            n = t.read().count()
            if shape == "bigdelete":
                # ~30%-of-table MoR delete: before round 7 the position-
                # delete vector and the CDF change file each funneled
                # through coalesce(1); now the writer task count is
                # proportional to the exact victim count
                t0 = time.perf_counter()
                stats = t.delete_where(F.col("key") % 10 < 3)
                sec = round(time.perf_counter() - t0, 2)
                m1 = t._manifest(stats["version"])
                out[shape] = {
                    "rows": n,
                    "rows_deleted": stats["rows_deleted"],
                    "delete_files": len(m1["delete_files"]),
                    "delete_rows_per_file":
                        ParquetMergeTable.DELETE_ROWS_PER_FILE,
                    "rows_after_read": t.read().count(),
                    "sec": sec,
                }
                continue
            if shape == "vectorpurge":
                # the read-amplification failure mode targeted purge
                # cures: repeated SMALL deletes against RIGHT-sized files
                # (retention jobs, GDPR erasure) accumulate deletion
                # vectors that incremental bin-packing never clears —
                # the files aren't undersized — so every read pays a
                # growing anti-join. compact(purge_vectors_over) rewrites
                # only the heavily-deleted files; untouched files and
                # their (light) vectors carry.
                def timed_read() -> float:
                    t0 = time.perf_counter()
                    t.read().agg(
                        F.sum("l_extendedprice"), F.count(F.lit(1))
                    ).collect()
                    return round(time.perf_counter() - t0, 3)

                base_read = timed_read()
                # 12 retention-style deletes, all landing in the LOWER
                # half of the key range → ~half the files accumulate
                # ~48% dead rows, the upper half stays clean
                slice_w = n // 25
                for k in range(12):
                    lo = k * slice_w
                    t.delete_where(
                        [("key", ">", lo), ("key", "<=", lo + slice_w // 2)]
                    )
                m_dirty = t._manifest(t.current_version())
                dirty_read = timed_read()
                table_bytes = _dir_bytes(m_dirty["files"])
                t0 = time.perf_counter()
                stats = t.compact(purge_vectors_over=0.3)
                purge_sec = round(time.perf_counter() - t0, 2)
                m_clean = t._manifest(t.current_version())
                rewritten = [
                    f for f in m_clean["files"]
                    if f not in set(m_dirty["files"])
                ]
                clean_read = timed_read()
                out[shape] = {
                    "rows": n,
                    "deletes_applied": 12,
                    "vector_rows_before": m_dirty["delete_rows_total"],
                    "vector_files_before": len(m_dirty["delete_files"]),
                    "files_purged": stats.get("files_purged", 0),
                    "files_carried": stats.get("files_carried", 0),
                    "vector_rows_after": m_clean["delete_rows_total"],
                    "vector_files_after": len(m_clean["delete_files"]),
                    "table_mb": round(table_bytes / 1e6, 1),
                    "rewritten_mb": round(_dir_bytes(rewritten) / 1e6, 1),
                    "purge_sec": purge_sec,
                    "read_sec_clean_table": base_read,
                    "read_sec_with_vectors": dirty_read,
                    "read_sec_after_purge": clean_read,
                    "rows_visible_unchanged":
                        t.read().count() == n - m_dirty["delete_rows_total"],
                }
                continue
            if shape == "cdfspool":
                # full-table update, then spool its CDF: the spooled unit
                # must be a multi-part directory written by >1 task (the
                # old spool pushed every commit through coalesce(1))
                from hbase_to_mongo_export_spark.operators.merge import (
                    spool_changes,
                )

                delta = t.read().select(
                    "key",
                    (F.col("l_extendedprice") + F.lit(1.0)).alias(
                        "l_extendedprice"
                    ),
                )
                t.merge(
                    delta,
                    on=["key"],
                    when_matched_update={
                        "l_extendedprice": src("l_extendedprice")
                    },
                    insert_not_matched=False,
                )
                spool = os.path.join(root, "spool")
                t0 = time.perf_counter()
                spool_changes(
                    t, spool, from_version=1, key_cols=["key"],
                    rows_per_file=args.spool_rows_per_file,
                )
                sec = round(time.perf_counter() - t0, 2)
                unit = os.path.join(spool, "cdf-v0000000001")
                parts = (
                    [f for f in os.listdir(unit) if f.endswith(".parquet")]
                    if os.path.isdir(unit)
                    else []
                )
                out[shape] = {
                    "rows": n,
                    "change_rows": 2 * n,  # pre+post images
                    "spool_unit_is_dir": os.path.isdir(unit),
                    "spool_parts": len(parts),
                    "spool_rows_per_file": args.spool_rows_per_file,
                    "sec": sec,
                }
                continue
            if shape == "contended":
                # REAL concurrent writers (not the pytest single-
                # interleave): N threads blind-append M batches each
                # through their own table handles. Every lost commit race
                # must REBASE (same staged files re-committed on the new
                # head), so the protocol proof is exact: N*M commits on
                # top of v0, zero lost updates, zero duplicated rows.
                import threading

                n_writers, n_batches, batch_rows = args.writers, args.batches, 1000
                base_rows = n
                errors: list = []
                top = t.read().agg(F.max("key")).first()[0]

                def writer(w: int) -> None:
                    try:
                        # each writer gets its OWN LogStore handle (the
                        # cput backend adds per-call RTT latency so the
                        # race window is object-store-wide, not µs)
                        h = ParquetMergeTable(
                            spark, t.path,
                            log_store=_make_store(
                                args.log_store, args.latency_ms / 1000.0
                            ),
                        )
                        for b in range(n_batches):
                            lo = top + 1 + (w * n_batches + b) * batch_rows
                            df = spark.range(lo, lo + batch_rows).select(
                                F.col("id").alias("l_orderkey"),
                                F.col("id").alias("l_partkey"),
                                F.lit(1.0).alias("l_quantity"),
                                F.lit(1.0).alias("l_extendedprice"),
                                F.col("id").cast("int").alias("key"),
                            )
                            h.append(df, txn_app_id=f"w{w}", txn_version=b)
                    except Exception as e:  # pragma: no cover
                        errors.append(repr(e))

                t0 = time.perf_counter()
                threads = [
                    threading.Thread(target=writer, args=(w,))
                    for w in range(n_writers)
                ]
                for th in threads:
                    th.start()
                for th in threads:
                    th.join()
                sec = round(time.perf_counter() - t0, 2)
                final = ParquetMergeTable(spark, t.path)
                got = final.read().count()
                expect = base_rows + n_writers * n_batches * batch_rows
                out[shape] = {
                    "writers": n_writers,
                    "batches_per_writer": n_batches,
                    "log_store": args.log_store,
                    "latency_ms": args.latency_ms,
                    "errors": errors,
                    "versions": final.current_version(),
                    "expected_versions": n_writers * n_batches,
                    "rows": got,
                    "expected_rows": expect,
                    "lost_updates": expect - got,
                    "txn_heads": {
                        f"w{w}": final.last_txn_version(f"w{w}")
                        for w in range(n_writers)
                    },
                    "sec": sec,
                }
                continue
            if shape == "contended-proc":
                # CROSS-PROCESS contention: the same 4-writer × 5-batch
                # shape, but every writer is a separate OS process with
                # its own interpreter + JVM + SparkSession — proving the
                # commit mutex is the filesystem create-if-absent
                # primitive (or the cput backend's exclusive create),
                # not the GIL, thread scheduling, or any in-process
                # shared state the threaded shape can't rule out.
                import multiprocessing as mp

                n_writers, n_batches, batch_rows = args.writers, args.batches, 1000
                base_rows = n
                top = t.read().agg(F.max("key")).first()[0]
                ctx = mp.get_context("spawn")
                procs = [
                    ctx.Process(
                        target=_proc_writer,
                        args=(
                            t.path, w, n_batches, batch_rows, top,
                            args.log_store, args.latency_ms / 1000.0,
                        ),
                    )
                    for w in range(n_writers)
                ]
                t0 = time.perf_counter()
                for p in procs:
                    p.start()
                for p in procs:
                    p.join()
                sec = round(time.perf_counter() - t0, 2)
                final = ParquetMergeTable(spark, t.path)
                got = final.read().count()
                expect = base_rows + n_writers * n_batches * batch_rows
                out[shape] = {
                    "writers": n_writers,
                    "batches_per_writer": n_batches,
                    "log_store": args.log_store,
                    "latency_ms": args.latency_ms,
                    "exitcodes": [p.exitcode for p in procs],
                    "versions": final.current_version(),
                    "expected_versions": n_writers * n_batches,
                    "rows": got,
                    "expected_rows": expect,
                    "lost_updates": expect - got,
                    "txn_heads": {
                        f"w{w}": final.last_txn_version(f"w{w}")
                        for w in range(n_writers)
                    },
                    "sec": sec,
                }
                continue
            if shape == "nestedevo":
                # CONTENDED DIVERGENT NESTED EVOLUTION (round-10 ask):
                # N writers race appends that each evolve the SAME
                # struct column differently — add s.a / add s.b / widen
                # s.x int→bigint / add s.c — through per-writer LogStore
                # handles. The append-rebase reconciliation (unit-tested
                # in r9) must produce the UNION struct schema with zero
                # lost updates; the model check recomputes every
                # writer's field aggregates from its deterministic key
                # ranges, plus the base rows' preserved s.x sum.
                import threading

                n_writers, n_batches, batch_rows = (
                    args.writers, args.batches, 1000
                )
                nt = ParquetMergeTable(spark, os.path.join(root, shape + "_t"))
                base_df = li.withColumn(
                    "s",
                    F.struct((F.col("key") % 1000).cast("int").alias("x")),
                )
                nt.create(
                    base_df.repartitionByRange(
                        args.files, F.col("key")
                    ).sortWithinPartitions("key")
                )
                base_rows = nt.read().count()
                base_x_sum = (
                    nt.read().agg(F.sum("s.x")).first()[0]
                )
                top = nt.read().agg(F.max("key")).first()[0]
                errors: list = []

                def evo_writer(w: int) -> None:
                    try:
                        h = ParquetMergeTable(
                            spark, nt.path,
                            log_store=_make_store(
                                args.log_store, args.latency_ms / 1000.0
                            ),
                        )
                        variant = w % 4
                        for b in range(n_batches):
                            lo = top + 1 + (w * n_batches + b) * batch_rows
                            ids = spark.range(lo, lo + batch_rows)
                            x = (F.col("id") % 1000).cast("int")
                            if variant == 0:
                                s = F.struct(
                                    x.alias("x"),
                                    (F.col("id") % 7).cast("int").alias("a"),
                                )
                            elif variant == 1:
                                s = F.struct(
                                    x.alias("x"),
                                    F.concat(
                                        F.lit("w"), (F.col("id") % 5)
                                    ).alias("b"),
                                )
                            elif variant == 2:
                                # widen-only: s.x arrives as bigint
                                s = F.struct(
                                    (F.col("id") % 1000).alias("x")
                                )
                            else:
                                s = F.struct(
                                    x.alias("x"),
                                    (F.col("id") * 0.5).alias("c"),
                                )
                            df = ids.select(
                                F.col("id").alias("l_orderkey"),
                                F.col("id").alias("l_partkey"),
                                F.lit(1.0).alias("l_quantity"),
                                F.lit(1.0).alias("l_extendedprice"),
                                F.col("id").cast("int").alias("key"),
                                s.alias("s"),
                            )
                            h.append(
                                df, txn_app_id=f"w{w}", txn_version=b,
                                schema_evolution=True,
                            )
                    except Exception as e:  # pragma: no cover
                        errors.append(repr(e))

                t0 = time.perf_counter()
                threads = [
                    threading.Thread(target=evo_writer, args=(w,))
                    for w in range(n_writers)
                ]
                for th in threads:
                    th.start()
                for th in threads:
                    th.join()
                sec = round(time.perf_counter() - t0, 2)
                final = ParquetMergeTable(spark, nt.path)
                fdf = final.read()
                s_fields = {
                    f.name: f.dataType.simpleString()
                    for f in fdf.schema["s"].dataType.fields
                }
                # model: every (w, b) batch is the deterministic range
                # [lo, lo+batch_rows) — recompute field aggregates in
                # exact Python integer arithmetic
                exp_a = exp_c2 = exp_b_rows = 0
                for w in range(n_writers):
                    for b in range(n_batches):
                        lo = top + 1 + (w * n_batches + b) * batch_rows
                        rng_ = range(lo, lo + batch_rows)
                        if w % 4 == 0:
                            exp_a += sum(i % 7 for i in rng_)
                        elif w % 4 == 1:
                            exp_b_rows += batch_rows
                        elif w % 4 == 3:
                            exp_c2 += sum(i for i in rng_)  # c = i * 0.5
                # aggregate only over fields the raced writer set
                # actually created (--writers < 4 runs fewer variants)
                agg_cols = [
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(
                        F.when(F.col("key") <= top, F.col("s.x"))
                    ).alias("base_x"),
                ]
                if "a" in s_fields:
                    agg_cols.append(F.sum("s.a").alias("a_sum"))
                if "b" in s_fields:
                    agg_cols.append(F.count("s.b").alias("b_rows"))
                if "c" in s_fields:
                    agg_cols.append(F.sum(F.col("s.c") * 2).alias("c2_sum"))
                agg_row = fdf.agg(*agg_cols).first().asDict()
                agg = {
                    "rows": agg_row["rows"],
                    "base_x": agg_row["base_x"],
                    "a_sum": agg_row.get("a_sum", 0) or 0,
                    "b_rows": agg_row.get("b_rows", 0) or 0,
                    "c2_sum": agg_row.get("c2_sum", 0) or 0,
                }
                expect = base_rows + n_writers * n_batches * batch_rows
                out[shape] = {
                    "writers": n_writers,
                    "batches_per_writer": n_batches,
                    "log_store": args.log_store,
                    "latency_ms": args.latency_ms,
                    "errors": errors,
                    "versions": final.current_version(),
                    "expected_versions": n_writers * n_batches,
                    "rows": agg["rows"],
                    "expected_rows": expect,
                    "lost_updates": expect - agg["rows"],
                    "s_fields": s_fields,
                    "s_fields_ok": (
                        s_fields.get("x")
                        == (
                            "bigint"
                            if any(w % 4 == 2 for w in range(n_writers))
                            else "int"
                        )
                        and ("a" in s_fields) == any(
                            w % 4 == 0 for w in range(n_writers)
                        )
                        and ("b" in s_fields) == any(
                            w % 4 == 1 for w in range(n_writers)
                        )
                        and ("c" in s_fields) == any(
                            w % 4 == 3 for w in range(n_writers)
                        )
                    ),
                    "model_ok": (
                        agg["a_sum"] == exp_a
                        and agg["b_rows"] == exp_b_rows
                        and int(agg["c2_sum"]) == exp_c2
                        and agg["base_x"] == base_x_sum
                    ),
                    "sec": sec,
                }
                continue
            if shape == "ckptcrash":
                # CRASH-DURING-CHECKPOINT under contention (round-8 ask):
                # every writer commits through the conditional-PUT
                # backend with crash_mid_checkpoint=1 — the FIRST time a
                # writer lands a CHECKPOINT_INTERVAL-boundary commit, it
                # dies with the checkpoint body staged but never
                # materialized. The harness then resumes each dead
                # writer as a healthy successor retrying the SAME batch
                # with the SAME txn stamp: the commit landed before the
                # checkpoint attempt, so the retry must be skipped by
                # the txn map (a double-append would show in the count).
                # Proof: zero lost updates, every version resolvable by
                # a fresh reader, un-checkpointed intervals replay from
                # the delta-log prefix.
                import threading

                from hbase_to_mongo_export_spark.operators.merge import (
                    CHECKPOINT_INTERVAL,
                    ConditionalPutLogStore,
                    CrashPoint,
                )

                n_writers, n_batches, batch_rows = args.writers, args.batches, 1000
                base_rows = n
                errors: list = []
                crashes: list = []
                skipped: list = []
                top = t.read().agg(F.max("key")).first()[0]

                def writer(w: int) -> None:
                    try:
                        h = ParquetMergeTable(
                            spark, t.path,
                            log_store=ConditionalPutLogStore(
                                latency_s=args.latency_ms / 1000.0,
                                crash_mid_checkpoint=1,
                            ),
                        )
                        for b in range(n_batches):
                            lo = top + 1 + (w * n_batches + b) * batch_rows
                            df = spark.range(lo, lo + batch_rows).select(
                                F.col("id").alias("l_orderkey"),
                                F.col("id").alias("l_partkey"),
                                F.lit(1.0).alias("l_quantity"),
                                F.lit(1.0).alias("l_extendedprice"),
                                F.col("id").cast("int").alias("key"),
                            )
                            try:
                                h.append(df, txn_app_id=f"w{w}", txn_version=b)
                            except CrashPoint:
                                crashes.append((w, b))
                                # successor: fresh healthy handle, SAME
                                # txn stamp — must skip (commit landed)
                                h = ParquetMergeTable(spark, t.path)
                                r = h.append(
                                    df, txn_app_id=f"w{w}", txn_version=b
                                )
                                if r.get("txn_skipped"):
                                    skipped.append((w, b))
                    except Exception as e:  # pragma: no cover
                        errors.append(repr(e))

                t0 = time.perf_counter()
                threads = [
                    threading.Thread(target=writer, args=(w,))
                    for w in range(n_writers)
                ]
                for th in threads:
                    th.start()
                for th in threads:
                    th.join()
                sec = round(time.perf_counter() - t0, 2)
                final = ParquetMergeTable(spark, t.path)
                got = final.read().count()
                expect = base_rows + n_writers * n_batches * batch_rows
                boundaries = [
                    v
                    for v in range(1, final.current_version() + 1)
                    if v % CHECKPOINT_INTERVAL == 0
                ]
                # every version must resolve from whatever checkpoint
                # prefix survived the crashes
                resolvable = all(
                    final._manifest(v)["version"] == v
                    for v in range(final.current_version() + 1)
                )
                out[shape] = {
                    "writers": n_writers,
                    "batches_per_writer": n_batches,
                    "latency_ms": args.latency_ms,
                    "errors": errors,
                    "crashes_injected": len(crashes),
                    "txn_skipped_retries": len(skipped),
                    "checkpoint_boundaries": boundaries,
                    "checkpoints_present": final._checkpoints(),
                    "all_versions_resolvable": resolvable,
                    "versions": final.current_version(),
                    "expected_versions": n_writers * n_batches,
                    "rows": got,
                    "expected_rows": expect,
                    "lost_updates": expect - got,
                    "sec": sec,
                }
                continue
            if shape == "colmap":
                # metadata-only schema surgery: RENAME + DROP on the full
                # table must write zero data bytes and commit in ~ms
                # regardless of table size, and data skipping must keep
                # pruning on the renamed column without a stats rebuild
                data_bytes0 = _dir_bytes(t._manifest(0)["files"])
                t0 = time.perf_counter()
                t.rename_column("l_extendedprice", "price")
                rename_sec = round(time.perf_counter() - t0, 4)
                t0 = time.perf_counter()
                t.drop_column("l_partkey")
                drop_sec = round(time.perf_counter() - t0, 4)
                m1 = t._manifest(t.current_version())
                pruned = t.read(where=[("key", "<=", 1000)])
                out[shape] = {
                    "rows": n,
                    "rename_sec": rename_sec,
                    "drop_sec": drop_sec,
                    "data_bytes_written": _dir_bytes(m1["files"]) - data_bytes0,
                    "files_unchanged": m1["files"] == t._manifest(0)["files"],
                    "skipping_rows_after_rename": pruned.count(),
                    "columns": t.read().columns,
                }
                continue
            if shape == "clone":
                # shallow clone: zero bytes copied at any size — the
                # clone commit is one manifest write carrying the
                # source's per-file stats (no footer re-reads)
                import glob as _glob

                dest = os.path.join(root, "clone_dest")
                t0 = time.perf_counter()
                c = t.clone(dest)
                sec = round(time.perf_counter() - t0, 4)
                out[shape] = {
                    "rows": n,
                    "clone_sec": sec,
                    "clone_local_parquet": len(
                        _glob.glob(os.path.join(dest, "**", "*.parquet"),
                                   recursive=True)
                    ),
                    "clone_rows": c.read().count(),
                    "skipping_through_copied_stats":
                        c.read(where=[("key", "<=", 1000)]).count(),
                }
                continue
            if shape == "full":
                # table-sized backfill: every row is a matched key — the
                # worst case for both pruning AND the broadcast decision
                k = n
                delta_filter = F.lit(True)
            elif shape == "clustered":
                k = max(1, int(n * args.delta_pct / 100.0))
                delta_filter = F.col("key") <= k  # one contiguous key range
            else:
                k = max(1, int(n * args.delta_pct / 100.0))
                stride = max(1, n // k)
                delta_filter = F.col("key") % stride == 0  # uniform spread
            delta = (
                t.read()
                .filter(delta_filter)
                .select(
                    "key",
                    (F.col("l_extendedprice") + F.lit(1.0)).alias(
                        "l_extendedprice"
                    ),
                )
            )
            table_bytes = _dir_bytes(t._manifest(0)["files"])
            t0 = time.perf_counter()
            stats = t.merge(
                delta,
                on=["key"],
                when_matched_update={"l_extendedprice": src("l_extendedprice")},
                insert_not_matched=False,
            )
            sec = round(time.perf_counter() - t0, 2)
            m1 = t._manifest(stats["version"])
            rewritten = [f for f in m1["files"] if f not in set(t._manifest(0)["files"])]
            out[shape] = {
                "rows": n,
                "delta_rows": k,
                "source_broadcast": k <= ParquetMergeTable.BROADCAST_MAX_SOURCE_ROWS,
                "files_total": stats["files_total"],
                "files_touched": stats["files_touched"],
                "table_mb": round(table_bytes / 1e6, 1),
                "rewritten_mb": round(_dir_bytes(rewritten) / 1e6, 1),
                "sec": sec,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
