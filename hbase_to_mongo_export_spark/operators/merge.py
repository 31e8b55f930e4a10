"""Versioned parquet table with copy-on-write MERGE — the Delta/Iceberg
pattern built from first principles on plain parquet + a JSON manifest.

Why this exists: the reference pipeline is snapshot-only (full rescan →
full rewrite). A 100 TB lake cannot afford that for incremental updates;
the standard answer is a transactional table format whose MERGE rewrites
only the data files that actually contain matched keys. This module
implements that engine behavior with Spark primitives so its mechanics
are visible and testable:

- **manifest commit**: each version is a JSON file listing its data
  files. Readers resolve the latest committed version; writers stage new
  files then commit by writing manifest ``v{N+1}.json`` — readers never
  see a half-written version (the atomicity unit is one manifest write,
  the same contract as Delta's _delta_log).
- **file-pruned copy-on-write**: MERGE first runs a broadcast-friendly
  semi-join of target against source keys with ``input_file_name()`` to
  find TOUCHED files. Untouched files are carried into the new version
  by reference — zero IO. Only touched files are read back, merged
  row-level, and rewritten. At 100 TB with a 0.1% daily delta this is
  the difference between rewriting ~everything (clustered keys: a few
  files) and rewriting the whole table.
- **row-level semantics** (SQL:2003 MERGE / Delta MERGE INTO):
  WHEN MATCHED [AND cond] THEN UPDATE / DELETE,
  WHEN NOT MATCHED THEN INSERT. Duplicate source keys are rejected
  (the same multi-match ambiguity Delta raises as an error).
- **time travel**: ``read(version=N)`` reads any retained version's
  file list; ``history()`` lists commits.

Scale posture: the only shuffles are the key semi-join (source side is
the small delta — broadcast) and the merge join over touched files;
untouched data is never scanned past the pruning pass. The pruning scan
itself reads ONLY the key columns (parquet column pruning).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class MergeError(ValueError):
    pass


def src(name: str) -> Column:
    """Reference a SOURCE column inside a merge clause (update/delete
    expressions), e.g. ``when_matched_update={"o_totalprice": src("price")}``."""
    return F.col(f"_src_{name}")


class ParquetMergeTable:
    """A directory of immutable parquet data files + ``_manifests/vN.json``
    commit logs. Not concurrency-safe across writers (single-writer, like
    a single daily pipeline); readers are isolated by the manifest."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.manifest_dir = os.path.join(path, "_manifests")

    # -- manifest plumbing -------------------------------------------------
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for f in os.listdir(self.manifest_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def current_version(self) -> int:
        vs = self._versions()
        if not vs:
            raise MergeError(f"no committed version in {self.path}")
        return vs[-1]

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.manifest_dir, f"v{version}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[str], operation: str, stats: dict) -> int:
        vs = self._versions()
        next_v = (vs[-1] + 1) if vs else 0
        os.makedirs(self.manifest_dir, exist_ok=True)
        manifest = {
            "version": next_v,
            "files": sorted(files),
            "operation": operation,
            "stats": stats,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self.manifest_dir, f".v{next_v}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # atomic publish: rename is the commit point
        os.rename(tmp, os.path.join(self.manifest_dir, f"v{next_v}.json"))
        return next_v

    def _stage_files(self, df: DataFrame, max_records_per_file: int | None) -> list[str]:
        """Write df's rows as new immutable data files, return their paths."""
        stage = os.path.join(self.path, f"stage-{uuid.uuid4().hex[:12]}")
        w = df.write.mode("overwrite")
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(stage)
        return [
            os.path.join(stage, f)
            for f in os.listdir(stage)
            if f.endswith(".parquet")
        ]

    # -- public API --------------------------------------------------------
    def create(self, df: DataFrame, max_records_per_file: int | None = None) -> int:
        files = self._stage_files(df, max_records_per_file)
        return self._commit(files, "create", {"files_written": len(files)})

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        files = self._manifest(v)["files"]
        if not files:
            raise MergeError(f"version {v} has no files")
        return self.spark.read.parquet(*files)

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        when_matched_update: dict[str, Column] | None = None,
        when_matched_delete: Column | None = None,
        insert_not_matched: bool = True,
        max_records_per_file: int | None = None,
    ) -> dict:
        """MERGE ``source`` into the table on equality of ``on`` keys.

        Order of clauses (Delta semantics): a matched row first checks
        ``when_matched_delete`` (a boolean Column; source columns via the
        module's ``src("name")`` helper); if it doesn't fire,
        ``when_matched_update`` applies (mapping of target column ->
        Column over target cols and ``src("name")`` source refs);
        unmatched source rows insert when ``insert_not_matched``.
        Returns commit stats.
        """
        spark = self.spark
        v = self.current_version()
        all_files = self._manifest(v)["files"]
        key_cols = [F.col(k) for k in on]

        # 1) duplicate-source guard (Delta raises on multi-match):
        dup = (
            source.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise MergeError(
                "source has duplicate merge keys — MERGE would be ambiguous"
            )

        # 2) file pruning: which data files contain matched keys? Reads
        # only the key columns; the source side of the join is the small
        # delta → broadcast.
        target_keys = spark.read.parquet(*all_files).select(
            *on, F.input_file_name().alias("_file")
        )
        touched = sorted(
            r["_file"]
            for r in target_keys.join(
                F.broadcast(source.select(*on).dropDuplicates(on)), on, "semi"
            )
            .select("_file")
            .distinct()
            .collect()
        )
        # input_file_name returns URIs (file://...); map back to our paths
        def _localize(uri: str) -> str:
            return uri[7:] if uri.startswith("file://") else uri

        touched = [_localize(t) for t in touched]
        untouched = [f for f in all_files if f not in set(touched)]

        # 3) row-level merge over ONLY the touched files
        stats = {
            "files_total": len(all_files),
            "files_touched": len(touched),
            "files_carried": len(untouched),
        }
        new_files: list[str] = list(untouched)
        target_cols = spark.read.parquet(*all_files).columns
        src_aliased = source.select(
            *[F.col(c).alias(f"_src_{c}") for c in source.columns]
        )
        join_cond = [
            F.col(k).eqNullSafe(F.col(f"_src_{k}")) for k in on
        ]

        if touched:
            tgt = spark.read.parquet(*touched)
            joined = tgt.join(F.broadcast(src_aliased), join_cond, "left")
            matched = F.col(f"_src_{on[0]}").isNotNull()
            # delete clause
            keep = (
                ~(matched & when_matched_delete)
                if when_matched_delete is not None
                else F.lit(True)
            )
            out_cols = []
            for c in target_cols:
                upd = (when_matched_update or {}).get(c)
                if upd is not None:
                    out_cols.append(
                        F.when(matched, upd).otherwise(F.col(c)).alias(c)
                    )
                else:
                    out_cols.append(F.col(c))
            rewritten = joined.filter(keep).select(*out_cols)
            new_files += self._stage_files(rewritten, max_records_per_file)

        # 4) inserts: source rows matching NO target key anywhere
        if insert_not_matched:
            inserts = source.join(
                spark.read.parquet(*all_files).select(*on).dropDuplicates(on),
                on,
                "anti",
            ).select(
                *[
                    F.col(c) if c in source.columns else F.lit(None).alias(c)
                    for c in target_cols
                ]
            )
            n_ins = inserts.count()
            stats["rows_inserted"] = n_ins
            if n_ins:
                new_files += self._stage_files(inserts, max_records_per_file)

        new_v = self._commit(new_files, "merge", stats)
        stats["version"] = new_v
        return stats

    def compact(
        self,
        sort_col: str | None = None,
        target_files: int | None = None,
        max_records_per_file: int | None = None,
    ) -> dict:
        """OPTIMIZE: rewrite the current version into ``target_files``
        right-sized files (range-clustered on ``sort_col`` so parquet
        min/max stats prune key ranges afterwards). Old versions keep
        their file lists — time travel still works until ``vacuum``."""
        df = self.read()
        if target_files is None:
            target_files = int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        out = (
            df.repartitionByRange(target_files, F.col(sort_col))
            if sort_col
            else df.repartition(target_files)
        )
        files = self._stage_files(out, max_records_per_file)
        v = self._commit(files, "compact", {"files_written": len(files)})
        return {"version": v, "files_written": len(files)}

    def vacuum(self, retain_last: int = 1) -> dict:
        """Delete data files referenced ONLY by versions older than the
        last ``retain_last`` commits, then drop those manifests. Mirrors
        Delta VACUUM: shared (carried-by-reference) files survive as long
        as any retained version lists them."""
        if retain_last < 1:
            raise MergeError("retain_last must be >= 1")
        vs = self._versions()
        keep_vs = vs[-retain_last:]
        drop_vs = vs[: -retain_last]
        live = set()
        for v in keep_vs:
            live.update(self._manifest(v)["files"])
        removed = 0
        for v in drop_vs:
            for f in self._manifest(v)["files"]:
                if f not in live and os.path.exists(f):
                    os.remove(f)
                    removed += 1
            os.remove(os.path.join(self.manifest_dir, f"v{v}.json"))
        return {
            "files_removed": removed,
            "versions_dropped": len(drop_vs),
            "versions_retained": keep_vs,
        }


def stream_merge_upsert(
    table: ParquetMergeTable,
    stream_df: DataFrame,
    on: list[str],
    update_cols: list[str],
    checkpoint_dir: str,
):
    """Continuous upsert: a Structured Streaming ``foreachBatch`` sink
    that MERGEs each micro-batch into the versioned table (matched →
    update ``update_cols`` from source, not-matched → insert). Batches
    may redeliver after restart — MERGE is idempotent for upserts, which
    is exactly why lakehouse streaming ingestion standardizes on it.
    Micro-batches can carry several rows per key (rapid updates); MERGE
    requires unique source keys, so each batch is first reduced to one
    row per key via a max-struct aggregate over the non-key columns
    (deterministic; order an event-time column first to get
    latest-wins)."""

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.columns:
            return
        others = [c for c in batch_df.columns if c not in on]
        latest = (
            batch_df.groupBy(*on)
            .agg(F.max(F.struct(*others)).alias("_s"))
            .select(*on, *[F.col(f"_s.{c}").alias(c) for c in others])
        )
        table.merge(
            latest,
            on=on,
            when_matched_update={c: src(c) for c in update_cols},
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
