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
- **merge-on-read deletion vectors** (Iceberg v2 position deletes /
  Delta deletion vectors): ``delete_where(cond)`` writes a tiny
  position-delete file — ``(file_path, row_index)`` pairs from the
  parquet ``_metadata`` hidden columns — instead of rewriting data
  files. Readers apply the vector as a broadcast anti-join. At 100 TB,
  deleting 0.001% of rows costs KBs of IO instead of rewriting every
  file that contains a victim row; ``compact()`` later materializes
  (purges) the deletes.
- **change data feed** (Delta CDF): every commit records its row-level
  changes — inserts by *reference* to the freshly-added data files
  (zero extra write, Delta's insert-only optimization), updates and
  deletes as explicit change files with ``_change_type`` in
  {``update_preimage``, ``update_postimage``, ``delete``}.
  ``read_changes(from_v, to_v)`` replays them; applying the feed to the
  v0 snapshot reconstructs any later version, which is what downstream
  incremental consumers (a 100 TB lake's materialized views) rely on.

Scale posture: the only shuffles are the key semi-join (source side is
the small delta — broadcast) and the merge join over touched files;
untouched data is never scanned past the pruning pass. The pruning scan
itself reads ONLY the key columns (parquet column pruning).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class MergeError(ValueError):
    pass


#: change-row schema marker column (Delta CDF naming)
CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


def _norm_file(col: Column) -> Column:
    """Normalize a file path/URI to a plain absolute path so that
    ``_metadata.file_path`` (``file:/x``), ``input_file_name()``
    (``file:///x``) and manifest entries (``/x``) all compare equal."""
    return F.regexp_replace(col, "^file:/+", "/")


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

    def _commit(
        self,
        files: list[str],
        operation: str,
        stats: dict,
        delete_files: list[str] | None = None,
        change_files: list[str] | None = None,
        insert_files: list[str] | None = None,
        mixed_schema: bool = False,
    ) -> int:
        vs = self._versions()
        next_v = (vs[-1] + 1) if vs else 0
        os.makedirs(self.manifest_dir, exist_ok=True)
        manifest = {
            "version": next_v,
            "files": sorted(files),
            # merge-on-read position deletes still pending against `files`
            "delete_files": sorted(delete_files or []),
            # CDF: explicit update/delete change rows for THIS commit
            "change_files": sorted(change_files or []),
            # CDF: data files added by this commit that are pure inserts —
            # read_changes() derives insert rows from them by reference
            "insert_files": sorted(insert_files or []),
            # True while data files of different schemas coexist (after a
            # schema-evolving MERGE, until compact rewrites uniformly)
            "mixed_schema": mixed_schema,
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

    # -- merge-on-read plumbing ---------------------------------------------
    def _delete_entries(self, delete_files: list[str]) -> DataFrame | None:
        """Union of position-delete files: (file_path, row_index) victims."""
        if not delete_files:
            return None
        return self.spark.read.parquet(*delete_files)

    def _read_data(self, files: list[str], mixed_schema: bool) -> DataFrame:
        """Raw data-file read. ``mixed_schema`` (set by a schema-evolving
        MERGE, cleared by compact) turns on parquet schema merging so
        files written before the evolution surface the new columns as
        nulls — the footer-union cost is paid only while the table
        actually is mixed."""
        r = self.spark.read
        if mixed_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(*files)

    def _scan(
        self, files: list[str], delete_files: list[str], mixed_schema: bool = False
    ) -> DataFrame:
        """Read data files with hidden position columns ``_file``/``_pos``
        and any pending deletion vectors already applied. The delete side
        is small by construction (it's the thing MoR keeps tiny), so the
        anti-join broadcasts — no shuffle of the data side."""
        df = self._read_data(files, mixed_schema).select(
            "*",
            _norm_file(F.col("_metadata.file_path")).alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        dels = self._delete_entries(delete_files)
        if dels is not None:
            df = df.join(
                F.broadcast(dels),
                (df["_file"] == dels["file_path"]) & (df["_pos"] == dels["row_index"]),
                "anti",
            )
        return df

    # -- public API --------------------------------------------------------
    def create(self, df: DataFrame, max_records_per_file: int | None = None) -> int:
        files = self._stage_files(df, max_records_per_file)
        return self._commit(
            files, "create", {"files_written": len(files)}, insert_files=files
        )

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        files = m["files"]
        if not files:
            raise MergeError(f"version {v} has no files")
        dels = m.get("delete_files", [])
        mixed = m.get("mixed_schema", False)
        if not dels:
            return self._read_data(files, mixed)
        cols = self._read_data(files, mixed).columns
        return self._scan(files, dels, mixed).select(*cols)

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    def delete_where(self, condition: Column) -> dict:
        """Merge-on-read DELETE: append a position-delete file instead of
        rewriting data. One pruned scan finds victim rows (with any
        pending deletes already applied, so a row can't be deleted
        twice); their ``(file_path, row_index)`` pairs become the new
        deletion-vector entries and their column values become the CDF
        ``delete`` change rows. Data files are untouched — at 100 TB a
        small delete costs KBs, and readers pay one broadcast anti-join
        until ``compact()`` purges."""
        v = self.current_version()
        m = self._manifest(v)
        files, dels = m["files"], m.get("delete_files", [])
        mixed = m.get("mixed_schema", False)
        live = self._scan(files, dels, mixed)
        data_cols = [c for c in live.columns if c not in ("_file", "_pos")]

        # one pass over the table: stage victims (data cols + position)
        stage = os.path.join(self.path, f"_deletes/victims-{uuid.uuid4().hex[:12]}")
        live.filter(condition).write.mode("overwrite").parquet(stage)
        victims = self.spark.read.parquet(stage)
        n_victims = victims.count()
        if n_victims == 0:
            shutil.rmtree(stage, ignore_errors=True)
            new_v = self._commit(
                files, "delete", {"rows_deleted": 0}, delete_files=dels,
                mixed_schema=mixed,
            )
            return {"rows_deleted": 0, "version": new_v}

        # the small artifacts both derive from the staged victims file
        entry_path = os.path.join(self.path, f"_deletes/del-{uuid.uuid4().hex[:12]}")
        victims.select(
            F.col("_file").alias("file_path"), F.col("_pos").alias("row_index")
        ).coalesce(1).write.mode("overwrite").parquet(entry_path)
        change_path = os.path.join(self.path, f"_changes/chg-{uuid.uuid4().hex[:12]}")
        victims.select(*data_cols).withColumn(
            CHANGE_TYPE, F.lit("delete")
        ).coalesce(1).write.mode("overwrite").parquet(change_path)

        def _parts(d: str) -> list[str]:
            return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]

        shutil.rmtree(stage, ignore_errors=True)  # scratch; both artifacts written
        stats = {"rows_deleted": n_victims, "delete_files_total": len(dels) + len(_parts(entry_path))}
        new_v = self._commit(
            files, "delete", stats,
            delete_files=dels + _parts(entry_path),
            change_files=_parts(change_path),
            mixed_schema=mixed,
        )
        stats["version"] = new_v
        return stats

    def read_changes(
        self, from_version: int = 0, to_version: int | None = None
    ) -> DataFrame:
        """Change data feed: row-level changes committed in
        ``[from_version, to_version]``, with ``_change_type`` in
        {insert, update_preimage, update_postimage, delete} and
        ``_commit_version``. Inserts are derived by REFERENCE from the
        commit's freshly-added data files (no change rows were written
        for them — Delta's insert-only optimization); updates/deletes
        come from the explicit change files. Replaying the feed over the
        starting snapshot reconstructs the ending snapshot."""
        spark = self.spark
        to_v = self.current_version() if to_version is None else to_version
        end_schema = self.read(to_v).schema
        cols = [f.name for f in end_schema.fields]
        types = {f.name: f.dataType for f in end_schema.fields}

        def _pad(df: DataFrame) -> DataFrame:
            # files written before a schema evolution lack the new
            # columns — surface them as typed NULLs like Delta CDF does
            return df.select(
                *[
                    df[c] if c in df.columns else F.lit(None).cast(types[c]).alias(c)
                    for c in cols
                ],
                *([df[CHANGE_TYPE]] if CHANGE_TYPE in df.columns else []),
            )

        parts: list[DataFrame] = []
        for v in range(from_version, to_v + 1):
            m = self._manifest(v)
            ins = m.get("insert_files", [])
            if ins:
                parts.append(
                    _pad(spark.read.parquet(*ins))
                    .withColumn(CHANGE_TYPE, F.lit("insert"))
                    .withColumn(COMMIT_VERSION, F.lit(v))
                )
            chg = m.get("change_files", [])
            if chg:
                parts.append(
                    _pad(spark.read.parquet(*chg))
                    .withColumn(COMMIT_VERSION, F.lit(v))
                )
        if not parts:
            from pyspark.sql.types import LongType, StringType, StructField, StructType

            empty = StructType(
                list(end_schema.fields)
                + [
                    StructField(CHANGE_TYPE, StringType()),
                    StructField(COMMIT_VERSION, LongType()),
                ]
            )
            return spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        when_matched_update: dict[str, Column] | None = None,
        when_matched_delete: Column | None = None,
        insert_not_matched: bool = True,
        max_records_per_file: int | None = None,
        schema_evolution: bool = False,
    ) -> dict:
        """MERGE ``source`` into the table on equality of ``on`` keys.

        Order of clauses (Delta semantics): a matched row first checks
        ``when_matched_delete`` (a boolean Column; source columns via the
        module's ``src("name")`` helper); if it doesn't fire,
        ``when_matched_update`` applies (mapping of target column ->
        Column over target cols and ``src("name")`` source refs);
        unmatched source rows insert when ``insert_not_matched``.
        Returns commit stats.

        ``schema_evolution`` (Delta ``autoMerge``): source columns absent
        from the table become new table columns — rewritten/inserted
        rows carry them (matched rows take the value only if the update
        clause sets it), carried files surface them as NULL via parquet
        schema merging until ``compact()`` rewrites uniformly. With the
        flag off (default), extra source columns are clause inputs only
        and never change the table schema.
        """
        spark = self.spark
        v = self.current_version()
        m = self._manifest(v)
        all_files = m["files"]
        pending_dels = m.get("delete_files", [])
        was_mixed = m.get("mixed_schema", False)

        # 1) duplicate-source guard (Delta raises on multi-match):
        dup = (
            source.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise MergeError(
                "source has duplicate merge keys — MERGE would be ambiguous"
            )

        # 2) file pruning: which data files contain matched LIVE keys?
        # Reads only the key columns (+ hidden position cols); pending
        # deletion vectors are applied so a MoR-deleted row can't match.
        # The source side of the join is the small delta → broadcast.
        abs_to_orig = {os.path.abspath(f): f for f in all_files}
        live = self._scan(all_files, pending_dels, was_mixed)
        touched = sorted(
            abs_to_orig.get(r["_file"], r["_file"])
            for r in live.select(*on, "_file")
            .join(F.broadcast(source.select(*on).dropDuplicates(on)), on, "semi")
            .select("_file")
            .distinct()
            .collect()
        )
        untouched = [f for f in all_files if f not in set(touched)]

        def _parts(d: str) -> list[str]:
            return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]

        # 3) deletion-vector carry: entries pointing at untouched files
        # stay valid; entries for touched files die with the rewrite
        # (their rows are physically dropped by the _scan below).
        carried_dels: list[str] = []
        if pending_dels:
            if not touched:
                carried_dels = pending_dels
            else:
                untouched_abs = [os.path.abspath(f) for f in untouched]
                kept = self._delete_entries(pending_dels).filter(
                    F.col("file_path").isin(untouched_abs)
                )
                keep_dir = os.path.join(
                    self.path, f"_deletes/del-{uuid.uuid4().hex[:12]}"
                )
                kept.coalesce(1).write.mode("overwrite").parquet(keep_dir)
                if spark.read.parquet(keep_dir).limit(1).count():
                    carried_dels = _parts(keep_dir)

        # 4) row-level merge over ONLY the touched files
        stats = {
            "files_total": len(all_files),
            "files_touched": len(touched),
            "files_carried": len(untouched),
        }
        new_files: list[str] = list(untouched)
        tgt_schema = self._read_data(all_files, was_mixed).schema
        target_cols = [f.name for f in tgt_schema.fields]
        tgt_types = {f.name: f.dataType for f in tgt_schema.fields}
        # schema evolution: extra source columns become table columns;
        # otherwise they are clause inputs only
        new_cols = (
            [c for c in source.columns if c not in target_cols]
            if schema_evolution
            else []
        )
        src_types = {f.name: f.dataType for f in source.schema.fields}
        out_target_cols = target_cols + new_cols
        now_mixed = was_mixed or (bool(new_cols) and bool(untouched))
        src_aliased = source.select(
            *[F.col(c).alias(f"_src_{c}") for c in source.columns]
        )
        join_cond = [
            F.col(k).eqNullSafe(F.col(f"_src_{k}")) for k in on
        ]

        change_files: list[str] = []
        if touched:
            tgt = self._scan(touched, pending_dels, was_mixed).select(*target_cols)
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
            for c in new_cols:
                upd = (when_matched_update or {}).get(c)
                null = F.lit(None).cast(src_types[c])
                out_cols.append(
                    (F.when(matched, upd).otherwise(null) if upd is not None else null)
                    .alias(c)
                )
            rewritten = joined.filter(keep).select(*out_cols)
            new_files += self._stage_files(rewritten, max_records_per_file)

            # CDF: update/delete change rows from the SAME pruned join —
            # touched files only, so the extra passes never scan the
            # carried bulk of the table.
            pieces: list[DataFrame] = []
            if when_matched_delete is not None:
                pieces.append(
                    joined.filter(matched & when_matched_delete)
                    .select(*target_cols)
                    .withColumn(CHANGE_TYPE, F.lit("delete"))
                )
            if when_matched_update:
                upd_rows = joined.filter(matched & keep)
                pieces.append(
                    upd_rows.select(*target_cols)
                    .withColumn(CHANGE_TYPE, F.lit("update_preimage"))
                )
                pieces.append(
                    upd_rows.select(*out_cols)
                    .withColumn(CHANGE_TYPE, F.lit("update_postimage"))
                )
            if pieces:
                chg = pieces[0]
                for p in pieces[1:]:
                    # pre-images keep the pre-evolution schema; missing
                    # new columns become NULL in the change file
                    chg = chg.unionByName(p, allowMissingColumns=True)
                chg_dir = os.path.join(
                    self.path, f"_changes/chg-{uuid.uuid4().hex[:12]}"
                )
                chg.write.mode("overwrite").parquet(chg_dir)
                counts = {
                    r[CHANGE_TYPE]: r["count"]
                    for r in spark.read.parquet(chg_dir)
                    .groupBy(CHANGE_TYPE)
                    .count()
                    .collect()
                }
                stats["rows_updated"] = counts.get("update_postimage", 0)
                stats["rows_deleted"] = counts.get("delete", 0)
                if counts:
                    change_files = _parts(chg_dir)

        # 5) inserts: source rows matching NO live target key anywhere
        # (a MoR-deleted key is insertable again)
        insert_files: list[str] = []
        if insert_not_matched:
            inserts = source.join(
                live.select(*on).dropDuplicates(on),
                on,
                "anti",
            ).select(
                *[
                    F.col(c)
                    if c in source.columns
                    # typed null, not NullType — parquet can't store void
                    else F.lit(None).cast(tgt_types[c]).alias(c)
                    for c in out_target_cols
                ]
            )
            n_ins = inserts.count()
            stats["rows_inserted"] = n_ins
            if n_ins:
                insert_files = self._stage_files(inserts, max_records_per_file)
                new_files += insert_files

        if new_cols:
            stats["columns_added"] = new_cols
        new_v = self._commit(
            new_files,
            "merge",
            stats,
            delete_files=carried_dels,
            change_files=change_files,
            insert_files=insert_files,
            mixed_schema=now_mixed,
        )
        stats["version"] = new_v
        return stats

    def overwrite_where(
        self,
        condition: Column,
        replacement: DataFrame,
        max_records_per_file: int | None = None,
    ) -> dict:
        """Transactional partial overwrite (Delta ``replaceWhere`` /
        dynamic partition overwrite): atomically replace exactly the rows
        matching ``condition`` with ``replacement`` in ONE commit —
        readers see either the old state or the new, never the gap a
        delete-then-append pair would expose.

        Files with no matching row carry by reference (same pruning as
        MERGE); files that match are rewritten without their victims;
        ``replacement`` stages as new files. Rows of ``replacement`` that
        violate ``condition`` are rejected (Delta's constraint check) —
        otherwise "replace yesterday's partition" could silently write
        into other days. CDF: removed rows are ``delete`` changes, the
        replacement is an insert-by-reference."""
        spark = self.spark
        v = self.current_version()
        m = self._manifest(v)
        all_files = m["files"]
        pending_dels = m.get("delete_files", [])
        mixed = m.get("mixed_schema", False)

        target_cols = [
            f.name for f in self._read_data(all_files, mixed).schema.fields
        ]
        bad = replacement.filter(~condition).limit(1).count()
        if bad:
            raise MergeError(
                "replacement rows must satisfy the overwrite condition"
            )

        live = self._scan(all_files, pending_dels, mixed)
        abs_to_orig = {os.path.abspath(f): f for f in all_files}
        touched = sorted(
            abs_to_orig.get(r["_file"], r["_file"])
            for r in live.filter(condition).select("_file").distinct().collect()
        )
        untouched = [f for f in all_files if f not in set(touched)]

        def _parts(d: str) -> list[str]:
            return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]

        # deletion-vector carry (same rule as MERGE: touched-file entries
        # die with the rewrite, untouched-file entries stay valid)
        carried_dels: list[str] = []
        if pending_dels:
            if not touched:
                carried_dels = pending_dels
            else:
                untouched_abs = [os.path.abspath(f) for f in untouched]
                kept = self._delete_entries(pending_dels).filter(
                    F.col("file_path").isin(untouched_abs)
                )
                keep_dir = os.path.join(
                    self.path, f"_deletes/del-{uuid.uuid4().hex[:12]}"
                )
                kept.coalesce(1).write.mode("overwrite").parquet(keep_dir)
                if spark.read.parquet(keep_dir).limit(1).count():
                    carried_dels = _parts(keep_dir)

        new_files: list[str] = list(untouched)
        change_files: list[str] = []
        n_removed = 0
        if touched:
            tgt = self._scan(touched, pending_dels, mixed).select(*target_cols)
            new_files += self._stage_files(
                tgt.filter(~condition), max_records_per_file
            )
            chg_dir = os.path.join(
                self.path, f"_changes/chg-{uuid.uuid4().hex[:12]}"
            )
            tgt.filter(condition).withColumn(
                CHANGE_TYPE, F.lit("delete")
            ).write.mode("overwrite").parquet(chg_dir)
            n_removed = (
                spark.read.parquet(chg_dir).count()
            )
            if n_removed:
                change_files = _parts(chg_dir)

        insert_files = self._stage_files(
            replacement.select(*target_cols), max_records_per_file
        )
        new_files += insert_files
        stats = {
            "files_total": len(all_files),
            "files_touched": len(touched),
            "files_carried": len(untouched),
            "rows_removed": n_removed,
        }
        new_v = self._commit(
            new_files,
            "overwrite_where",
            stats,
            delete_files=carried_dels,
            change_files=change_files,
            insert_files=insert_files,
            mixed_schema=mixed,
        )
        stats["version"] = new_v
        return stats

    def compact(
        self,
        sort_col: str | None = None,
        target_files: int | None = None,
        max_records_per_file: int | None = None,
        zorder: tuple[str, str] | None = None,
    ) -> dict:
        """OPTIMIZE: rewrite the current version into ``target_files``
        right-sized files (range-clustered on ``sort_col`` so parquet
        min/max stats prune key ranges afterwards, or Z-ordered on a
        ``zorder`` column pair — Delta/Iceberg ``OPTIMIZE ZORDER BY`` —
        so files stay narrow in BOTH dimensions). Pending deletion
        vectors are MATERIALIZED (``read()`` applies them), so the new
        version carries none — this is the MoR purge step. A
        schema-evolved mixed table is rewritten uniformly (flag cleared).
        Old versions keep their file lists — time travel still works
        until ``vacuum``."""
        if sort_col and zorder:
            raise MergeError("pass sort_col OR zorder, not both")
        df = self.read()
        if target_files is None:
            target_files = int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        if zorder:
            from pyspark.sql.window import Window as W

            from ..plans.layout import morton_code

            bits = 16
            ca, cb = zorder
            coded = df.withColumn(
                "__z",
                morton_code(
                    F.ntile(1 << bits).over(W.orderBy(F.col(ca))) - 1,
                    F.ntile(1 << bits).over(W.orderBy(F.col(cb))) - 1,
                    bits,
                ),
            )
            out = (
                coded.repartitionByRange(target_files, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif sort_col:
            out = df.repartitionByRange(target_files, F.col(sort_col))
        else:
            out = df.repartition(target_files)
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

        def _all_refs(man: dict) -> list[str]:
            return (
                man["files"]
                + man.get("delete_files", [])
                + man.get("change_files", [])
            )

        live = set()
        for v in keep_vs:
            live.update(_all_refs(self._manifest(v)))
        removed = 0
        for v in drop_vs:
            for f in _all_refs(self._manifest(v)):
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
