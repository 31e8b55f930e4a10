"""Snapshot + manifest sinks.

Two modes:

- **native** (default, the 100 TB path): `df.write.text` with a Spark
  compression codec for the snapshot, and a pipe-delimited CSV dataset for
  the manifest. Catalyst/Tungsten handle parallelism; file size is governed
  by partition size (`spark.sql.files.maxRecordsPerFile` if needed). Two
  jobs over a persisted plan.

- **strict** (fidelity mode): reproduces the reference's byte-capped,
  %06d-numbered, optionally AES-CTR-encrypted batch files plus per-batch
  manifest CSVs (S3StreamingWriter.kt:73-189) in a single pass via
  `mapPartitions` — the honest Spark mapping for a sink Spark's writer
  cannot express (uncompressed-byte caps, close-time file numbering).

Strict-mode fidelity details mirrored from the reference:
- rotation check is `batchSizeBytes + len(item) > cap or batchSizeBytes == 0`
  *before* append, so the first record always opens a batch and a single
  oversized record still gets written (S3StreamingWriter.kt:78-80);
- size accounting counts string length (UTF-16 units in Kotlin; code points
  here), not encoded bytes — a deliberate quirk copy;
- data files are numbered from -000001 while each batch's manifest carries
  the pre-increment counter (-000000 for the first) — the reference
  increments the counter when a batch opens and names data objects at close
  time (S3StreamingWriter.kt:99-101,155-159; UberTestSpec.kt:533-552);
- manifest rows are CSV-escaped (quote when a comma/quote/CR/LF is present,
  quotes doubled) though the delimiter is '|' (DomainClasses.kt:85-88);
- file layout: <dir>/<topic>-<start:03d>-<stop:03d>-%06d.txt[.gz][.enc];
  split bounds come from the first rowkey byte / scan.width. The signed-byte
  wraparound split names of the reference partitioner are not reproduced —
  splits here are unsigned [i*w, (i+1)*w).
"""

from __future__ import annotations

import base64
import bz2 as bz2mod
import gzip as gzipmod
import json
import os
from dataclasses import dataclass
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import crypto
from .export import ExportConfig

MANIFEST_COLUMNS = (
    "manifest_id",
    "manifest_ts",
    "db",
    "collection",
    "manifest_source",
    "outer_type",
    "manifest_original_id",
    "inner_type",
)


def csv_escape_col(c: Column) -> Column:
    """commons-text escapeCsv as a column expression: wrap in quotes (and
    double embedded quotes) iff the value contains , " CR or LF."""
    needs = c.rlike('[,"\r\n]')
    quoted = F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))
    return F.when(needs, quoted).otherwise(c)


def manifest_line_col() -> Column:
    """Pipe-joined, CSV-escaped manifest line (DomainClasses.kt:85-88):
    id|timestamp|db|collection|source|externalOuterSource|originalId|externalInnerSource
    """
    cols = [csv_escape_col(F.col(c).cast("string")) for c in MANIFEST_COLUMNS]
    return F.concat_ws("|", *cols)


def csv_escape(value: str) -> str:
    if any(ch in value for ch in ',"\r\n'):
        return '"' + value.replace('"', '""') + '"'
    return value


def manifest_csv_line(row) -> str:
    return "|".join(csv_escape(str(row[c])) for c in MANIFEST_COLUMNS) + "\n"


@dataclass
class WrittenOutput:
    records: int
    files: list[str]
    manifest_files: list[str]
    uncompressed_bytes: int = 0  # record bytes excl. newlines (strict sink)


def write_snapshot(records: DataFrame, cfg: ExportConfig) -> WrittenOutput:
    if cfg.strict_sink:
        return _write_strict(records, cfg)
    return _write_native(records, cfg)


def _write_native(records: DataFrame, cfg: ExportConfig) -> WrittenOutput:
    """Spark-native two-output write; records plan persisted so the UDF
    pipeline runs once."""
    manifest_dir = cfg.manifest_dir or os.path.join(cfg.output_dir, "_manifest")
    records = records.persist()
    try:
        (
            records.select("record")
            .write.mode("overwrite")
            .option("compression", cfg.compression)
            .text(cfg.output_dir)
        )
        (
            records.select(manifest_line_col().alias("value"))
            .write.mode("overwrite")
            .text(manifest_dir)
        )
        n = records.count()
    finally:
        records.unpersist()
    return WrittenOutput(n, _list_parts(cfg.output_dir), _list_parts(manifest_dir))


def _list_parts(path: str) -> list[str]:
    """Output-file listing for local paths; remote URIs (s3a://, hdfs://)
    are enumerated by the object store's lister downstream — return empty
    rather than pretending os.listdir works there."""
    if "://" in path and not path.startswith("file://"):
        return []
    local = path[len("file://"):] if path.startswith("file://") else path
    if not os.path.isdir(local):
        return []
    return sorted(
        os.path.join(local, f) for f in os.listdir(local) if f.startswith("part-")
    )


_COMPRESSORS = {
    "gzip": (lambda b: gzipmod.compress(b, mtime=0), "gz"),
    "bzip2": (lambda b: bz2mod.compress(b), "bz2"),
    "none": (lambda b: b, "txt"),
}


def _write_strict(records: DataFrame, cfg: ExportConfig) -> WrittenOutput:
    """Single-pass byte-capped writer (see module docstring)."""
    out_dir = cfg.output_dir
    manifest_dir = cfg.manifest_dir or os.path.join(out_dir, "_manifest")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(manifest_dir, exist_ok=True)

    topic = cfg.topic
    width = cfg.scan_width
    cap = cfg.max_batch_bytes
    compress, ext = _COMPRESSORS[cfg.compression if cfg.compression != "lz4" else "gzip"]
    encrypt = cfg.encrypt_output
    data_key = os.urandom(16) if encrypt else None

    # Route each record to its keyspace split (first unsigned rowkey byte).
    df = records.withColumn(
        "__split", (F.expr("cast(conv(hex(substring(key, 1, 1)), 16, 10) as int)") / width).cast("int")
    )
    n_splits = (256 + width - 1) // width
    df = df.repartition(n_splits, F.col("__split"))

    def write_partition(rows: Iterable) -> Iterator[dict]:
        # One open batch per split present in this task.
        state: dict[int, dict] = {}
        results: list[dict] = []

        def split_name(idx: int) -> str:
            start = idx * width
            stop = (idx + 1) * width
            stop = 0 if stop >= 256 else stop
            return f"{topic}-{start:03d}-{stop:03d}"

        def open_batch(st: dict) -> None:
            st["manifest_path"] = os.path.join(
                manifest_dir, f"{st['prefix']}-{st['counter']:06d}.csv"
            )
            st["counter"] += 1
            st["buf"] = bytearray()
            st["manifest_buf"] = []
            st["size"] = 0
            st["n"] = 0

        def close_batch(st: dict) -> None:
            if st["size"] <= 0:
                return
            payload = compress(bytes(st["buf"]))
            suffix = f".{ext}" if ext != "txt" else ""
            name = f"{st['prefix']}-{st['counter']:06d}.txt{suffix}"
            meta = None
            if encrypt:
                iv = os.urandom(16)
                payload = crypto.encrypt_bytes(data_key, iv, payload)
                name += ".enc"
                meta = {
                    "iv": base64.b64encode(iv).decode(),
                    "dataKey": base64.b64encode(data_key).decode(),
                }
            path = os.path.join(out_dir, name)
            with open(path, "wb") as fh:
                fh.write(payload)
            if meta is not None:
                with open(path + ".meta.json", "w") as fh:
                    json.dump(meta, fh)
            with open(st["manifest_path"], "w", encoding="utf-8") as fh:
                fh.writelines(st["manifest_buf"])
            results.append(
                {
                    "file": path,
                    "manifest_file": st["manifest_path"],
                    "records": st["n"],
                    "bytes": st["size"] - st["n"],  # minus one newline/record
                }
            )

        for row in rows:
            idx = row["__split"]
            st = state.get(idx)
            if st is None:
                st = {"prefix": split_name(idx), "counter": 0}
                state[idx] = st
                open_batch(st)
            item = row["record"] + "\n"
            if st["size"] + len(item) > cap or st["size"] == 0:
                if st["size"] > 0:
                    close_batch(st)
                    open_batch(st)
            st["buf"] += item.encode("utf-8")
            st["size"] += len(item)
            st["n"] += 1
            st["manifest_buf"].append(manifest_csv_line(row))

        for st in state.values():
            close_batch(st)
        return iter(results)

    out = df.rdd.mapPartitions(write_partition).collect()
    return WrittenOutput(
        records=sum(r["records"] for r in out),
        files=sorted(r["file"] for r in out),
        manifest_files=sorted(r["manifest_file"] for r in out),
        uncompressed_bytes=sum(r["bytes"] for r in out),
    )
