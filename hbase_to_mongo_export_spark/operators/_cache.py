"""Ownership registry for cached intermediate DataFrames.

Several operators (tfidf_cosine_pairs, winnowing, minhash signatures,
pagerank degree tables) materialize an intermediate with ``.cache()``
because it feeds multiple consumers in the same lazily-built plan. The
operator function cannot unpersist it itself — the consumer has not run
yet when the function returns — so cached blocks would otherwise pile up
across a long-lived session (driver runs 200+ queries in one JVM) and
rely on LRU eviction under memory pressure.

Contract: operators route every intermediate ``.cache()`` through
``track()``; session owners (bench.py per-query loop, the oracle test
fixture, CLI commands) call ``release_all()`` once the consuming action
has completed. ``release_all`` is idempotent and safe on a stopped
SparkContext.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

_SPILL_ROOT: str | None = None
_SPILL_LOCK = threading.Lock()


def spill_parquet(df: DataFrame, tag: str) -> DataFrame:
    """Materialize a REUSED corpus-scale intermediate to a per-process
    temp parquet and return a fresh scan of it.

    The disk twin of ``_mat``: where ``_mat``/``.cache()`` is right for
    bounded frames, a corpus-scale frame (shingle arrays, exploded
    postings) re-used by k consumers must NOT become executor-resident
    (guide §5 — cached data competes with execution memory); writing it
    once as columnar zstd parquet and streaming it back into each
    consumer replaces k recomputes with one compute + k cheap scans,
    with pushdown/pruning intact on the scans (guide §6).

    Per-run semantics: every call writes a fresh directory under a
    process-private mkdtemp root (removed at exit), so nothing persists
    across bench/oracle invocations and concurrent builder threads never
    collide."""
    global _SPILL_ROOT
    with _SPILL_LOCK:
        if _SPILL_ROOT is None:
            _SPILL_ROOT = tempfile.mkdtemp(prefix="htme_opspill_")
            atexit.register(shutil.rmtree, _SPILL_ROOT, True)
    path = tempfile.mkdtemp(dir=_SPILL_ROOT, prefix=tag + "_")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def track(df: DataFrame) -> DataFrame:
    """Register a cached DataFrame for later release; returns it unchanged."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # stopped context / already-freed blocks — nothing to release
            pass
    return n
