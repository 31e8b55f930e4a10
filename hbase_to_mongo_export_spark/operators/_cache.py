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

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


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
