"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins
at runtime; these helpers cover the cases AQE cannot rewrite:

- ``salted_agg``: two-stage aggregation for heavily-skewed group keys —
  stage 1 aggregates on (key, salt) spreading a hot key over N reducers,
  stage 2 merges the partials. Classic count/sum/min/max decompositions.

- ``salted_broadcast_left``: replicate-broadcast join for a skewed LEFT
  key against a small-but-not-tiny right side: right rows are exploded
  ×N_salt, left rows pick a deterministic salt from a high-entropy hash,
  so each hot-key left row matches exactly one right replica and the
  shuffle spreads over N_salt reducers.

At 100 TB these are per-pipeline opt-ins: measure first (AQE's runtime
stats in the UI name the skewed partitions), then salt just the skewed
stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decomposable aggregate → (stage1 expr builder, stage2 merge builder)
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), lambda p: F.sum(p).cast("bigint")),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (agg_name ∈ count/sum/min/max, input
    column). Example::

        salted_agg(events, "user_id", {"n": ("count", "*"),
                                       "total": ("sum", "value")})
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    stage1_exprs = []
    stage2_exprs = []
    for out, (name, col) in aggs.items():
        s1, s2 = _MERGEABLE[name]
        stage1_exprs.append(s1(F.col(col) if col != "*" else None).alias(f"__p_{out}"))
        stage2_exprs.append(s2(F.col(f"__p_{out}")).alias(out))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(*stage1_exprs)
    )
    return partial.groupBy(key).agg(*stage2_exprs)


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: explode the right side ×n_salt, give each left
    row a deterministic salt, join on (key, salt). Right side must be
    modest (it is replicated n_salt times)."""
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    l_salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    l = left.withColumn("__salt", l_salt)
    return l.join(r, on=[key, "__salt"], how=how).drop("__salt")


def hotkey_split_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    hot_threshold: int,
) -> DataFrame:
    """The hot-key isolation join — the manual skew answer when AQE and
    salting don't fit (e.g. the dim side is too big to broadcast whole
    but the HOT slice of it is tiny): detect keys above ``hot_threshold``
    occurrences in the fact table, join hot facts against the hot dim
    slice via broadcast (no shuffle of the skewed mass), join the cold
    remainder with a plain shuffle join, and union. Results are
    join-identical to the plain join — only the physical plan differs.

    Returns the joined DataFrame (all fact columns + dim columns)."""
    counts = facts.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    hot_keys = counts.filter(F.col("__n") > hot_threshold).select(key)
    hot_facts = facts.join(F.broadcast(hot_keys), key, "left_semi")
    cold_facts = facts.join(F.broadcast(hot_keys), key, "left_anti")
    hot_dim = dim.join(F.broadcast(hot_keys), key, "left_semi")
    joined_hot = hot_facts.join(F.broadcast(hot_dim), key)
    joined_cold = cold_facts.join(dim, key)
    return joined_hot.unionByName(joined_cold)
