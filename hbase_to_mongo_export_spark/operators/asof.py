"""As-of (point-in-time) and range joins.

The reference has no joins at all (SURVEY §2.8) — these are part of the
general analytics surface the Spark engine adds.

``asof_join`` uses the union+window formulation instead of an inequality
join: tag both sides, union, and carry the latest right-side row forward
with ``last(ignorenulls=True)`` over a (key, ts) window. This costs ONE
shuffle on (key) and never builds the O(|L|·|R|) intermediate a range-
condition join explodes into — the formulation that survives 100 TB.
Skewed keys are handled by AQE skew-split since the shuffle is a plain
hash partition on the key.

``range_join_within`` expresses bounded-interval joins with an equality
blocking key plus range predicate, so Catalyst plans a hash join with the
range as a post-filter rather than a nested-loop cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    inclusive: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    ``key`` whose ``right_ts`` <= ``left_ts`` (or < when inclusive=False).

    Returns all left columns plus ``<value_col><suffix>`` columns and
    ``<right_ts><suffix>`` (null when no right row precedes).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]

    # side marker orders right rows before (inclusive) or after (exclusive)
    # left rows at equal timestamps.
    right_priority, left_priority = (0, 1) if inclusive else (1, 0)

    carried = [f"__r_{c}" for c in value_cols] + ["__r_ts"]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(left_priority).alias("__prio"),
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("__r_ts"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(right_priority).alias("__prio"),
        F.lit(False).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).cast("timestamp").alias("__r_ts"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__prio")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_left",
        "__left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    ).filter("__is_left")

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__r_{c}").alias(f"{c}{suffix}") for c in value_cols]
    out_cols.append(F.col("__r_ts").alias(f"{right_ts}{suffix}"))
    return filled.select(*out_cols)


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` whose timestamp lies within
    [left_ts + lower_seconds, left_ts + upper_seconds], equi-blocked on
    ``key`` so the physical plan is a hash join + filter, not a cross
    product."""
    lts = F.col(f"l.{left_ts}").cast("timestamp")
    rts = F.col(f"r.{right_ts}").cast("timestamp")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return left.alias("l").join(right.alias("r"), cond, how)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Pairs of intervals that OVERLAP (a.start <= b.end AND
    b.start <= a.end), equi-blocked on ``key`` so the physical plan is a
    hash join on the key plus a residual filter — never a cross product.
    Returns the aliased join ('l', 'r'); callers project/aggregate.

    Scale notes: per-key interval sets are the blocking unit, so skewed
    keys (one entity with millions of intervals) are the hazard — AQE
    skew-join splits the probe side. For keyless interval joins, bucket
    time into coarse grains and join on the grain (each interval lands in
    ceil(span/grain) buckets) — the standard interval-bucketing trick."""
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"l.{left_start}") <= F.col(f"r.{right_end}"))
        & (F.col(f"r.{right_start}") <= F.col(f"l.{left_end}"))
    )
    return left.alias("l").join(right.alias("r"), cond)
