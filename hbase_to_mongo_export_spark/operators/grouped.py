"""Grouped-map (applyInPandas) and Arrow-native (mapInArrow) operators.

These complete the engine's UDF surface (SURVEY §2.8 F7): alongside
scalar pandas UDFs (crypto/normalize), mapInPandas (multimodal, packing),
applyInPandasWithState (streaming/stateful.py), and the Python UDTF, this
module adds

- ``grouped_median_mad``   — the grouped-map pattern: whole-group pandas
  logic (selection medians need the full sorted group) with cogroup-free
  shuffle-on-key semantics; and
- ``arrow_text_bytes``     — the zero-copy Arrow iterator pattern: per-
  batch pyarrow.compute kernels with no pandas materialization, the
  cheapest Python path for columnar byte-level work.

Determinism notes: both operators stay engine-exact — medians are
SELECTION (lower-median of sorted integers, never interpolated floats)
and the Arrow kernels return integer char/byte counts, so DuckDB oracles
reproduce every value.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIAN_MAD_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("median", T.LongType()),
        T.StructField("mad", T.LongType()),
    ]
)


def _lower_median(sorted_vals) -> int:
    # lower median = element (n-1)//2 of the ascending sort — a selection,
    # identical in any engine (no .5 interpolation to disagree on)
    return int(sorted_vals[(len(sorted_vals) - 1) // 2])


def grouped_median_mad(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group robust location/scale via applyInPandas: lower-median of
    the integer values and the lower-median of absolute deviations (MAD).
    The group shuffles to one task — the right trade for statistics that
    need the whole sorted group; at 100 TB group count provides the
    parallelism (keys are the unit of work, not rows)."""
    import numpy as np

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(pdf[value_col].to_numpy(dtype="int64"))
        med = _lower_median(vals)
        mad = _lower_median(np.sort(np.abs(vals - med)))
        return pd.DataFrame(
            {
                "group_key": [pdf[group_col].iloc[0]],
                "n_rows": [len(vals)],
                "median": [med],
                "mad": [mad],
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        stats, MEDIAN_MAD_SCHEMA
    )


TEXT_BYTES_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def arrow_text_bytes(df: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Per-row UTF-8 character and byte counts via mapInArrow — pyarrow
    compute kernels on the raw Arrow batches, no pandas conversion. The
    char/byte split only differs for multi-byte scripts, which is exactly
    the property a tokenizer-budget pipeline needs to see."""
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index(text_col))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index(lang_col)),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                schema=pa.schema(
                    [
                        pa.field("lang", pa.string()),
                        pa.field("n_chars", pa.int64()),
                        pa.field("n_bytes", pa.int64()),
                    ]
                ),
            )

    return df.select(lang_col, text_col).mapInArrow(run, TEXT_BYTES_SCHEMA)


COGROUP_ASOF_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("last_click_id", T.LongType()),
        T.StructField("n_prior_clicks", T.LongType()),
    ]
)


def cogrouped_asof_merge(left: DataFrame, right: DataFrame) -> DataFrame:
    """The COGROUPED grouped-map surface (``groupBy().cogroup().
    applyInPandas``): both sides shuffle on the key once and each pandas
    call receives the two aligned groups — the API for per-key merge
    logic that needs full visibility of both sides (as-of alignment,
    interval reconciliation, per-entity diffing).

    Semantics here: for each purchase, the most recent click at or
    before its timestamp (ties on ts break to the highest event_id) and
    the count of prior clicks — computed vectorized with searchsorted
    over the per-user click timeline, never a per-row Python loop.

    ``left``: (user_id, purchase_id, ts); ``right``: (user_id,
    click_id, ts). Keys present on only one side still produce calls
    (the other frame arrives empty) — purchases without clicks emit
    NULL/0, clicks without purchases emit nothing, which the oracle's
    LEFT JOIN reproduces.
    """
    import numpy as np

    def merge(key, lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if len(lp) == 0:
            return pd.DataFrame(
                columns=["user_id", "purchase_id", "last_click_id",
                         "n_prior_clicks"]
            )
        lp = lp.sort_values(["ts", "purchase_id"])
        rp = rp.sort_values(["ts", "click_id"])
        lts = lp["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        rts = rp["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        n_prior = np.searchsorted(rts, lts, side="right")
        click_ids = rp["click_id"].to_numpy()
        last = [
            int(click_ids[i - 1]) if i > 0 else None for i in n_prior
        ]
        return pd.DataFrame(
            {
                "user_id": lp["user_id"].to_numpy(),
                "purchase_id": lp["purchase_id"].to_numpy(),
                "last_click_id": pd.array(last, dtype="Int64"),
                "n_prior_clicks": n_prior.astype("int64"),
            }
        )

    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(merge, COGROUP_ASOF_SCHEMA)
    )
