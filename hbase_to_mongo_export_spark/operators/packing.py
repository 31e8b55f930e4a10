"""Sequence packing: group variable-length documents into fixed token-
budget packs (the pre-tokenization batching step of LLM training
pipelines — maximizes tokens-per-sequence without splitting documents).

Packing is inherently imperative (greedy bin packing has loop-carried
state), so this is a legitimate mapInPandas use: Arrow-batched, one pass,
state confined to a partition. The partition is the packing domain —
packs never span partitions, which is exactly what a distributed writer
wants (each task emits self-contained packs).

Determinism: within a partition documents are packed in (length desc,
doc_id) order — first-fit-decreasing, which is both the standard
approximation (≤ 11/9 OPT + 1 bins) and stable under re-execution of the
task. Pack ids are (partition_id, local_seq), unique without any global
coordination at any scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("pack_fill", T.IntegerType()),  # running fill of the pack
    ]
)


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
) -> DataFrame:
    """Assign every document (with whitespace token count <= budget; longer
    docs are dropped, matching truncation-free packing) to a pack whose
    total token count never exceeds ``budget``."""

    def pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        rows = _pd.concat(list(batches), ignore_index=True) if batches else None
        if rows is None or len(rows) == 0:
            return
        part = rows["pid"].iloc[0]
        rows = rows.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        # first-fit-decreasing over open bins
        bins: list[dict] = []  # {"fill": int, "members": [(doc_id, n)]}
        for doc_id, n in zip(rows["doc_id"], rows["n_tokens"]):
            n = int(n)
            placed = False
            for b in bins:
                if b["fill"] + n <= budget:
                    b["members"].append((int(doc_id), n))
                    b["fill"] += n
                    placed = True
                    break
            if not placed:
                bins.append({"fill": n, "members": [(int(doc_id), n)]})
        out = []
        for seq, b in enumerate(bins):
            fill = 0
            for doc_id, n in b["members"]:
                fill += n
                out.append((f"{part}-{seq}", doc_id, n, fill))
        yield _pd.DataFrame(out, columns=["pack_id", "doc_id", "n_tokens", "pack_fill"])

    sized = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
        F.spark_partition_id().alias("pid"),
    ).filter((F.col("n_tokens") <= budget) & (F.trim(F.col(text_col)) != ""))
    return sized.mapInPandas(pack_partition, PACKED_SCHEMA)
