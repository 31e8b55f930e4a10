"""Deduplication operators for training-data pipelines.

All variants are pure DataFrame compositions (JVM-side, no Python UDFs):

- exact_dedup            — content fingerprint → keep canonical doc per group
- ngram_jaccard_pairs    — blocked pairwise word-set Jaccard (exact, for
                           verification and small blocks)
- minhash_lsh_pairs      — MinHash signatures + banded LSH self-join: the
                           100 TB-scale near-dup path. Candidate generation
                           shuffles on (band, bucket-hash) only; each
                           candidate pair is then verified with exact
                           Jaccard. No O(n²) stage anywhere.
- simhash                — 64-bit SimHash per document via per-token hash
                           bit votes; near-dups = signatures within a small
                           Hamming distance (pairs via band blocking).

Scale notes: LSH band width / row count trade recall vs candidate count;
defaults (16 bands × 4 rows = 64 hashes) target Jaccard ≳ 0.5. Hot buckets
(boilerplate shingles) are the classic skew source — candidates are
deduplicated before verification and AQE skew-join handles bucket skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, keep: str = "min"
) -> DataFrame:
    """One canonical row id per distinct normalized content; adds
    ``dup_count``. Single hash-aggregate shuffle on the fingerprint."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text (empty-safe)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    k = F.size(words) - (n - 1)
    sh = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    return F.array_distinct(sh)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over word n-grams within a blocking key.

    Without ``block_col`` this is O(n²) per partition-able block — use only
    on small inputs or as the verify stage after LSH; with a selective
    block column it is a plain equi-join."""
    base = df.select(
        F.col(id_col),
        word_shingles(F.col(text_col), n).alias("sh"),
        *( [F.col(block_col)] if block_col else [F.lit(1).alias("__block")] ),
    )
    block = block_col or "__block"
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block}") == F.col(f"b.{block}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    out = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= threshold)


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """Array of ``num_hashes`` MinHash values. Hash family: xxhash64 of the
    shingle string salted with the hash index — deterministic, JVM-side.
    Empty shingle sets get Long.MaxValue sentinels (no false merges)."""
    sentinel = F.lit(2**63 - 1).cast("long")
    mins = [
        F.coalesce(
            F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(F.concat(F.lit(f"{i}|"), s)))
            ),
            sentinel,
        )
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    Jaccard. Returns (id_a, id_b, jaccard >= threshold).

    Plan shape: narrow shingle/signature projection → explode to one row
    per band (×bands) → shuffle on (band, band_hash) self-join → distinct
    candidate pairs → one more join back to shingles → exact verify."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    base = df.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    banded = base.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    sh = base.select(F.col(id_col), F.col("sh"))
    verified = (
        candidates.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, each bit votes
    +1/-1 weighted by token frequency; signature bit b = sign of the vote.

    Implemented as explode → groupBy(doc) with ``bits`` conditional sums —
    one shuffle, all JVM-side."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
        ).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs whose SimHash Hamming distance <= max_hamming.
    Blocking: split the 64-bit signature into ``bands`` chunks — any pair
    within distance (bands-1) shares at least one exact chunk (pigeonhole),
    so candidates come from equi-joins on (chunk index, chunk value)."""
    sigs = simhash(df, id_col, text_col)
    chunk_bits = 64 // bands
    chunked = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("cv"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.ci", "c.cv")
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
