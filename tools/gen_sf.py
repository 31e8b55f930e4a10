#!/usr/bin/env python3
"""Deterministic Spark-native generator for the driver's synthetic
star schema at ARBITRARY scale factor — used for the sf1 scale-curve
sweep (SCALE_EVIDENCE §4): the driver ships sf0.001/0.01/0.1 only, and
the 100× question needs a point an order of magnitude up.

Faithful to the driver tables' shapes (measured from
/root/testdata/sf0.1): same schemas, key ranges (customer 150k·sf,
orders 1.5M·sf with ~4.07 lineitems each, part 200k·sf over the same
8×8 adjective-noun name vocabulary, 25 nations / 5 regions verbatim),
same value ranges (acctbal −1000..10000, totalprice 1k..500k, dates
1995-01-01..2001-08-01, qty 1..50, discount 0..0.10, tax 0..0.08) and
the same categorical vocabularies (order status/priority, returnflag ×
linestatus, market segments, event types, en-heavy language mix,
src0..19). Exact distributional identity is NOT claimed — the sweep
therefore generates BOTH its sf0.1 and sf1 points with THIS generator,
so per-query scaling exponents compare like with like, and the
generated-sf0.1 timings are cross-checked against the driver-sf0.1
bench to show the generator is representative.

Every column derives from xxhash64(id, salt) — fully distributed
column expressions, no driver-side loops, no RNG state: the output is
identical for a given (sf, seed) regardless of partitioning.

KNOWN DIVERGENCE (round-9 verdict nit #3): embeddings scale LINEARLY
here (20k·sf → 200 rows at sf0.01) while the DRIVER's embeddings table
has a 500-row floor at small sfs. Harmless for the like-with-like
sweep (both points generated), but do NOT compare generated-sf≤0.025
embedding-query timings or row counts against driver fixtures.

Usage: python tools/gen_sf.py SF OUTDIR [--seed 42] [--partitions N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENT = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITY = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUS = ["O", "P", "F"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_WORDS = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "query", "agg", "table", "hash", "vector",
    "join", "merge", "group", "filter", "shuffle", "read", "write", "plan",
    "key", "row", "file", "page", "block", "index", "cache",
]
ORDERDATE_DAYS = 2405  # 1995-01-01 .. 2001-08-01 INCLUSIVE (2405 offsets)
EMB_DIM = 64


def _u(id_col: Column, salt: int, seed: int) -> Column:
    """Deterministic uniform [0,1) from (id, salt, seed)."""
    return (
        F.pmod(F.xxhash64(id_col, F.lit(salt), F.lit(seed)), F.lit(1_000_000))
        / 1_000_000.0
    )


def _pick(options: list[str], id_col: Column, salt: int, seed: int) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(
        arr,
        (
            F.pmod(
                F.xxhash64(id_col, F.lit(salt), F.lit(seed)), F.lit(len(options))
            )
            + 1
        ).cast("int"),
    )


def _round2(c: Column) -> Column:
    return F.round(c, 2)


def generate(spark: SparkSession, sf: float, out: str, seed: int = 42,
             partitions: int | None = None) -> None:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    parts = partitions or max(8, int(32 * sf))

    def rng(n: int, id_name: str) -> DataFrame:
        return spark.range(0, n, 1, parts).withColumnRenamed("id", id_name)

    os.makedirs(out, exist_ok=True)

    # region / nation: tiny dims, verbatim shape
    spark.createDataFrame(
        [(i, f"REGION_{i}") for i in range(5)], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "region.parquet"))
    spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "nation.parquet"))

    c = rng(n_cust, "c_custkey")
    (
        c.select(
            "c_custkey",
            F.format_string("Customer#%09d", F.col("c_custkey")).alias("c_name"),
            F.pmod(F.xxhash64("c_custkey", F.lit(1), F.lit(seed)), F.lit(25))
            .cast("int")
            .alias("c_nationkey"),
            _round2(_u(F.col("c_custkey"), 2, seed) * 11_000 - 1_000).alias(
                "c_acctbal"
            ),
            _pick(SEGMENT, F.col("c_custkey"), 3, seed).alias("c_mktsegment"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "customer.parquet"))
    )

    s = rng(n_supp, "s_suppkey")
    (
        s.select(
            "s_suppkey",
            F.format_string("Supplier#%09d", F.col("s_suppkey")).alias("s_name"),
            F.pmod(F.xxhash64("s_suppkey", F.lit(4), F.lit(seed)), F.lit(25))
            .cast("int")
            .alias("s_nationkey"),
            _round2(_u(F.col("s_suppkey"), 5, seed) * 11_000 - 1_000).alias(
                "s_acctbal"
            ),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "supplier.parquet"))
    )

    p = rng(n_part, "p_partkey")
    (
        p.select(
            "p_partkey",
            F.concat_ws(
                " ",
                _pick(ADJ, F.col("p_partkey"), 6, seed),
                _pick(NOUN, F.col("p_partkey"), 7, seed),
            ).alias("p_name"),
            F.concat(
                F.lit("Brand#"),
                (
                    F.pmod(
                        F.xxhash64("p_partkey", F.lit(8), F.lit(seed)), F.lit(25)
                    )
                    + 1
                ).cast("string"),
            ).alias("p_brand"),
            _pick(PTYPE, F.col("p_partkey"), 9, seed).alias("p_type"),
            (
                F.pmod(F.xxhash64("p_partkey", F.lit(10), F.lit(seed)), F.lit(50))
                + 1
            )
            .cast("int")
            .alias("p_size"),
            _round2(F.lit(900.0) + _u(F.col("p_partkey"), 11, seed) * 100).alias(
                "p_retailprice"
            ),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "part.parquet"))
    )

    o = rng(n_orders, "o_orderkey").select(
        "o_orderkey",
        F.pmod(F.xxhash64("o_orderkey", F.lit(12), F.lit(seed)), F.lit(n_cust))
        .alias("o_custkey"),
        _pick(STATUS, F.col("o_orderkey"), 13, seed).alias("o_orderstatus"),
        _round2(F.lit(1_000.0) + _u(F.col("o_orderkey"), 14, seed) * 499_000)
        .alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-01 00:00:00"))
            + (
                F.pmod(
                    F.xxhash64("o_orderkey", F.lit(15), F.lit(seed)),
                    F.lit(ORDERDATE_DAYS),
                )
            )
            * 86_400
        ).alias("o_orderdate"),
        _pick(PRIORITY, F.col("o_orderkey"), 16, seed).alias("o_orderpriority"),
    )
    o.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    orders = spark.read.parquet(os.path.join(out, "orders.parquet"))

    # lineitem: 1..7 lines per order (mean ~4, matching the driver's
    # ~4.07), exploded via sequence() — stays fully distributed
    n_lines = (
        F.lit(1)
        + F.floor(_u(F.col("o_orderkey"), 17, seed) * 3)
        + F.floor(_u(F.col("o_orderkey"), 18, seed) * 3)
        + F.floor(_u(F.col("o_orderkey"), 19, seed) * 3)
    ).cast("int")
    li = (
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            "o_orderdate",
            F.explode(F.sequence(F.lit(1), n_lines)).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber", F.lit(20), F.lit(seed)),
                F.lit(n_part),
            ).alias("l_partkey"),
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber", F.lit(21), F.lit(seed)),
                F.lit(n_supp),
            ).alias("l_suppkey"),
            "l_linenumber",
            (
                F.pmod(
                    F.xxhash64(
                        "l_orderkey", "l_linenumber", F.lit(22), F.lit(seed)
                    ),
                    F.lit(50),
                )
                + 1
            )
            .cast("double")
            .alias("l_quantity"),
            _round2(
                F.lit(900.0)
                + F.pmod(
                    F.xxhash64(
                        "l_orderkey", "l_linenumber", F.lit(23), F.lit(seed)
                    ),
                    F.lit(1_000_000),
                )
                / 1_000_000.0
                * 104_100
            ).alias("l_extendedprice"),
            (
                F.pmod(
                    F.xxhash64(
                        "l_orderkey", "l_linenumber", F.lit(24), F.lit(seed)
                    ),
                    F.lit(11),
                )
                / 100.0
            ).alias("l_discount"),
            (
                F.pmod(
                    F.xxhash64(
                        "l_orderkey", "l_linenumber", F.lit(25), F.lit(seed)
                    ),
                    F.lit(9),
                )
                / 100.0
            ).alias("l_tax"),
            _pick(["A", "N", "R"], F.col("l_orderkey") * 8 + F.col("l_linenumber"), 26, seed).alias(
                "l_returnflag"
            ),
            _pick(["F", "O"], F.col("l_orderkey") * 8 + F.col("l_linenumber"), 27, seed).alias(
                "l_linestatus"
            ),
            F.timestamp_seconds(
                F.unix_timestamp("o_orderdate")
                + (
                    F.pmod(
                        F.xxhash64(
                            "l_orderkey", "l_linenumber", F.lit(28), F.lit(seed)
                        ),
                        F.lit(95),
                    )
                    + 1
                )
                * 86_400
            ).alias("l_shipdate"),
        )
    )
    li.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))

    n_users = max(1, int(15_000 * sf))
    e = rng(n_events, "event_id")
    (
        e.select(
            "event_id",
            F.timestamp_micros(
                F.unix_timestamp(F.lit("2024-01-01 00:00:00")).cast("long")
                * 1_000_000
                + F.pmod(
                    F.xxhash64("event_id", F.lit(29), F.lit(seed)),
                    F.lit(30 * 86_400 * 1_000_000),
                )
            ).alias("ts"),
            F.pmod(F.xxhash64("event_id", F.lit(30), F.lit(seed)), F.lit(n_users))
            .alias("user_id"),
            _pick(EVENT_TYPES, F.col("event_id"), 31, seed).alias("event_type"),
            # exponential(mean 50): matches the driver's mean 49.9 /
            # median 34.8 / max ~560 shape
            _round2(
                -F.log(
                    F.lit(1.0)
                    - F.pmod(
                        F.xxhash64("event_id", F.lit(32), F.lit(seed)),
                        F.lit(999_999),
                    )
                    / 1_000_000.0
                )
                * 50.0
            ).alias("value"),
            F.format_string(
                '{"k": %d}',
                F.pmod(F.xxhash64("event_id", F.lit(33), F.lit(seed)), F.lit(100)),
            ).alias("props"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )

    d = rng(n_docs, "doc_id")
    vocab = F.array(*[F.lit(w) for w in DOC_WORDS])
    nw = (
        F.lit(8) + F.floor(_u(F.col("doc_id"), 34, seed) * 92)
    ).cast("int")
    lang_u = _u(F.col("doc_id"), 35, seed)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda i: F.element_at(
                vocab,
                (
                    F.pmod(
                        F.xxhash64(F.col("doc_id"), i, F.lit(36), F.lit(seed)),
                        F.lit(len(DOC_WORDS)),
                    )
                    + 1
                ).cast("int"),
            ),
        ),
        " ",
    )
    (
        d.select(
            "doc_id",
            text.alias("text"),
            F.when(lang_u < 0.4, "en")
            .when(lang_u < 0.55, "zh")
            .when(lang_u < 0.70, "es")
            .when(lang_u < 0.85, "fr")
            .otherwise("de")
            .alias("lang"),
            F.concat(
                F.lit("src"),
                F.pmod(
                    F.xxhash64("doc_id", F.lit(37), F.lit(seed)), F.lit(20)
                ).cast("string"),
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )

    v = rng(n_emb, "vec_id")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(EMB_DIM)),
        lambda i: (
            (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), i, F.lit(38), F.lit(seed)),
                    F.lit(1_000_000),
                )
                / 1_000_000.0
                - 0.5
            )
            * 0.8
        ).cast("float"),
    )
    (
        v.select(
            "vec_id",
            emb.alias("embedding"),
            F.pmod(F.xxhash64("vec_id", F.lit(39), F.lit(seed)), F.lit(10))
            .cast("int")
            .alias("label"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()
    from hbase_to_mongo_export_spark.session import get_spark

    spark = get_spark("gen_sf")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, args.sf, args.out, args.seed, args.partitions)
    # flat-file layout parity: the driver ships single .parquet FILES,
    # our writer makes DIRECTORIES — both read identically via
    # spark.read.parquet / read_parquet glob, so no rename needed
    print(f"generated sf={args.sf} at {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
