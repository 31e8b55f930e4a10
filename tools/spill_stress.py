"""Spill-stress evidence run: MinHash-LSH near-dup dedup at a scaled-up
document count under a deliberately small heap.

The 100 TB posture claims in operators/dedup.py (bucketed LSH, candidate-
only verification, map-side partial signature aggregation) are plan-shape
arguments; this script is the runtime evidence. It multiplies the sf0.1
documents table MULT× (default 200 → ~1M docs), runs the full
minhash_lsh_pairs pipeline (shingle → 64-hash signature → 16-band explode
→ bucket self-join → exact-Jaccard verify) inside a JVM capped at
--heap (default 2g), then reports per-stage shuffle and spill totals from
the Spark status REST API.

A pipeline that only works because everything fits in memory dies here;
one whose operators stream through bounded state completes with disk
spill. Run:

    python tools/spill_stress.py [--mult 200] [--heap 2g]

Prints one JSON line, e.g.
    {"docs": 1000000, "pairs": ..., "sec": ..., "shuffle_write_mb": ...,
     "mem_spill_mb": ..., "disk_spill_mb": ..., "heap": "2g"}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--heap", default="2g")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument(
        "--pipeline",
        choices=["minhash", "simhash"],
        default="minhash",
        help="which near-dup pipeline to stress",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # driver memory must be set before the JVM starts — build the session
    # directly (get_spark would also work, but be explicit about the cap)
    spark = (
        SparkSession.builder.appName("spill-stress")
        .master(f"local[{args.cpus}]")
        .config("spark.driver.memory", args.heap)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")  # REST API = the metrics source
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hbase_to_mongo_export_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    # MULT copies per doc with a REALISTIC near-dup rate (~2%): copy 0 is
    # verbatim; copies where copy % 50 == 1 are near-dups of it (one token
    # appended, Jaccard ≈ 0.95); every other copy gets 20 unique salt
    # tokens prepended, pushing it below the 0.8 threshold against
    # everything. Uniform near-cliques would make the verify join itself
    # quadratic and measure the wrong thing.
    salt = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"u{j}x"), F.col("copy").cast("string"), F.lit("d"), "doc_id")
            for j in range(20)
        ],
    )
    scaled = (
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(args.mult - 1))))
        .select(
            F.concat_ws("#", "doc_id", F.col("copy").cast("string")).alias("scaled_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .when(
                F.col("copy") % 50 == 1,
                F.concat_ws(" ", "text", F.concat(F.lit("v"), F.col("copy").cast("string"))),
            )
            .otherwise(F.concat_ws(" ", salt, "text"))
            .alias("text"),
        )
        .withColumnRenamed("scaled_id", "doc_id")
        .repartition(32)
    )
    n_docs = scaled.count()

    t0 = time.perf_counter()
    if args.pipeline == "minhash":
        pairs = minhash_lsh_pairs(scaled, "doc_id", "text", threshold=0.8)
    else:
        pairs = simhash_pairs(scaled, "doc_id", "text", max_hamming=3)
    n_pairs = pairs.count()
    sec = round(time.perf_counter() - t0, 1)

    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{app_id}/stages"
        )
    )
    mb = lambda b: round(b / 1e6, 1)  # noqa: E731
    out = {
        "pipeline": args.pipeline,
        "docs": n_docs,
        "pairs": n_pairs,
        "sec": sec,
        "heap": args.heap,
        "mult": args.mult,
        "shuffle_write_mb": mb(sum(s.get("shuffleWriteBytes", 0) for s in stages)),
        "mem_spill_mb": mb(sum(s.get("memoryBytesSpilled", 0) for s in stages)),
        "disk_spill_mb": mb(sum(s.get("diskBytesSpilled", 0) for s in stages)),
        "n_stages": len(stages),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
