#!/usr/bin/env python3
"""Scale-curve sweep (SCALE_EVIDENCE §4): run the expensive headline
queries at TWO scale factors in one session and report per-query
scaling exponents — the empirical answer to "what happens at 10×?".

exponent = log(T_hi / T_lo) / log(sf_hi / sf_lo)

≈1 means linear in data size (the ideal for scans/joins/aggs whose
parallelism grows with input), <1 means fixed overheads still dominate
at the low point (scheduler latency, per-job constants), >1 means
super-linear work (quadratic pair generation, per-round growth) — each
>1.2 case needs a named reason or a plan audit.

Both sf dirs should come from tools/gen_sf.py so the two points are
distributionally identical; the generated low point is cross-checked
against the driver-shipped sf0.1 bench elsewhere.

Usage:
  python tools/scale_sweep.py LO_DIR HI_DIR --lo-sf 0.1 --hi-sf 1 \
      [--queries q1,q2,...] [--runs 2]
Prints one JSON line: {"queries": {name: {"lo": s, "hi": s,
"exponent": e}}, ...}.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_to_mongo_export_spark import queries as registry  # noqa: E402
from hbase_to_mongo_export_spark.session import get_spark  # noqa: E402

# The scale-sensitive headline set: scans/joins/aggs, sessionization,
# dedup, similarity (brute-force AND the IVF+PQ scale path, to contrast
# the by-design-quadratic baseline with its sub-linear replacement),
# iterative graph/ML, the text pipeline, and the lakehouse merge.
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_outer_order_lineitem_counts",
    "events_sessionize",
    "latest_event_per_user",
    "chunk_dedup_20word",
    "dedup_minhash_lsh_pairs",
    "tfidf_cosine_pairs",
    "similarity_bruteforce_topk",
    "similarity_ivfpq_search",
    "pagerank_customer_supplier",
    "graph_cc_two_phase",
    "graph_kcore_decomposition",
    "embedding_power_iteration_pc1",
    "training_corpus_pipeline",
    "merge_upsert_orders",
    "bpe_train_3rounds",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lo_dir")
    ap.add_argument("hi_dir")
    ap.add_argument("--lo-sf", type=float, default=0.1)
    ap.add_argument("--hi-sf", type=float, default=1.0)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    spark = get_spark("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    qmap = registry.queries()

    from hbase_to_mongo_export_spark.operators import _cache as op_cache

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, sf_dir: str) -> list[float]:
        run(fn(spark, sf_dir))  # warm-up: codegen + file listing
        op_cache.release_all()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
            op_cache.release_all()
        return samples

    ratio = math.log(args.hi_sf / args.lo_sf)
    out: dict[str, dict] = {}
    for name in names:
        fn = qmap[name]
        lo = timed(fn, args.lo_dir)
        hi = timed(fn, args.hi_dir)
        lo_m, hi_m = statistics.median(lo), statistics.median(hi)
        out[name] = {
            "lo": lo,
            "hi": hi,
            "lo_med": round(lo_m, 3),
            "hi_med": round(hi_m, 3),
            "exponent": round(math.log(hi_m / lo_m) / ratio, 3),
        }
        print(
            f"# {name}: lo={lo_m:.2f}s hi={hi_m:.2f}s "
            f"exp={out[name]['exponent']}",
            file=sys.stderr,
            flush=True,
        )
    print(
        json.dumps(
            {
                "lo_sf": args.lo_sf,
                "hi_sf": args.hi_sf,
                "runs": args.runs,
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
