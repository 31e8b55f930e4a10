#!/usr/bin/env python3
"""Capture .explain("formatted") + job/stage counts for bench queries.

Writes plans/<tag>/<query>_<suffix>.txt for every requested bench query
and prints a compact JSON summary (jobs, stages, exchanges, plan length)
so optimization work can verify "fewer exchanges / fewer jobs" claims.

Usage:
    python tools/plan_capture.py --tag r10 --suffix before [query ...]

Runs each query once through the noop sink inside a job group, then asks
the status tracker how many jobs that took.  Plan text is captured via
explain("formatted").  Side-effecting builders (the merge_* family) do
their table setup during fn() — that work is attributed to the same
group, mirroring what bench.py times.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_to_mongo_export_spark import queries as registry  # noqa: E402
from hbase_to_mongo_export_spark.operators import _cache as op_cache  # noqa: E402
from hbase_to_mongo_export_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench

    names = args.queries or [q for q in bench.BENCH_QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    summary = {}
    for name in names:
        fn = qmap[name]
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            df.write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup(None, None)
        op_cache.release_all()
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        n_stages = 0
        for j in jobs:
            ji = sc.statusTracker().getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        exchanges = len(re.findall(r"\bExchange\b", plan))
        with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(plan)
        summary[name] = {
            "jobs": len(jobs),
            "stages": n_stages,
            "plan_exchanges": exchanges,
            "plan_chars": len(plan),
        }
        print(json.dumps({name: summary[name]}), flush=True)

    print(json.dumps({"summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
