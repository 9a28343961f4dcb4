#!/usr/bin/env python
"""Optimization-round instrumentation (guide §1): per-query isolation
with the noop sink, ``.explain("formatted")`` capture, and optional
cold-JVM single-shot timing. Separate from the FROZEN ``bench.py`` —
numbers from here are cited in OPTIMIZATION_r06.md, never printed in
the driver's headline format.

Usage:
  python bench_extra.py --tag before                 # all bench queries
  python bench_extra.py --tag before -q video_stats  # one query
  python bench_extra.py --tag after -q video_stats --reps 3
  python bench_extra.py --cold -q video_stats        # fresh-JVM 1-shot

Writes plans to plans/r06/<query>_<tag>.txt and prints one JSON line
with the timings (not the driver's metric name).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single source of truth: the frozen headline bench's own constants,
# so a catalog rename can never desynchronize the evidence set
from bench import BENCH_QUERIES, CPUS, SF_DIR  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", choices=["count", "noop"], default="count",
                    help="count matches bench.py's action; noop computes "
                    "every column (guide §1.4)")
    ap.add_argument("--cold", action="store_true",
                    help="single rep, no warmup rep discarded (run this in "
                    "a fresh process for a true cold-JVM number)")
    args = ap.parse_args()

    from scalpel_spark.queries import QUERIES
    from scalpel_spark.spark.session import get_spark
    from scalpel_spark.spark.util import release_candidate_cache

    # mirror bench.py's session exactly (AQE off for the catalog)
    if os.environ.get("SPARK_GRAFT_AQE") is None:
        os.environ["SPARK_GRAFT_AQE"] = "0"
    spark = get_spark(app="scalpel_spark_bench_extra",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    if not args.cold:
        spark.range(1000).selectExpr("sum(id)").collect()

    names = args.queries or BENCH_QUERIES
    reps = 1 if args.cold else args.reps
    out: dict = {}
    for name in names:
        fn = QUERIES[name]
        if args.tag and not args.cold:
            # plan capture runs the full Catalyst pipeline (and any
            # eager probes in the query builder) — incompatible with a
            # cold-start measurement; --cold therefore skips it
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            release_candidate_cache()
        q_reps = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            q_reps.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_candidate_cache()
        out[name] = {"min": min(q_reps), "reps": q_reps}
    print(json.dumps({"bench_extra": out, "sf": SF_DIR, "cpus": CPUS,
                      "mode": args.mode, "cold": args.cold}))


if __name__ == "__main__":
    main()
