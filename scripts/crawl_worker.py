#!/usr/bin/env python
"""One crawl job at a fixed parallelism — subprocess unit of the
N-vs-4N scaling benchmark. Prints one JSON line:
``{"cpus": N, "urls": n, "sec": s, "urls_per_sec": r}``.

Usage: python scripts/crawl_worker.py --cpus 8 --world data/scaling_world
       --rounds 1 [--out /tmp/dir]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--world", required=True)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument(
        "--warmup-world",
        default=None,
        help="small world crawled first (untimed) to reach JVM/JIT/python-worker steady state",
    )
    args = ap.parse_args()

    from scalpel_spark.crawl.engine import CrawlEngine
    from scalpel_spark.spark.session import get_spark

    spark = get_spark(
        app=f"crawl_scaling_{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle_partitions or max(args.cpus, 8),
    )
    # warm up JVM + python worker pool before timing
    spark.range(10_000).selectExpr("sum(id)").collect()
    if args.warmup_world:
        wout = tempfile.mkdtemp(prefix="crawl_warmup_")
        CrawlEngine(spark, args.warmup_world, wout, max_rounds=2).run()
        shutil.rmtree(wout, ignore_errors=True)

    out = args.out or tempfile.mkdtemp(prefix=f"crawl_scale_{args.cpus}_")
    try:
        t0 = time.perf_counter()
        eng = CrawlEngine(spark, args.world, out, max_rounds=args.rounds)
        summary = eng.run()
        dt = time.perf_counter() - t0
    finally:
        if args.out is None:
            shutil.rmtree(out, ignore_errors=True)
    # throughput over the BSP rounds (steady state); one-off bootstrap
    # (seed canonicalization + initial snapshots) reported separately
    rounds_sec = summary.get("rounds_sec") or dt
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "urls": summary["total_fetched"],
                "sec": round(dt, 2),
                "rounds_sec": rounds_sec,
                "bootstrap_sec": round(dt - rounds_sec, 2),
                "urls_per_sec": round(summary["total_fetched"] / rounds_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
