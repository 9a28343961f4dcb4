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
        "--attempts", type=int, default=1,
        help="run the measured job N times in-process, report the min "
        "(robust to this host's hypervisor-steal noise)",
    )
    ap.add_argument(
        "--mode", choices=["crawl", "kernel"], default="crawl",
        help="crawl: full BSP crawl; kernel: fetch+extract kernel only "
        "(resolver-shaped scan → Arrow extraction of images+links)",
    )
    ap.add_argument(
        "--warmup-world",
        default=None,
        help="small world crawled first (untimed) to reach JVM/JIT/python-worker steady state",
    )
    ap.add_argument(
        "--bloom-mode", choices=["broadcast", "partitioned"], default="broadcast",
        help="URL-seen bloom layout: broadcast (driver-resident shards) "
        "or partitioned (on-disk bloom table, the 10^10-URL path)",
    )
    ap.add_argument(
        "--budget-scale", type=int, default=1,
        help="multiply per-host politeness budgets: fat rounds amortize "
        "the per-round driver coordination floor (production regime)",
    )
    ap.add_argument(
        "--event-log", default=None,
        help="write Spark event logs under this dir (stage-level "
        "attribution of the per-round fixed floor; see "
        "scripts/stage_attrib.py)",
    )
    args = ap.parse_args()

    from scalpel_spark.crawl.engine import CrawlEngine
    from scalpel_spark.spark.session import get_spark

    extra = None
    if args.event_log:
        os.makedirs(args.event_log, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": args.event_log,
            # plain JSON: stage_attrib.py reads the log directly and the
            # sandbox has no zstd decompressor
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    spark = get_spark(
        app=f"crawl_scaling_{args.cpus}",
        master=f"local[{args.cpus}]",
        # 4x slots: shuffle stages get tail-balanced waves (8 partitions
        # on 8 cores = one ragged wave); AQE coalesces the small ones
        shuffle_partitions=args.shuffle_partitions or max(8, args.cpus * 4),
        extra_conf=extra,
    )
    # warm up JVM + python worker pool before timing
    spark.range(10_000).selectExpr("sum(id)").collect()
    if args.warmup_world:
        wout = tempfile.mkdtemp(prefix="crawl_warmup_")
        CrawlEngine(spark, args.warmup_world, wout, max_rounds=2).run()
        shutil.rmtree(wout, ignore_errors=True)

    if args.mode == "kernel":
        import os as _os

        from scalpel_spark import any_selector, attr, attrs, chroots, sdo, tag
        from scalpel_spark.spark.extract import extract_records

        pages = spark.read.parquet(_os.path.join(args.world, "pages.parquet")).select(
            "url", "html"
        )
        scraper = sdo(
            chroots("img", sdo(attr("src", any_selector), attr("alt", any_selector))),
            attrs("href", tag("a")),
        )
        n_pages = pages.count()

        def run_once():
            return extract_records(
                pages,
                scraper,
                "imgs array<struct<src:string,alt:string>>, links array<string>",
                carry_cols=["url"],
                explode=False,
            ).count()

        run_once()  # warm
        best = None
        for _ in range(max(args.attempts, 1)):
            t0 = time.perf_counter()
            run_once()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(
            json.dumps(
                {
                    "cpus": args.cpus,
                    "mode": "kernel",
                    "urls": n_pages,
                    "rounds_sec": round(best, 2),
                    "sec": round(best, 2),
                    "bootstrap_sec": 0.0,
                    "urls_per_sec": round(n_pages / best, 1),
                }
            )
        )
        return

    best = None
    for att in range(max(args.attempts, 1)):
        if att:
            # this host's noise comes in minutes-long epochs — spacing
            # attempts decorrelates them; back-to-back best-of-N can land
            # every sample in one bad epoch
            time.sleep(20)
        out = args.out or tempfile.mkdtemp(prefix=f"crawl_scale_{args.cpus}_")
        try:
            t0 = time.perf_counter()
            eng = CrawlEngine(
                spark, args.world, out, max_rounds=args.rounds,
                budget_scale=args.budget_scale, bloom_mode=args.bloom_mode,
            )
            summary = eng.run()
            dt = time.perf_counter() - t0
        finally:
            if args.out is None:
                shutil.rmtree(out, ignore_errors=True)
        rounds_sec = summary.get("rounds_sec") or dt
        rec = {
            "cpus": args.cpus,
            "mode": "crawl",
            "urls": summary["total_fetched"],
            "sec": round(dt, 2),
            "rounds_sec": rounds_sec,
            "bootstrap_sec": round(dt - rounds_sec, 2),
            "urls_per_sec": round(summary["total_fetched"] / rounds_sec, 1),
        }
        if best is None or rec["rounds_sec"] < best["rounds_sec"]:
            best = rec
    # throughput over the BSP rounds (steady state); one-off bootstrap
    # (seed canonicalization + initial snapshots) reported separately
    print(json.dumps(best))


if __name__ == "__main__":
    main()
