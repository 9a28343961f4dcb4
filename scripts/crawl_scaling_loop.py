#!/usr/bin/env python
"""Long-horizon scaling measurement: alternate local[high]/local[low]
workers (full BSP crawl + fetch/extract kernel) for a wall-clock budget,
appending one JSON line per run to ``--out``. The host's capacity comes
and goes in minutes-long epochs (narrow runs are steady ±2%, wide runs
swing 3×), so the honest estimate of ENGINE scaling needs minima and
medians taken across many interleaved epochs — feed the output to
``scripts/write_baseline.py``.

Usage: python scripts/crawl_scaling_loop.py --minutes 120 --out /tmp/loop.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=120)
    ap.add_argument("--out", required=True)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--attempts", type=int, default=1)
    ap.add_argument("--world", default=os.path.join(REPO, "data", "scaling_world_240000_w24"))
    ap.add_argument("--kernel-world", default=os.path.join(REPO, "data", "scaling_world_120000_w24"))
    ap.add_argument("--warmup", default=os.path.join(REPO, "data", "warmup_world"))
    ap.add_argument(
        "--fat-scale", type=int, default=0,
        help="if > 0, also sample a fat-round crawl config (politeness "
        "budgets ×scale over --fat-world, --fat-rounds rounds): same "
        "engine, round sizes in the production-amortized regime. When "
        "budgets are non-binding (discovery-limited worlds) the fat "
        "world's higher seed_fraction is what fattens round 1.",
    )
    ap.add_argument("--fat-rounds", type=int, default=2)
    ap.add_argument(
        "--fat-world",
        default=os.path.join(REPO, "data", "scaling_world_240000_w24_fat"),
    )
    ap.add_argument(
        "--xfat-world",
        default=os.path.join(REPO, "data", "scaling_world_240000_w24_xfat"),
        help="every-page-seeded world: ONE maximally-fat round (the "
        "per-round coordination floor is paid exactly once — the "
        "closest sandbox emulation of hour-long production rounds)",
    )
    ap.add_argument(
        "--modes", default="",
        help="comma-separated subset of {crawl,kernel,fat,xfat} to "
        "sample (default: crawl,kernel plus fat when --fat-scale > 0; "
        "xfat only when requested explicitly)",
    )
    args = ap.parse_args()

    # regenerate any stale (pre-codec-version-stamp) cached worlds before
    # sampling starts — never mid-loop, where it would pollute a sample
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    modes_req = set(args.modes.split(",")) if args.modes else set()
    import scaling_bench as sb

    sb.ensure_warmup_world()
    if not modes_req or "kernel" in modes_req:
        sb.ensure_heavy_world(120000)
    if not modes_req or "crawl" in modes_req:
        sb.ensure_heavy_world(240000)
    if args.fat_scale and (not modes_req or "fat" in modes_req):
        sb.ensure_fat_world(240000)
    if "xfat" in modes_req:
        sb.ensure_xfat_world(240000)

    deadline = time.time() + args.minutes * 60
    i = 0
    # high level first each cycle: it is the noise-sensitive one
    pattern = [
        ("crawl", args.high),
        ("crawl", args.low),
        ("kernel", args.high),
        ("kernel", args.low),
    ]
    if args.fat_scale:
        pattern += [("fat", args.high), ("fat", args.low)]
    if "xfat" in modes_req:
        pattern += [("xfat", args.high), ("xfat", args.low)]
    if modes_req:
        pattern = [p for p in pattern if p[0] in modes_req]
    if not pattern:
        sys.exit(
            "no modes selected — check --modes spelling (and pass "
            "--fat-scale > 0 to enable the fat config)"
        )
    while time.time() < deadline:
        for mode, cpus in pattern:
            if time.time() > deadline:
                break
            world = {
                "kernel": args.kernel_world,
                "fat": args.fat_world,
                "xfat": args.xfat_world,
            }.get(mode, args.world)
            cmd = [
                sys.executable, os.path.join(REPO, "scripts", "crawl_worker.py"),
                "--cpus", str(cpus), "--world", world,
                "--mode", "kernel" if mode == "kernel" else "crawl",
                "--attempts", str(args.attempts),
            ]
            if mode == "fat":
                cmd += ["--rounds", str(args.fat_rounds),
                        "--budget-scale", str(max(args.fat_scale, 1))]
            elif mode == "xfat":
                cmd += ["--rounds", "1"]
            else:
                cmd += ["--rounds", str(args.rounds)]
            if mode != "kernel":
                cmd += ["--warmup-world", args.warmup]
            r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            if r.returncode == 0:
                line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
                rec = json.loads(line)
                rec["mode"] = mode  # distinguish fat from standard crawl
                rec["iter"] = i
                rec["t"] = round(time.time())
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(rec, file=sys.stderr, flush=True)
            else:
                print("worker failed:", r.stderr[-300:], file=sys.stderr, flush=True)
        i += 1


if __name__ == "__main__":
    main()
