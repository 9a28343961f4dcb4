#!/usr/bin/env python
"""Long-horizon crawl scaling measurement: alternate local[high]/local[low]
crawl workers for a wall-clock budget, appending one JSON line per run to
``--out``. The host's capacity comes and goes in minutes-long epochs
(narrow runs are steady ±2%, wide runs swing 3×), so the honest estimate
of ENGINE scaling needs minima taken across many interleaved epochs.

Usage: python scripts/crawl_scaling_loop.py --minutes 60 --out /tmp/loop.jsonl
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
    ap.add_argument("--minutes", type=float, default=60)
    ap.add_argument("--out", required=True)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--world", default=os.path.join(REPO, "data", "scaling_world_120000_w8"))
    ap.add_argument("--warmup", default=os.path.join(REPO, "data", "warmup_world"))
    args = ap.parse_args()

    deadline = time.time() + args.minutes * 60
    i = 0
    while time.time() < deadline:
        # high level first: it is the noise-sensitive one, give it more samples
        for cpus in (args.high, args.low, args.high):
            if time.time() > deadline:
                break
            cmd = [
                sys.executable, os.path.join(REPO, "scripts", "crawl_worker.py"),
                "--cpus", str(cpus), "--world", args.world,
                "--rounds", str(args.rounds), "--warmup-world", args.warmup,
                "--attempts", "2",
            ]
            r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            if r.returncode == 0:
                line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
                rec = json.loads(line)
                rec["iter"] = i
                rec["t"] = round(time.time())
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(rec, file=sys.stderr, flush=True)
        i += 1


if __name__ == "__main__":
    main()
