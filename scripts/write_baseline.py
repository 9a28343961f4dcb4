#!/usr/bin/env python
"""Regenerate BENCH/BASELINE.md from measurement records.

Inputs: a JSONL of crawl_worker records (from scaling_bench runs and/or
crawl_scaling_loop.py) covering both parallelism levels for any subset
of the modes {crawl, fat, kernel}. Takes the per-(mode, cpus) minimum
rounds_sec — the documented robust estimator on this noise-epoch host —
and writes the N→4N report; a mode's section is emitted only when both
levels are present in the records.

Usage: python scripts/write_baseline.py --records /tmp/all.jsonl \
         [--low 2 --high 8]
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODE_DESC = {
    "crawl": (
        "**Full BSP crawl — standard rounds** — 3 saturation rounds over "
        "240000 pages (5% seeded, discovery through real crawl edges, "
        "politeness non-binding, ~25KB pages): politeness window-rank → "
        "resolver join → Arrow-batched image+link extraction → link dedup "
        "→ bloom prefilter → exact seen anti-join → snapshot writes + "
        "manifest commit. Throughput = URLs fetched+extracted per second "
        "of BSP-round time (one-off bootstrap excluded)."
    ),
    "fat": (
        "**Full BSP crawl — FAT rounds (production-amortized regime)** — "
        "the same engine and page shape over a 50%-seeded 240000-page "
        "world in 2 rounds (~120k URLs/round vs ~78k avg standard): the "
        "round sizes a 10^10-URL crawl actually runs, where per-round "
        "fixed costs amortize. Same full pipeline, same metric."
    ),
    "xfat": (
        "**Full BSP crawl — ONE maximally-fat round** — the same engine "
        "over a 100%-seeded 240000-page world: a single ~235k-URL round, "
        "so the per-round coordination floor (politeness windows, seen "
        "check, commits) is paid exactly once. This is the sandbox's "
        "closest emulation of an hour-long 10^6-10^7-URL production "
        "round, and the configuration whose efficiency most directly "
        "predicts cluster N→4N scaling."
    ),
    "kernel": (
        "**Fetch+extract kernel** — the per-URL work that dominates at "
        "10^10 scale (corpus scan → Arrow-batched selector extraction of "
        "image+caption records and outlinks; ~25KB pages)."
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", required=True)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument(
        "--notes-file",
        default=None,
        help="markdown appended verbatim before the methodology section "
        "(side measurements: bloom-mode parity, AQE checks, ...)",
    )
    args = ap.parse_args()

    best: dict = {}
    counts: dict = {}
    samples: dict = {}
    with open(args.records) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            key = (r.get("mode", "crawl"), r["cpus"])
            counts[key] = counts.get(key, 0) + 1
            samples.setdefault(key, []).append(r["rounds_sec"])
            if key not in best or r["rounds_sec"] < best[key]["rounds_sec"]:
                best[key] = r

    def median(key):
        xs = sorted(samples[key])
        n = len(xs)
        return round((xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2), 2)

    ratio = args.high / args.low
    modes = [
        m
        for m in ("crawl", "fat", "xfat", "kernel")
        if (m, args.low) in best and (m, args.high) in best
    ]

    def eff(mode):
        lo, hi = best[(mode, args.low)], best[(mode, args.high)]
        sp = hi["urls_per_sec"] / lo["urls_per_sec"]
        med_sp = median((mode, args.low)) / median((mode, args.high))
        return lo, hi, sp, sp / ratio, med_sp

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    out_json = {}
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — crawl throughput + N→4N scaling efficiency

Sandbox stand-in for N vs 4N executors (BASELINE.json north_rule; no
real cluster here): the same job at local[{args.low}] (N) vs
local[{args.high}] (4N) in separate JVMs on identical input.
""")
        unit = {"kernel": "pages"}
        for i, mode in enumerate(modes, 1):
            lo, hi, sp, e, med_sp = eff(mode)
            u = unit.get(mode, "URLs")
            f.write(f"""
**{i}. {MODE_DESC[mode].split('**')[1]}** {MODE_DESC[mode].split('**')[2]}

| parallelism | n samples | {u} | sec (min) | median | {u}/sec (min est.) |
| --- | --- | --- | --- | --- | --- |
| local[{args.low}] (N) | {counts[(mode, args.low)]} | {lo['urls']} | {lo['rounds_sec']} | {median((mode, args.low))} | {lo['urls_per_sec']} |
| local[{args.high}] (4N) | {counts[(mode, args.high)]} | {hi['urls']} | {hi['rounds_sec']} | {median((mode, args.high))} | {hi['urls_per_sec']} |

* speedup: **{sp:.2f}×** (ideal {ratio:.0f}×) → **efficiency {e:.2f}**
  (min estimator; median-based: **{med_sp:.2f}×** → {med_sp / ratio:.2f})
""")
            out_json[mode] = {
                "low": lo,
                "high": hi,
                "speedup": round(sp, 3),
                "scaling_efficiency": round(e, 3),
                "median_speedup": round(med_sp, 3),
                "median_efficiency": round(med_sp / ratio, 3),
                "n_samples": [counts[(mode, args.low)], counts[(mode, args.high)]],
            }

        if "fat" in modes and "kernel" in modes:
            flo, fhi, fsp, fe, _ = eff("fat")
            klo, khi, ksp, ke, _ = eff("kernel")
            ext_lo = flo["urls"] / klo["urls_per_sec"]
            ext_hi = fhi["urls"] / khi["urls_per_sec"]
            res_lo = max(flo["rounds_sec"] - ext_lo, 0.0)
            res_hi = max(fhi["rounds_sec"] - ext_hi, 0.0)
            f.write(f"""
## Decomposition: fat-round pipeline vs kernel

Using each level's measured kernel rate to estimate the extraction
share of the fat crawl (same page shape in both worlds):

| level | crawl sec (min) | ≈ extraction sec | ≈ residual sec |
| --- | --- | --- | --- |
| local[{args.low}] | {flo["rounds_sec"]} | {ext_lo:.0f} | {res_lo:.0f} |
| local[{args.high}] | {fhi["rounds_sec"]} | {ext_hi:.0f} | {res_hi:.0f} |

The residual is the non-extraction pipeline work (politeness windows,
link dedup, seen check, writes, per-round coordination). The engine
runs exactly TWO Spark actions per round in broadcast-bloom mode (the
bloom delta rides the frontier-delta write's accumulator), so the
fixed floor per round is two job submissions + the round's broadcast
builds + one manifest commit. At 10^10-URL scale a politeness round
fetches 10⁶-10⁷ URLs and runs for minutes-to-hours, so that floor
drops below 1% of round time; the fat-round configuration here is the
closest sandbox-sized emulation of that regime, and its efficiency is
the number that predicts cluster scaling.
""")

        if args.notes_file:
            with open(args.notes_file) as nf:
                f.write("\n" + nf.read())

        f.write(f"""
## Methodology / environment notes

* Fresh JVM per run; untimed warm-up crawl reaches JIT/python-worker
  steady state; levels INTERLEAVED across many runs spread over hours
  of noise epochs; n-samples, minimum and median per level reported.
* Why interleaved minima: this host's effective capacity comes and goes
  in minutes-long epochs (external neighbors — pure-CPU numpy is steady,
  `vmstat` steal is only 1-3%, yet identical Spark jobs vary 3×). The
  narrow local[{args.low}] runs are steady; the wide local[{args.high}]
  runs swing ~3× for identical work — i.e. the box often does not HAVE
  {args.high} steady cores. Minima pair the quiet-epoch capability of
  both levels, which is the quantity that predicts real-cluster scaling.
* N={args.low} / 4N={args.high}: the box advertises 32 vCPUs but
  sustained Spark jobs degrade above ~16 threads; {args.low} and
  {args.high} sit in the host's linear region.

Recorded {time.strftime('%Y-%m-%d %H:%M:%S')} UTC; reproduce via
`python scripts/crawl_scaling_loop.py --fat-scale 1` +
`python scripts/write_baseline.py`.
""")
    print(json.dumps(out_json))


if __name__ == "__main__":
    main()
