#!/usr/bin/env python
"""Attribute crawl wall-clock to Spark jobs/stages + driver gaps from an
event log (written via ``crawl_worker.py --event-log DIR``).

Prints, in time order: every job (wall, stage count, total task-time,
max single-task time, first-stage name) and every DRIVER GAP between
consecutive jobs ≥ --gap-min seconds. Driver gaps are where the
parallelism-insensitive per-round floor lives (broadcast hash-table
builds, commit bookkeeping, planning) — jobs scale with cores, gaps
don't.

Usage: python scripts/stage_attrib.py /tmp/evlog/<app-id> [--gap-min 0.3]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--gap-min", type=float, default=0.3)
    args = ap.parse_args()

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(args.log) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:80],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st["name"] = si["Stage Name"]
                st["wall"] = (
                    si.get("Completion Time", 0) - si.get("Submission Time", 0)
                ) / 1000.0
                st["tasks"] = si["Number of Tasks"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {})
                st["task_sec"] = st.get("task_sec", 0.0) + m.get(
                    "Executor Run Time", 0
                ) / 1000.0
                st["max_task"] = max(
                    st.get("max_task", 0.0), m.get("Executor Run Time", 0) / 1000.0
                )

    order = sorted((j for j in jobs.values() if "end" in j), key=lambda j: j["start"])
    prev_end = None
    t0 = order[0]["start"] if order else 0
    for j in order:
        if prev_end is not None:
            gap = (j["start"] - prev_end) / 1000.0
            if gap >= args.gap_min:
                print(f"  t={(prev_end - t0)/1000.0:8.2f}  DRIVER GAP {gap:6.2f}s")
        wall = (j["end"] - j["start"]) / 1000.0
        task_sec = sum(stages.get(s, {}).get("task_sec", 0.0) for s in j["stages"])
        max_task = max(
            (stages.get(s, {}).get("max_task", 0.0) for s in j["stages"]), default=0.0
        )
        names = [
            stages[s].get("name", "") for s in j["stages"] if s in stages and stages[s].get("name")
        ]
        name = names[0].split("(")[0].strip() if names else "?"
        print(
            f"  t={(j['start'] - t0)/1000.0:8.2f}  job {wall:7.2f}s"
            f"  stages={len(j['stages'])}  task-sec={task_sec:8.1f}"
            f"  max-task={max_task:6.2f}  {name}  | {j['desc']}"
        )
        if wall > 5.0:
            for s in j["stages"]:
                st = stages.get(s)
                if not st or "wall" not in st:
                    continue
                print(
                    f"      stage {s:4d} wall={st['wall']:7.2f}s tasks={st.get('tasks', 0):4d}"
                    f" task-sec={st.get('task_sec', 0.0):8.1f}"
                    f" max-task={st.get('max_task', 0.0):6.2f}"
                    f"  {st.get('name', '')[:70]}"
                )
        prev_end = j["end"]


if __name__ == "__main__":
    main()
