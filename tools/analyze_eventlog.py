#!/usr/bin/env python3
"""Aggregate a Spark JSON event log (SPARK_GRAFT_EVENTLOG=<dir>) into
per-query (job-description) and per-stage wall-time breakdowns.

Usage:
    python3 tools/analyze_eventlog.py <eventlog-file> [--stages] [--desc SUBSTR]

The graft Bench/RunOne mains label every job with the query name (guide
s1.5), so grouping jobs by description attributes the run's wall time to
queries, and the gap between consecutive jobs shows driver-side time
(planning, codegen, collect) that no stage accounts for.
"""
import io
import json
import os
import subprocess
import sys
from collections import defaultdict


def open_log(path):
    """Open a plain or .zstd event-log file as text."""
    if path.endswith(".zstd"):
        p = subprocess.Popen(["zstd", "-dc", path], stdout=subprocess.PIPE)
        return io.TextIOWrapper(p.stdout, encoding="utf-8")
    return open(path)


def log_files(path):
    """A file, or a rolling eventlog_v2 directory of events_N files."""
    if os.path.isdir(path):
        names = sorted(
            (n for n in os.listdir(path) if n.startswith("events_")),
            key=lambda n: int(n.split("_")[1]))
        return [os.path.join(path, n) for n in names]
    return [path]


def main() -> None:
    path = sys.argv[1]
    want_stages = "--stages" in sys.argv
    desc_filter = None
    if "--desc" in sys.argv:
        desc_filter = sys.argv[sys.argv.index("--desc") + 1]

    jobs = {}           # job id -> dict
    stage_to_job = {}
    stages = {}         # stage id -> dict
    for fpath in log_files(path):
      with open_log(fpath) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", "")
                jobs[jid] = {"desc": desc, "t0": e["Submission Time"],
                             "t1": None}
                for sid in e.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "ms": (t1 - t0) if (t0 and t1) else 0,
                    "tasks": si.get("Number of Tasks", 0),
                }

    by_desc = defaultdict(lambda: {"ms": 0, "jobs": 0, "gap_ms": 0})
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["t1"] is None:
            continue
        d = j["desc"] or "<none>"
        by_desc[d]["ms"] += j["t1"] - j["t0"]
        by_desc[d]["jobs"] += 1
        if prev_end is not None and j["t0"] > prev_end:
            by_desc[d]["gap_ms"] += j["t0"] - prev_end
        prev_end = j["t1"] if prev_end is None else max(prev_end, j["t1"])

    print(f"{'desc':60s} {'jobs':>5s} {'job_ms':>9s} {'gap_ms':>9s}")
    for d, v in sorted(by_desc.items(), key=lambda kv: -kv[1]["ms"]):
        if desc_filter and desc_filter not in d:
            continue
        print(f"{d[:60]:60s} {v['jobs']:5d} {v['ms']:9d} {v['gap_ms']:9d}")

    if want_stages:
        print()
        print(f"{'stage':>6s} {'job':>4s} {'desc':40s} {'ms':>8s} "
              f"{'tasks':>6s}  name")
        for sid in sorted(stages):
            s = stages[sid]
            jid = stage_to_job.get(sid)
            d = jobs.get(jid, {}).get("desc", "") if jid is not None else ""
            if desc_filter and desc_filter not in d:
                continue
            print(f"{sid:6d} {jid if jid is not None else -1:4d} "
                  f"{d[:40]:40s} {s['ms']:8d} {s['tasks']:6d}  "
                  f"{s['name'][:60]}")


if __name__ == "__main__":
    main()
