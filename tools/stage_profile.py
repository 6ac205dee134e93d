"""Summarize a Spark event log: per-stage task counts, wall span,
total task time, effective parallelism, and blocked-time breakdown.

This is the measurement tool behind the scaling analysis in SCALE.md /
BENCH.md: run any job with

    spark-submit --conf spark.eventLog.enabled=true \
                 --conf spark.eventLog.dir=/tmp/spark-events \
                 --conf spark.eventLog.compress=false ...

then

    python tools/stage_profile.py /tmp/spark-events

It reads the newest log (rolling dirs and plain files) and prints one
row per stage, widest span first:

- ntask      number of tasks (post-AQE)
- span_s     stage wall time (submission -> completion)
- tasksum_s  sum of task run times ("core-seconds")
- cpu_s      sum of executor CPU time  <- tasksum >> cpu means tasks
             are BLOCKED (lock/fork/memory-wait), not computing
- gc_s       JVM GC time attributed to tasks
- par        tasksum/span = effective parallelism
- maxtask_s  straggler indicator (compare with tasksum/ntask)

Diagnosis recipes used in this repo:
- par << cores with cpu_s ~= tasksum_s: wave quantization or too few
  tasks (raise shuffle partitions).
- par ~= cores but cpu_s << tasksum_s: threads blocked — jstack the
  JVM; on this sandbox the usual culprit was Hadoop local-FS fork+exec
  per file op (no native libhadoop) before RawLocalFileSystem was set.
- tasksum at 4N threads >> tasksum at N threads for the same job:
  SMT/memory-bandwidth inflation — a hardware ceiling, not a plan
  defect (compare with bench.py's raw-CPU calibration).
"""

from __future__ import annotations

import json
import os
import sys


def _resolve(path: str) -> str:
    """Accept an event file, a rolling-log dir, or a dir of either."""
    if os.path.isfile(path):
        return path
    entries = [os.path.join(path, e) for e in os.listdir(path)]
    newest = max(entries, key=os.path.getmtime)
    if os.path.isdir(newest):  # rolling: eventlog_v2_<app>/events_1_<app>
        inner = [os.path.join(newest, e) for e in os.listdir(newest)
                 if e.startswith("events_")]
        if not inner:
            raise SystemExit(f"no events_* file under {newest}")
        return inner[0]
    return newest


def summarize(path: str) -> list[dict]:
    stages: dict[int, dict] = {}
    tasks: dict[int, dict] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "ntask": si["Number of Tasks"],
                    "sub": si.get("Submission Time", 0),
                    "done": si.get("Completion Time", 0),
                }
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev["Task Info"]
                m = ev.get("Task Metrics") or {}
                t = tasks.setdefault(
                    sid, {"run": 0.0, "cpu": 0.0, "gc": 0.0, "mx": 0.0})
                dur = (ti["Finish Time"] - ti["Launch Time"]) / 1e3
                t["run"] += dur
                t["mx"] = max(t["mx"], dur)
                t["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                t["gc"] += m.get("JVM GC Time", 0) / 1e3
    rows = []
    for sid, s in stages.items():
        t = tasks.get(sid, {"run": 0.0, "cpu": 0.0, "gc": 0.0, "mx": 0.0})
        span = (s["done"] - s["sub"]) / 1e3
        rows.append({
            "sid": sid, "ntask": s["ntask"], "span_s": round(span, 1),
            "tasksum_s": round(t["run"], 1), "cpu_s": round(t["cpu"], 1),
            "gc_s": round(t["gc"], 1), "maxtask_s": round(t["mx"], 1),
            "par": round(t["run"] / span, 1) if span > 0.05 else None,
            "name": s["name"],
        })
    rows.sort(key=lambda r: -r["span_s"])
    return rows


def main() -> int:
    path = _resolve(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events")
    rows = summarize(path)
    hdr = f"{'sid':>4} {'ntask':>5} {'span_s':>7} {'tasksum':>8} {'cpu_s':>7} {'gc_s':>6} {'maxtask':>8} {'par':>5}  name"
    print(hdr)
    for r in rows[:25]:
        print(f"{r['sid']:>4} {r['ntask']:>5} {r['span_s']:>7} {r['tasksum_s']:>8} "
              f"{r['cpu_s']:>7} {r['gc_s']:>6} {r['maxtask_s']:>8} "
              f"{(r['par'] if r['par'] is not None else '-'):>5}  {r['name']}")
    print(f"total span {round(sum(r['span_s'] for r in rows), 1)}s, "
          f"core-seconds {round(sum(r['tasksum_s'] for r in rows), 1)} "
          f"over {len(rows)} stages")
    return 0


if __name__ == "__main__":
    sys.exit(main())
