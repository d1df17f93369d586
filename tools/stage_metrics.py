"""Aggregate per-run work volumes from a Spark event log.

Evidence for the scaling report (BENCH/BASELINE.md): the same pipeline at
two parallelism levels must move the SAME bytes (input read, shuffle
write/read, output) — only the walls shrink. If volumes matched and walls
stopped shrinking, the ceiling is hardware (memory bandwidth on one box),
not a plan that degrades with parallelism.

Usage: python tools/stage_metrics.py <eventlog-file-or-dir> [...]
Prints one JSON line per application:
  {"app": ..., "cores": N, "input_gb": ..., "shuffle_write_gb": ...,
   "shuffle_read_gb": ..., "task_time_core_s": ..., "gc_s": ...,
   "stages": K, "tasks": M}
``task_time_core_s`` is the sum of task run times — the work the cluster
did; wall = work / effective-parallelism.
"""

from __future__ import annotations

import json
import os
import sys


def _event_files(path: str) -> list[str]:
    """A log is either a single file or a Spark 4 rolling dir
    (eventlog_v2_<app>/events_*)."""
    if os.path.isdir(path):
        return [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.startswith("events_")
        ]
    return [path]


def _open_log(fp: str):
    """Event files may be zstd-compressed (Spark's rolling default)."""
    if fp.endswith(".zstd"):
        import io
        import subprocess

        out = subprocess.run(
            ["zstd", "-dc", fp], capture_output=True, check=True
        ).stdout
        return io.StringIO(out.decode("utf-8", errors="replace"))
    return open(fp)


def summarize(path: str) -> dict:
    app = os.path.basename(path)
    cores = None
    inp = sw = sr = out = 0
    task_ms = gc_ms = 0
    stages = tasks = 0
    t_start = t_end = None
    for fp in _event_files(path):
        with _open_log(fp) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerEnvironmentUpdate":
                    master = ev.get("Spark Properties", {}).get("spark.master", "")
                    if master.startswith("local["):
                        cores = master[6:-1]
                elif kind == "SparkListenerApplicationStart":
                    t_start = ev.get("Timestamp")
                elif kind == "SparkListenerApplicationEnd":
                    t_end = ev.get("Timestamp")
                elif kind == "SparkListenerStageCompleted":
                    stages += 1
                elif kind == "SparkListenerTaskEnd":
                    tasks += 1
                    m = ev.get("Task Metrics") or {}
                    task_ms += m.get("Executor Run Time", 0)
                    gc_ms += m.get("JVM GC Time", 0)
                    inp += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                    out += (m.get("Output Metrics") or {}).get("Bytes Written", 0)
                    sw += (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    srm = m.get("Shuffle Read Metrics") or {}
                    sr += srm.get("Local Bytes Read", 0) + srm.get(
                        "Remote Bytes Read", 0
                    )
    gb = 1024**3
    return {
        "app": app,
        "cores": cores,
        "app_wall_s": round((t_end - t_start) / 1000, 1)
        if t_start and t_end
        else None,
        "input_gb": round(inp / gb, 3),
        "output_gb": round(out / gb, 3),
        "shuffle_write_gb": round(sw / gb, 3),
        "shuffle_read_gb": round(sr / gb, 3),
        "task_time_core_s": round(task_ms / 1000, 1),
        "gc_s": round(gc_ms / 1000, 1),
        "stages": stages,
        "tasks": tasks,
    }


def main() -> None:
    paths = []
    for arg in sys.argv[1:]:
        if os.path.isdir(arg):
            paths += [
                os.path.join(arg, f)
                for f in sorted(os.listdir(arg))
                if not f.startswith(".")
            ]
        else:
            paths.append(arg)
    for p in paths:
        print(json.dumps(summarize(p)))


if __name__ == "__main__":
    main()
