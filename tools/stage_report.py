"""Summarize a Spark event log by job/stage (guide §1/§7 without a UI).

For each job (grouped by its job description = the opt_profile query label),
prints per-stage: wall duration, task count, summed executor run time,
JVM/Python split (executorRunTime vs PythonUDF time isn't separable here,
but shuffle bytes and records are), and the stage's first RDD name.

Usage: python tools/stage_report.py /tmp/ahs_eventlog/<app-id> [--min-ms 50]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logfile")
    ap.add_argument("--min-ms", type=int, default=50)
    ap.add_argument("--desc", default=None, help="filter by job description substring")
    args = ap.parse_args()

    stage_info: dict[int, dict] = {}
    stage_tasks: dict[int, dict] = defaultdict(
        lambda: {"n": 0, "run_ms": 0, "sh_read": 0, "sh_write": 0,
                 "in_bytes": 0, "records": 0, "fetch_wait_ms": 0}
    )
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    job_times: dict[int, list] = {}

    with open(args.logfile) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_stages[jid] = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                job_times[jid] = [ev.get("Submission Time", 0), None]
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_times:
                    job_times[jid][1] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                    "ntasks": si.get("Number of Tasks"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                st = stage_tasks[sid]
                st["n"] += 1
                st["run_ms"] += tm.get("Executor Run Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                im = tm.get("Input Metrics") or {}
                st["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                st["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                st["sh_write"] += sw.get("Shuffle Bytes Written", 0)
                st["in_bytes"] += im.get("Bytes Read", 0)
                st["records"] += im.get("Records Read", 0)

    for jid in sorted(job_desc):
        desc = job_desc[jid]
        if args.desc and args.desc not in desc:
            continue
        t0, t1 = job_times.get(jid, (0, None))
        wall = (t1 - t0) if (t1 and t0) else 0
        sids = [s for s in job_stages.get(jid, []) if s in stage_info]
        if not sids and wall < args.min_ms:
            continue
        print(f"job {jid}  wall={wall}ms  desc={desc[:90]}")
        for sid in sorted(sids):
            si = stage_info[sid]
            st = stage_tasks[sid]
            dur = (si["done"] - si["sub"]) if si.get("sub") and si.get("done") else 0
            if dur < args.min_ms and st["run_ms"] < args.min_ms:
                continue
            print(
                f"  stage {sid:4d} {dur:6d}ms tasks={st['n']:3d} "
                f"cpu={st['run_ms']:6d}ms shR={st['sh_read']:>9d} "
                f"shW={st['sh_write']:>9d} in={st['in_bytes']:>9d} "
                f"fetchWait={st['fetch_wait_ms']}ms  {si['name'][:70]}"
            )


if __name__ == "__main__":
    main()
