"""Per-job wall time grouped by job description, plus inter-job driver gaps.

Usage: python tools/job_report.py <event log file> [desc_filter]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    filt = sys.argv[2] if len(sys.argv) > 2 else None
    jobs = {}
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
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev.get("Submission Time", 0),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "callsite": props.get("callSite.short", ""),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
    by_desc: dict[str, list] = defaultdict(list)
    order = sorted(jobs)
    prev_end = None
    for jid in order:
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1000
        gap = (j["t0"] - prev_end) / 1000 if prev_end else 0.0
        prev_end = j["t1"]
        by_desc[j["desc"]].append((jid, dur, gap))
    for desc, rows in by_desc.items():
        if filt and filt not in desc:
            continue
        tot = sum(r[1] for r in rows)
        gaps = sum(r[2] for r in rows[1:])
        print(f"\n== {desc or '<none>'}: {len(rows)} jobs, {tot:.2f}s in-job, {gaps:.2f}s driver gaps between jobs ==")
        for jid, dur, gap in rows:
            print(f"  job {jid:4d}  dur={dur:6.2f}s  gap_before={gap:5.2f}s")


if __name__ == "__main__":
    main()
