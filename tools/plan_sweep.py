"""Plan-shape sweep over the whole registry (round-9 audit tool).

For every ``queries()`` entry (at the fast sf0.001 tier so iterative
operators' eager checkpoints stay cheap), build the DataFrame and tally
plan features from ``explain("formatted")``:

- per-parquet-table scan counts (a table scanned 3+ times in one plan
  usually means a shared subtree is re-computed instead of reused),
- Exchange / BroadcastExchange counts,
- BatchEvalPython / ArrowEvalPython (the row-at-a-time Python boundary —
  should be ZERO everywhere),
- CartesianProduct / BroadcastNestedLoopJoin,
- join strategy mix (SortMergeJoin vs ShuffledHashJoin vs BroadcastHashJoin).

Usage: python tools/plan_sweep.py [--sf-dir DIR] [QUERY ...] > sweep.tsv
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datapipelines_essentials_python_spark import get_or_create_spark_session  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

FEATURES = [
    ("exchange", r"\bExchange\b"),
    ("bcast", r"BroadcastExchange"),
    ("smj", r"SortMergeJoin"),
    ("shj", r"ShuffledHashJoin"),
    ("bhj", r"BroadcastHashJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("pyeval", r"BatchEvalPython"),
    ("arroweval", r"ArrowEvalPython"),
    ("pandas", r"FlatMapGroupsInPandas|MapInPandas"),
    ("window", r"\bWindow\b"),
    ("rdd_scan", r"Scan ExistingRDD"),
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    spark = get_or_create_spark_session("plan_sweep")
    registry = entry_mod.queries()
    names = args or sorted(registry)
    hdr = ["query"] + [f for f, _ in FEATURES] + ["scans"]
    print("\t".join(hdr), flush=True)
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}", flush=True)
            continue
        row = [name]
        for _, pat in FEATURES:
            row.append(str(len(re.findall(pat, plan))))
        scans = Counter(
            m.group(1)
            for m in re.finditer(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
        )
        row.append(",".join(f"{t}:{c}" for t, c in sorted(scans.items())))
        print("\t".join(row), flush=True)
        for dep in getattr(df, "_sg_persisted", ()):
            dep.unpersist()


if __name__ == "__main__":
    main()
