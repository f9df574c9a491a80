"""Physical-plan introspection: the scale-health report behind
``tests/test_plans_quality.py``, exposed as a library so pipelines can
assert their own plan properties in CI (pushdown reached the scan, dims
broadcast, nothing fell back to Python) instead of discovering them in a
cluster bill.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    """Summary of scale-relevant physical-plan properties."""

    n_scans: int = 0
    n_exchanges: int = 0
    n_broadcasts: int = 0
    n_sorts: int = 0
    has_pushed_filters: bool = False
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    python_eval: bool = False
    arrow_eval: bool = False
    cartesian: bool = False
    wholestage_codegen: bool = False
    raw: str = ""

    def problems(self) -> list[str]:
        """Red flags for a relational pipeline (advisory, not absolute —
        Arrow eval is legitimate for binary/zip operators)."""
        out = []
        if self.python_eval:
            out.append("row-at-a-time Python UDF in the plan (BatchEvalPython)")
        if self.cartesian:
            out.append("cartesian product — O(N*M) pair materialization")
        if self.n_scans and not self.has_pushed_filters and "Filter" in self.raw:
            out.append("filters present but none pushed to the scan")
        return out


def explain_formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_report(df: DataFrame) -> PlanReport:
    """Parse ``explain('formatted')`` into a :class:`PlanReport`.

    Node counts use the numbered-tree section (each node appears once as
    ``(n) NodeName``), so a node is never double-counted from the detail
    section below the tree.
    """
    plan = explain_formatted(df)
    nodes = re.findall(r"^\s*[:+\-\s]*\(\d+\)\s+([A-Za-z0-9_]+)", plan, re.M)
    counts: dict[str, int] = {}
    for n in nodes:
        counts[n] = counts.get(n, 0) + 1
    return PlanReport(
        n_scans=sum(v for k, v in counts.items() if k.startswith("Scan")),
        n_exchanges=counts.get("Exchange", 0),
        n_broadcasts=counts.get("BroadcastExchange", 0)
        + counts.get("BroadcastHashJoin", 0)
        + counts.get("BroadcastNestedLoopJoin", 0),
        n_sorts=counts.get("Sort", 0),
        has_pushed_filters="PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        read_schemas=re.findall(r"ReadSchema: (\S+)", plan),
        python_eval="BatchEvalPython" in plan,
        arrow_eval="ArrowEvalPython" in plan or "MapInPandas" in plan,
        cartesian="CartesianProduct" in plan,
        wholestage_codegen="WholeStageCodegen" in plan,
        raw=plan,
    )
