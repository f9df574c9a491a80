"""HTML DQ report rendering.

Capability parity (SURVEY.md §2.11 Q4): reference builds an HTML report
string and writes it to ``execution_reports_dir``
(``data_quality.py:140-223``). Kept as a pure renderer over structured
:class:`RuleResult` data.
"""

from __future__ import annotations

import html
from datetime import datetime, timezone
from pathlib import Path

from datapipelines_essentials_python_spark.dq.rules import RuleResult

_STYLE = (
    "body{font-family:sans-serif} table{border-collapse:collapse}"
    "td,th{border:1px solid #999;padding:4px 8px}"
    ".pass{background:#e6ffe6}.fail{background:#ffe6e6}"
)


def render_html_report(dq_id: str, results: list[RuleResult]) -> str:
    ts = datetime.now(timezone.utc).isoformat()
    rows = []
    for r in results:
        cls = "pass" if r.passed else "fail"
        rows.append(
            f"<tr class='{cls}'><td>{html.escape(r.rule_id)}</td>"
            f"<td>{html.escape(r.name)}</td><td>{html.escape(r.rule_type)}</td>"
            f"<td>{'PASS' if r.passed else 'FAIL'}</td>"
            f"<td>{r.violation_count}</td><td>{r.total_count}</td>"
            f"<td>{html.escape(r.detail)}</td></tr>"
        )
    return (
        f"<html><head><style>{_STYLE}</style></head><body>"
        f"<h1>Data quality report: {html.escape(dq_id)}</h1>"
        f"<p>generated {ts}</p>"
        "<table><tr><th>rule_id</th><th>name</th><th>type</th><th>status</th>"
        "<th>violations</th><th>total rows</th><th>detail</th></tr>"
        f"{''.join(rows)}</table></body></html>"
    )


def write_html_report(dq_id: str, results: list[RuleResult], out_dir: str | Path) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    path = out / f"dq_report_{dq_id}_{stamp}.html"
    path.write_text(render_html_report(dq_id, results), encoding="utf-8")
    return path
