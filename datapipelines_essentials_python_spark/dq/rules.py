"""DQ rule configuration.

Capability parity (SURVEY.md §2.11 Q5): reference JSON config shape —
``dq_id``, ``rules[]`` each with ``rule_id, name, description, rule_type,
columns | query``, plus ``execution_reports_dir`` and
``email_execution_report_to``
(``conf/data-quality/rules/production_configs/recipe-task1-dq-rules.json``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

VALID_RULE_TYPES = {"unique", "not null", "query"}


@dataclass(frozen=True)
class Rule:
    rule_id: str
    name: str
    rule_type: str  # unique | not null | query
    description: str = ""
    columns: tuple[str, ...] = ()
    query: str | None = None

    def __post_init__(self) -> None:
        rt = self.rule_type.strip().lower()
        if rt not in VALID_RULE_TYPES:
            raise ValueError(f"unknown rule_type {self.rule_type!r}; known {sorted(VALID_RULE_TYPES)}")
        if rt == "query" and not self.query:
            raise ValueError(f"rule {self.rule_id}: rule_type 'query' requires a query")
        if rt in {"unique", "not null"} and not self.columns:
            raise ValueError(f"rule {self.rule_id}: rule_type {rt!r} requires columns")


@dataclass(frozen=True)
class RuleResult:
    rule_id: str
    name: str
    rule_type: str
    passed: bool
    violation_count: int
    total_count: int
    detail: str = ""


@dataclass
class DQConfig:
    dq_id: str
    rules: list[Rule] = field(default_factory=list)
    execution_reports_dir: str | None = None
    email_execution_report_to: list[str] = field(default_factory=list)

    @classmethod
    def from_json(cls, path: str | Path) -> "DQConfig":
        raw = json.loads(Path(path).read_text(encoding="utf-8"))
        rules = [
            Rule(
                rule_id=str(r["rule_id"]),
                name=r.get("name", str(r["rule_id"])),
                rule_type=r["rule_type"],
                description=r.get("description", ""),
                columns=tuple(r.get("columns", ())),
                query=r.get("query"),
            )
            for r in raw.get("rules", [])
        ]
        return cls(
            dq_id=str(raw.get("dq_id", "dq")),
            rules=rules,
            execution_reports_dir=raw.get("execution_reports_dir"),
            email_execution_report_to=list(raw.get("email_execution_report_to", [])),
        )
