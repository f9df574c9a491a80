"""Data-quality rule engine (SURVEY.md §2.11)."""

from datapipelines_essentials_python_spark.dq.rules import DQConfig, Rule, RuleResult
from datapipelines_essentials_python_spark.dq.engine import execute_rules
from datapipelines_essentials_python_spark.dq.report import render_html_report

__all__ = ["DQConfig", "Rule", "RuleResult", "execute_rules", "render_html_report"]
