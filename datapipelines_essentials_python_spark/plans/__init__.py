"""Plan layer: typed metadata → Catalyst-native pipeline compilation.

The reference's "query language" is a metadata CSV (one row per
source-column→target-column mapping) plus a pk/fk data-model CSV
(SURVEY.md §1.1, §3.2). Here those are typed configs compiled straight to
``Column`` expressions and ``df.join`` chains — no generated SQL strings.
"""

from datapipelines_essentials_python_spark.plans.metadata import (
    ColumnSpec,
    TableSpec,
    load_metadata_csv,
)
from datapipelines_essentials_python_spark.plans.datamodel import DataModel
from datapipelines_essentials_python_spark.plans.join_planner import JoinStep, plan_joins, execute_joins
from datapipelines_essentials_python_spark.plans.compiler import PipelineCompiler

__all__ = [
    "ColumnSpec",
    "TableSpec",
    "DataModel",
    "JoinStep",
    "PipelineCompiler",
    "execute_joins",
    "load_metadata_csv",
    "plan_joins",
]
