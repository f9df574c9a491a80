"""Expression layer: filter mini-DSL compiler and the function registry."""

from datapipelines_essentials_python_spark.expr.filter_dsl import compile_filter, compile_filters
from datapipelines_essentials_python_spark.expr.registry import FUNCTION_REGISTRY, resolve_function

__all__ = ["compile_filter", "compile_filters", "FUNCTION_REGISTRY", "resolve_function"]
