"""I/O: format-dispatched readers and writers (SURVEY.md §2.1)."""

from datapipelines_essentials_python_spark.io.readers import read_data
from datapipelines_essentials_python_spark.io.writers import write_data

__all__ = ["read_data", "write_data"]
