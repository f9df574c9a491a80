"""Typed column-mapping metadata (the reference's MetaResult, done as data).

Capability parity: ``MetaModel.py:13-75`` (``MetaResult`` — one row per
src→target column mapping with filetype, path, filter, aggregator, UDF,
table order), ``MetaModel.py:184-246`` (CSV load + per-row validation), and
the type vocabulary of ``MetaModel.py:87-100`` / ``CColumn.py:17-30``.

Differences on purpose:

- metadata is parsed with the stdlib ``csv`` module — the reference reads
  the (tiny) metadata CSV *through Spark* and collects it
  (``MetaModel.py:211-219``), paying a full Spark job for driver-side
  config;
- the type vocabulary adds ``decimal(p,s)`` (absent in the reference —
  SURVEY §1.2 flags money-as-double) and accepts any Spark ``simpleString``
  type via ``cast`` so nested types work too.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from pathlib import Path

from datapipelines_essentials_python_spark.errors import MetadataValidationError

# reference scalar vocabulary (MetaModel.py:87-100) normalized to Spark
# simpleString names; anything else is passed through to `cast` verbatim.
TYPE_ALIASES = {
    "integer": "int",
    "long": "bigint",
    "bool": "boolean",
    "str": "string",
    "datetime": "timestamp",
}


def normalize_type(type_name: str) -> str:
    t = type_name.strip().lower()
    return TYPE_ALIASES.get(t, t)


@dataclass(frozen=True)
class ColumnSpec:
    """One src-column → target-column mapping (reference MetaResult row)."""

    src_table: str
    src_col: str
    target_col: str
    src_type: str = "string"
    target_type: str = "string"
    is_pk: bool = False
    filter: str | None = None  # filter mini-DSL, e.g. "eq('Dadar')"
    aggregator: str | None = None  # min|max|count|sum|avg|count_distinct|...
    aggregator_filter: str | None = None  # HAVING-style DSL on the agg value
    udf: str | None = None  # registry function name
    udf_args: tuple[str, ...] = ()

    def validate(self) -> None:
        if not self.src_table or not self.src_col or not self.target_col:
            raise MetadataValidationError(f"incomplete column spec: {self}")
        if self.aggregator_filter and not self.aggregator:
            raise MetadataValidationError(
                f"aggregator_filter without aggregator on {self.src_table}.{self.src_col}"
            )


@dataclass
class TableSpec:
    """Per-source-table spec: where to read it and its column mappings."""

    name: str
    filetype: str = "parquet"
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    order: int = 0
    columns: list[ColumnSpec] = field(default_factory=list)

    @property
    def pk_columns(self) -> list[str]:
        return [c.src_col for c in self.columns if c.is_pk]


def load_metadata_csv(path: str | Path, target_table: str | None = None) -> list[TableSpec]:
    """Parse a reference-shaped ``meta.csv`` into TableSpecs.

    Expected header (FIXTURES.md §1 / reference ``tests/resources/meta.csv``):
    ``src_table, src_filetype, src_file_path, src_col, src_col_datatype,
    key_constraints, src_col_filter, src_col_aggregator,
    src_col_aggregator_filter, src_table_order, udf, udfarguments,
    target_table, target_col, target_col_datatype``.
    """
    tables: dict[str, TableSpec] = {}
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.DictReader(fh):
            row = {k.strip(): (v.strip() if v else "") for k, v in row.items()}
            if target_table and row.get("target_table") != target_table:
                continue
            name = row["src_table"]
            spec = tables.get(name)
            if spec is None:
                spec = TableSpec(
                    name=name,
                    filetype=row.get("src_filetype") or "csv",
                    path=row.get("src_file_path") or None,
                    order=int(row.get("src_table_order") or 0),
                )
                tables[name] = spec
            udf_args = tuple(a for a in row.get("udfarguments", "").split("|") if a)
            col = ColumnSpec(
                src_table=name,
                src_col=row["src_col"],
                target_col=row.get("target_col") or row["src_col"],
                src_type=normalize_type(row.get("src_col_datatype") or "string"),
                target_type=normalize_type(row.get("target_col_datatype") or "string"),
                is_pk="pk" in row.get("key_constraints", "").lower(),
                filter=row.get("src_col_filter") or None,
                aggregator=row.get("src_col_aggregator") or None,
                aggregator_filter=row.get("src_col_aggregator_filter") or None,
                udf=row.get("udf") or None,
                udf_args=udf_args,
            )
            col.validate()
            spec.columns.append(col)
    return sorted(tables.values(), key=lambda t: t.order)
