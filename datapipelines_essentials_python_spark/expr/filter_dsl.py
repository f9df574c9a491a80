"""Filter-expression mini-DSL → Catalyst ``Column`` predicates.

Capability parity: the reference rewrites metadata filter strings like
``eq('Dadar')``, ``gt(100)``, ``in(1,2,3)`` into SQL comparator fragments via
substring matching (``etl/ITable.py:40-66`` ``matchEqualityOperator``, with
duplicates at ``MetaModel.py:324-346`` and ``:348-379``). That implementation
is order-dependent and buggy — ``'in'`` matches inside ``'notin'``
(SURVEY.md §7.5) — so this module is a real parser for the *intended*
grammar:

    expr     := op '(' args ')'
    op       := eq | ne | gt | lt | gte | lte | in | notin | like
              | between | isnull | notnull
    args     := comma-separated literals; quotes optional

Compiles to ``pyspark.sql.Column`` predicates (``F.col(c) == v``,
``.isin(...)``, ...) so every filter reaches Catalyst as a native predicate
and is pushed down to the parquet scan — the reference's string-SQL route
also pushed down, but only after a ``spark.sql`` round-trip per fragment.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.errors import FilterDSLError

_EXPR_RE = re.compile(r"^\s*([a-zA-Z_]+)\s*\(\s*(.*?)\s*\)\s*$", re.DOTALL)

_OPS = {"eq", "ne", "gt", "lt", "gte", "lte", "in", "notin", "like", "between", "isnull", "notnull"}


def _parse_args(raw: str) -> list[object]:
    """Split a comma-separated literal list, honoring quotes."""
    if raw.strip() == "":
        return []
    args: list[object] = []
    for tok in _split_top_level(raw):
        tok = tok.strip()
        if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
            args.append(tok[1:-1])
        else:
            # numeric literal if it parses, else bare string
            try:
                args.append(int(tok))
            except ValueError:
                try:
                    args.append(float(tok))
                except ValueError:
                    args.append(tok)
    return args


def _split_top_level(raw: str) -> list[str]:
    out, buf, quote = [], [], None
    for ch in raw:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == ",":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


def parse(expression: str) -> tuple[str, list[object]]:
    """Parse one DSL expression into ``(op, args)``; raises FilterDSLError."""
    m = _EXPR_RE.match(expression)
    if not m:
        raise FilterDSLError(f"malformed filter expression: {expression!r}")
    op, raw_args = m.group(1).lower(), m.group(2)
    if op not in _OPS:
        raise FilterDSLError(f"unknown filter op {op!r} in {expression!r}; known: {sorted(_OPS)}")
    return op, _parse_args(raw_args)


def compile_filter(column: str, expression: str) -> Column:
    """Compile one DSL expression against ``column`` into a Column predicate."""
    op, args = parse(expression)
    col = F.col(column)

    def need(n: int) -> None:
        if len(args) != n:
            raise FilterDSLError(f"{op}() expects {n} arg(s), got {len(args)}: {expression!r}")

    if op == "eq":
        need(1)
        return col == F.lit(args[0])
    if op == "ne":
        need(1)
        return col != F.lit(args[0])
    if op == "gt":
        need(1)
        return col > F.lit(args[0])
    if op == "lt":
        need(1)
        return col < F.lit(args[0])
    if op == "gte":
        need(1)
        return col >= F.lit(args[0])
    if op == "lte":
        need(1)
        return col <= F.lit(args[0])
    if op == "in":
        if not args:
            raise FilterDSLError(f"in() needs at least one value: {expression!r}")
        return col.isin(args)
    if op == "notin":
        if not args:
            raise FilterDSLError(f"notin() needs at least one value: {expression!r}")
        return ~col.isin(args)
    if op == "like":
        need(1)
        return col.like(str(args[0]))
    if op == "between":
        need(2)
        return col.between(F.lit(args[0]), F.lit(args[1]))
    if op == "isnull":
        return col.isNull()
    if op == "notnull":
        return col.isNotNull()
    raise FilterDSLError(f"unhandled op {op!r}")  # pragma: no cover


def compile_filters(filters: dict[str, str] | list[tuple[str, str]]) -> Column | None:
    """AND together per-column DSL filters (reference ANDs WHERE clauses,
    ``ITable.py:140-143``). Returns None for an empty filter set."""
    items = filters.items() if isinstance(filters, dict) else filters
    pred: Column | None = None
    for column, expression in items:
        clause = compile_filter(column, expression)
        pred = clause if pred is None else (pred & clause)
    return pred
