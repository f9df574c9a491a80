"""pk/fk graph join planner → chained DataFrame joins.

Capability parity (SURVEY.md §2.3 J1/J2): reference ``joinSQL``
(``MetaModel.py:129-182``) BFS-walks the pk/fk graph from the main table
(``transformBreadthFirstSearch``, ``MetaModel.py:457-468``) and emits a
``FROM main LEFT|INNER JOIN ...`` SQL string plus a join dict executed by
``functools.reduce`` over ``df.join`` (``ETLTransform.py:37-39,53-62``).

Here the same BFS/topological planning emits typed :class:`JoinStep`s
executed as a fold of ``df.join`` with explicit equi-conditions, so Catalyst
sees one analyzable multi-join plan and is free to reorder / pick
broadcast-hash vs sort-merge per join (plus AQE at runtime).

Scale design:

- ``broadcast_tables`` (or ``auto_broadcast_rows`` heuristics upstream)
  mark dimensions for explicit ``F.broadcast`` — at 100 TB the fact side
  must never shuffle for a 25-row ``nation`` join;
- equi-joins only, as in the reference; composite keys supported;
- cycle detection raises instead of looping forever (the reference's BFS
  assumes an acyclic model).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.errors import JoinPlanError
from datapipelines_essentials_python_spark.plans.datamodel import DataModel


@dataclass(frozen=True)
class JoinStep:
    """Join ``table`` onto the running result: result.child_cols == table.pk_cols."""

    child: str  # table already present in the running result
    table: str  # parent table being joined in
    child_cols: tuple[str, ...]
    parent_cols: tuple[str, ...]
    how: str


def plan_joins(model: DataModel, main_table: str) -> list[JoinStep]:
    """BFS from ``main_table`` over fk edges → ordered JoinSteps.

    Parents are joined in BFS discovery order (each step's child is already
    in the result — same invariant as the reference's recursive topological
    ordering at ``MetaModel.py:157-170``).
    """
    if main_table not in model.tables:
        raise JoinPlanError(f"unknown main table {main_table!r}")
    steps: list[JoinStep] = []
    seen: set[str] = {main_table}
    queue: deque[str] = deque([main_table])
    while queue:
        current = queue.popleft()
        for fk in model.tables[current].fks:
            if fk.parent == current:
                raise JoinPlanError(f"self-referencing fk on {current!r} unsupported")
            if fk.parent in seen:
                continue  # already joined via another path (diamond) — skip
            if fk.parent not in model.tables:
                raise JoinPlanError(f"fk references unknown table {fk.parent!r}")
            if not fk.pk_cols or len(fk.pk_cols) != len(fk.fk_cols):
                raise JoinPlanError(
                    f"unresolved/mismatched fk→pk columns joining {current!r} to "
                    f"{fk.parent!r}: fk={fk.fk_cols} pk={fk.pk_cols}"
                )
            steps.append(
                JoinStep(
                    child=current,
                    table=fk.parent,
                    child_cols=fk.fk_cols,
                    parent_cols=fk.pk_cols,
                    how=fk.join_type,
                )
            )
            seen.add(fk.parent)
            queue.append(fk.parent)
    return steps


def execute_joins(
    dfs: dict[str, DataFrame],
    main_table: str,
    steps: list[JoinStep],
    broadcast_tables: set[str] | None = None,
) -> DataFrame:
    """Fold the JoinSteps over ``df.join`` (parity: ETLTransform.py:53-62).

    Column-name collisions between tables are the caller's concern (the
    driver tables use prefixed names like ``o_orderkey``; the metadata
    compiler aliases before joining).
    """
    if main_table not in dfs:
        raise JoinPlanError(f"no DataFrame bound for main table {main_table!r}")
    broadcast_tables = broadcast_tables or set()
    result = dfs[main_table]
    for step in steps:
        if step.table not in dfs:
            raise JoinPlanError(f"no DataFrame bound for table {step.table!r}")
        right = dfs[step.table]
        if step.table in broadcast_tables:
            right = F.broadcast(right)
        cond = None
        for child_col, parent_col in zip(step.child_cols, step.parent_cols):
            clause = result[child_col] == right[parent_col]
            cond = clause if cond is None else (cond & clause)
        if cond is None:
            raise JoinPlanError(f"empty join condition for {step.table!r}")
        result = result.join(right, cond, step.how)
    return result
