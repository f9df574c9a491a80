"""pk/fk data-model graph.

Capability parity: ``MetaModel.py:277-296`` (``mapCsv2MetadataDict``) parses
``datamodel.csv`` into ``{table: {'pk': [...], 'fk': {parent: {'fk_pk':
[...], 'jointype': ...}}}}`` with ``|``-separated composite pks and
``;``-separated fk column lists (FIXTURES.md §1 shows the config shape).

Here the graph is a small typed structure parsed driver-side with stdlib
csv (the reference reads it through Spark + collect).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from pathlib import Path

from datapipelines_essentials_python_spark.errors import JoinPlanError

VALID_JOIN_TYPES = {"inner", "left", "right", "full", "left_semi", "left_anti", "cross"}


@dataclass(frozen=True)
class ForeignKey:
    """child.fk_cols reference parent.pk_cols, joined with ``join_type``."""

    parent: str
    fk_cols: tuple[str, ...]
    pk_cols: tuple[str, ...]
    join_type: str = "left"

    def __post_init__(self) -> None:
        # empty pk_cols = deferred resolution (parent's pk not parsed yet);
        # plan_joins validates arity once the model is complete
        if self.pk_cols and len(self.fk_cols) != len(self.pk_cols):
            raise JoinPlanError(
                f"fk/pk arity mismatch for parent {self.parent}: "
                f"{self.fk_cols} vs {self.pk_cols}"
            )
        if self.join_type not in VALID_JOIN_TYPES:
            raise JoinPlanError(f"invalid join type {self.join_type!r}")


@dataclass
class TableNode:
    name: str
    pk: tuple[str, ...] = ()
    fks: list[ForeignKey] = field(default_factory=list)


class DataModel:
    """The pk/fk adjacency graph over source tables."""

    def __init__(self) -> None:
        self.tables: dict[str, TableNode] = {}

    def add_table(self, name: str, pk: list[str] | tuple[str, ...] = ()) -> TableNode:
        node = self.tables.get(name)
        if node is None:
            node = TableNode(name=name, pk=tuple(pk))
            self.tables[name] = node
        elif pk:
            node.pk = tuple(pk)
        return node

    def add_fk(
        self,
        child: str,
        parent: str,
        fk_cols: list[str],
        pk_cols: list[str] | None = None,
        join_type: str = "left",
    ) -> None:
        child_node = self.add_table(child)
        parent_node = self.add_table(parent)
        pk_cols = pk_cols or list(parent_node.pk)
        child_node.fks.append(
            ForeignKey(
                parent=parent,
                fk_cols=tuple(fk_cols),
                pk_cols=tuple(pk_cols),
                join_type=join_type.strip().lower(),
            )
        )

    @classmethod
    def from_csv(cls, path: str | Path) -> "DataModel":
        """Parse a reference-shaped ``datamodel.csv``.

        Header: ``table, pk, fk_table, fk_col, fk_table_jointype`` with
        ``|``-separated composite pk and ``;``-separated fk columns.
        """
        model = cls()
        with open(path, newline="", encoding="utf-8") as fh:
            for row in csv.DictReader(fh):
                row = {k.strip(): (v.strip() if v else "") for k, v in row.items()}
                table = row["table"]
                pk = [p for p in row.get("pk", "").replace(";", "|").split("|") if p]
                model.add_table(table, pk)
                parent = row.get("fk_table", "")
                if parent:
                    fk_cols = [c for c in row.get("fk_col", "").replace("|", ";").split(";") if c]
                    model.add_fk(
                        child=table,
                        parent=parent,
                        fk_cols=fk_cols,
                        pk_cols=None,
                        join_type=(row.get("fk_table_jointype") or "left"),
                    )
        # resolve pk_cols deferred until all tables parsed
        for node in model.tables.values():
            resolved = []
            for fk in node.fks:
                if not fk.pk_cols:
                    parent_pk = model.tables[fk.parent].pk
                    resolved.append(
                        ForeignKey(fk.parent, fk.fk_cols, parent_pk, fk.join_type)
                    )
                else:
                    resolved.append(fk)
            node.fks = resolved
        return model
