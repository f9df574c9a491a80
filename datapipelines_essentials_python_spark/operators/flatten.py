"""Recursive nested-schema flattening → relational parent/child DataFrames.

Capability parity (SURVEY.md §2.10): the reference's signature operator,
``ComplexDataMapper`` (``Mapper.py:26-197``), walks a DataFrame schema and
generates a chain of SQL *views*:

- root view with ``monotonically_increasing_id()`` surrogate ids
  (``Mapper.py:169-184``)
- struct field → child view ``SELECT t.field.*, parent_sid, new sid``
  (``Mapper.py:81-93``)
- array<struct> → ``LATERAL VIEW INLINE`` child (``Mapper.py:94-108``)
- array<scalar> → ``LATERAL VIEW EXPLODE`` child (``Mapper.py:109-120``)
- natural keys cascaded to every leaf level (``Mapper.py:74-77,170-184``)
- XPath strings accumulated per level (``Mapper.py:120-164``)

Re-derived here as **DataFrame ops** with two deliberate fixes (SURVEY §7.5):

1. Surrogate-key determinism: the reference's
   ``monotonically_increasing_id()`` per view is unstable across
   recomputation — parent/child joins only line up because children re-scan
   registered temp views. Here surrogate ids are ``xxhash64`` over the
   cascaded natural key + array position (deterministic, recompute-safe,
   shuffle-free) — never ``monotonically_increasing_id``.
2. ``MapType`` is handled (exploded to key/value children); the reference
   dispatches only on struct/array (``Mapper.py:186-196``).

Scale design: every child table derives from the parent by ``select`` +
generator expressions — narrow transformations only, no shuffle anywhere in
the flattening tree; `posexplode_outer` keeps empty arrays from dropping
parent rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


@dataclass
class FlattenResult:
    """Flattened relational model: ``tables[name]`` are child DataFrames,
    ``xpaths`` records the source path of every leaf column (parity with the
    reference's XPath accumulation, Mapper.py:120-164)."""

    tables: dict[str, DataFrame] = field(default_factory=dict)
    xpaths: dict[str, list[str]] = field(default_factory=dict)


def _sid(*cols) -> F.Column:
    return F.xxhash64(*cols)


def flatten_nested(
    df: DataFrame,
    root_name: str = "root",
    cascade_keys: dict[str, str] | None = None,
    max_depth: int = 16,
) -> FlattenResult:
    """Explode arbitrarily nested struct/array/map columns into a tree of
    relational child DataFrames linked by deterministic surrogate ids.

    ``cascade_keys`` maps nested source paths to aliases cascaded onto every
    child (reference ``columns_cascade_to_leaf_level_with_alias``, e.g.
    ``{"id_info.nct_id": "pk_nct_id"}``).
    """
    result = FlattenResult()
    cascade_keys = cascade_keys or {}

    cascade_cols = [F.col(path).alias(alias) for path, alias in cascade_keys.items()]
    sid_col = f"surrogate_id_{root_name}"
    scalar_cols = [
        F.col(f.name)
        for f in df.schema.fields
        if not isinstance(f.dataType, (StructType, ArrayType, MapType))
    ]
    nested_fields = [
        f for f in df.schema.fields if isinstance(f.dataType, (StructType, ArrayType, MapType))
    ]
    key_exprs = cascade_cols if cascade_cols else scalar_cols
    root = df.select(
        *scalar_cols,
        *[F.col(path).alias(alias) for path, alias in cascade_keys.items()],
        _sid(*key_exprs).alias(sid_col) if key_exprs else _sid(F.to_json(F.struct("*"))).alias(sid_col),
        *[F.col(f.name) for f in nested_fields],
    )
    flat_root = root.select(
        *[c for c in root.columns if c not in {f.name for f in nested_fields}]
    )
    result.tables[root_name] = flat_root
    result.xpaths[root_name] = [f"/{c}" for c in flat_root.columns]

    cascade_aliases = list(cascade_keys.values())
    for nf in nested_fields:
        _flatten_field(
            parent=root,
            parent_name=root_name,
            parent_sid=sid_col,
            field_name=nf.name,
            dtype=nf.dataType,
            cascade_aliases=cascade_aliases,
            xpath=f"/{nf.name}",
            result=result,
            depth=1,
            max_depth=max_depth,
        )
    return result


def _flatten_field(
    parent: DataFrame,
    parent_name: str,
    parent_sid: str,
    field_name: str,
    dtype,
    cascade_aliases: list[str],
    xpath: str,
    result: FlattenResult,
    depth: int,
    max_depth: int,
) -> None:
    if depth > max_depth:
        return
    child_name = f"{parent_name}_{field_name}"
    sid_col = f"surrogate_id_{child_name}"
    carried = [F.col(parent_sid)] + [F.col(a) for a in cascade_aliases]

    if isinstance(dtype, StructType):
        child = parent.select(*carried, F.col(field_name).alias("__node")).where(
            F.col("__node").isNotNull()
        )
        child = child.select(
            *carried,
            _sid(F.col(parent_sid), F.lit(field_name)).alias(sid_col),
            F.col("__node.*"),
        )
    elif isinstance(dtype, ArrayType):
        exploded = parent.select(
            *carried, F.posexplode_outer(F.col(field_name)).alias("__pos", "__node")
        ).where(F.col("__node").isNotNull())
        if isinstance(dtype.elementType, StructType):
            # reference: LATERAL VIEW INLINE (Mapper.py:94-108)
            child = exploded.select(
                *carried,
                _sid(F.col(parent_sid), F.lit(field_name), F.col("__pos")).alias(sid_col),
                F.col("__pos").alias("array_index"),
                F.col("__node.*"),
            )
        else:
            # reference: LATERAL VIEW EXPLODE with `col AS name` (Mapper.py:109-120)
            child = exploded.select(
                *carried,
                _sid(F.col(parent_sid), F.lit(field_name), F.col("__pos")).alias(sid_col),
                F.col("__pos").alias("array_index"),
                F.col("__node").alias(field_name),
            )
    elif isinstance(dtype, MapType):
        child = parent.select(
            *carried, F.posexplode_outer(F.map_entries(F.col(field_name))).alias("__pos", "__node")
        ).where(F.col("__node").isNotNull())
        child = child.select(
            *carried,
            _sid(F.col(parent_sid), F.lit(field_name), F.col("__node.key")).alias(sid_col),
            F.col("__node.key").alias("map_key"),
            F.col("__node.value").alias("map_value"),
        )
    else:  # pragma: no cover - scalars never recurse here
        return

    nested = [
        f for f in child.schema.fields if isinstance(f.dataType, (StructType, ArrayType, MapType))
    ]
    flat = child.select(*[c for c in child.columns if c not in {f.name for f in nested}])
    result.tables[child_name] = flat
    result.xpaths[child_name] = [f"{xpath}/{c}" for c in flat.columns]
    for nf in nested:
        _flatten_field(
            parent=child,
            parent_name=child_name,
            parent_sid=sid_col,
            field_name=nf.name,
            dtype=nf.dataType,
            cascade_aliases=cascade_aliases,
            xpath=f"{xpath}/{nf.name}",
            result=result,
            depth=depth + 1,
            max_depth=max_depth,
        )


def flatten_columns(df: DataFrame, sep: str = "_") -> DataFrame:
    """One-shot width-wise flatten: recursively expand every struct into
    ``a_b_c`` columns and leave arrays/maps intact (the reference's
    convenience alternative noted in SURVEY §2.10)."""
    while True:
        struct_fields = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_fields:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fields:
                    cols.append(F.col(f"{f.name}.{sub.name}").alias(f"{f.name}{sep}{sub.name}"))
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)
