"""Incremental aggregate maintenance and min/max data-skipping plans.

Beyond-reference surface (driver mandate): the two tricks that make a
100 TB warehouse cheap to keep fresh —

- ``merge_agg_state``: materialized-view maintenance. A stored per-key
  aggregate (sums/counts) is updated from a delta batch WITHOUT re-reading
  the base table: aggregate the delta, full-outer join on the keys, add.
  Cost is O(|delta| + |affected keys|) instead of O(|base|). Averages and
  other derived measures recompute from the merged sums/counts.
- ``zone_map`` / ``prune_plan``: data skipping. A zone map (per-split
  min/max/count over a sort-correlated column) lets a planner drop whole
  splits whose [min, max] cannot intersect a predicate range — the same
  math parquet row-group pruning and lakehouse file skipping use. Splits
  here are any grouping expression: ``input_file_name()`` for real files,
  or a key-range bucket for logical splits.

Both are pure DataFrame composition: one keyed shuffle each, partial aggs
map-side, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_agg_state(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge a per-key aggregate state with an already-aggregated delta.

    Both inputs carry ``keys + sum_cols + count_col``; the result is the
    same shape with sums and counts added (full-outer on keys, missing
    side treated as zero). Exactness: callers should aggregate DECIMAL
    sums (order-independent addition) — the merge is then exactly equal
    to a full recompute over base ∪ delta rows.
    """
    b = base.select(
        *[F.col(c).alias(f"__b_{c}") for c in keys + sum_cols + [count_col]]
    )
    d = delta.select(
        *[F.col(c).alias(f"__d_{c}") for c in keys + sum_cols + [count_col]]
    )
    cond = None
    for c in keys:
        clause = b[f"__b_{c}"] == d[f"__d_{c}"]
        cond = clause if cond is None else (cond & clause)
    j = b.join(d, cond, "full_outer")
    out = [
        F.coalesce(F.col(f"__d_{c}"), F.col(f"__b_{c}")).alias(c) for c in keys
    ]
    for c in sum_cols + [count_col]:
        zero = F.lit(0).cast(j.schema[f"__b_{c}"].dataType)
        out.append(
            (
                F.coalesce(F.col(f"__b_{c}"), zero)
                + F.coalesce(F.col(f"__d_{c}"), zero)
            ).alias(c)
        )
    return j.select(*out)


def zone_map(
    df: DataFrame,
    split_expr: Column,
    stat_cols: list[str],
    split_col: str = "split_id",
) -> DataFrame:
    """Per-split min/max/count statistics — the skipping index.

    ``split_expr`` defines the physical-or-logical split (e.g.
    ``F.input_file_name()`` or ``F.floor(F.col("l_orderkey") / 8192)``);
    stats are one partial-agg shuffle and the result is split-count sized
    (tiny), so it broadcasts into any downstream planner.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(split_expr.alias(split_col)).agg(*aggs)


def prune_plan(
    zmap: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Mark each split of a zone map as skippable for the predicate
    ``col BETWEEN lo AND hi``: a split can be skipped iff its value range
    cannot intersect [lo, hi]. Returns the zone map + ``can_skip``."""
    can_skip = (F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi))
    return zmap.withColumn("can_skip", can_skip)


def compaction_plan(
    zmap: DataFrame,
    target_rows: int,
    split_col: str = "split_id",
    rows_col: str = "n_rows",
) -> DataFrame:
    """Bin-pack splits into output files of ~``target_rows`` each — the
    small-files compaction planner. Consecutive splits (in ``split_col``
    order) are assigned to output group ``floor(rows_before / target)``
    via a running-sum window.

    The window is a global order over the ZONE MAP (split-count-sized,
    KBs), never over data — planner cost is independent of table size.
    Keeping consecutive splits together preserves any sort-correlation
    the layout already has (so zone-map pruning still works after
    compaction).
    """
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(split_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows_before = F.coalesce(F.sum(rows_col).over(w), F.lit(0))
    return zmap.select(
        split_col,
        rows_col,
        F.floor(rows_before / F.lit(target_rows)).cast("long").alias("out_file"),
    )
