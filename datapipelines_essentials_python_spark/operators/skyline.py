"""Multi-dimensional skyline (Pareto-optimal set) over a DataFrame.

Beyond-reference capability: generalizes ``relational.pareto_frontier_2d``
(the 2-D sort-sweep, which exploits a total order that only exists in two
dimensions) to ANY number of criteria with per-column min/max directions —
the "best tradeoff" operator behind supplier scorecards, config tuning,
and data-mixture selection (Börzsönyi et al., ICDE'01 — public).

Spark-first shape — the classic two-phase distributed skyline:

1. **Local phase**: ``mapInPandas`` filters every Arrow batch to its
   batch-local skyline (sort by the first criterion, then a
   keep-if-not-dominated sweep against the running skyline — O(n·s)
   per batch with s the skyline size, vectorized via numpy broadcast).
   Dominance is transitive, so no TRUE skyline point is ever removed
   locally, and every locally-removed point is dominated by some
   global survivor.
2. **Global phase**: the surviving candidates (union of batch skylines —
   small, because skyline cardinality grows polylogarithmically for
   independent/correlated dimensions) are folded to one partition and
   swept once more. The final pass sees every true skyline point, so
   the result is EXACT and partitioning-invariant.

Anti-correlated dimensions can inflate skyline size toward n — in that
regime pre-grid the data (group by a coarse quantile cell, skyline per
cell, then global) before calling this; the registry query's dimensions
are sales aggregates with heavily correlated tails, the benign case.

Ties: rows equal on EVERY criterion dominate nothing and are all kept —
the operator is a total function of the input multiset.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _sweep(pdf: pd.DataFrame, cols: list[str], signs: list[int]) -> pd.DataFrame:
    """Exact skyline of one in-memory frame: normalize every criterion
    to MINIMIZE (max-dims negated), sort by the first criterion so a
    point can only be dominated by an earlier one, then keep points not
    dominated by any kept point (numpy broadcast per row, O(n·s))."""
    if pdf.empty:
        return pdf
    vals = np.column_stack(
        [pdf[c].to_numpy(dtype=np.float64) * s for c, s in zip(cols, signs)]
    )
    order = np.lexsort(tuple(vals[:, d] for d in range(vals.shape[1] - 1, -1, -1)))
    vals = vals[order]
    kept_idx: list[int] = []
    kept_vals: np.ndarray | None = None
    for i in range(vals.shape[0]):
        v = vals[i]
        if kept_vals is not None:
            le = (kept_vals <= v).all(axis=1)
            lt = (kept_vals < v).any(axis=1)
            if bool((le & lt).any()):
                continue
        kept_idx.append(i)
        kept_vals = vals[np.asarray(kept_idx)]
    return pdf.iloc[order[np.asarray(kept_idx, dtype=np.int64)]]


def skyline(df: DataFrame, spec: list[tuple[str, str]]) -> DataFrame:
    """Exact distributed skyline of ``df`` under ``spec`` — a list of
    ``(column, direction)`` with direction ``"min"`` or ``"max"``.
    Non-criterion columns ride along untouched. Returns the
    Pareto-optimal rows (deterministic SET; apply your own ordering)."""
    if not spec:
        raise ValueError("skyline needs at least one (column, direction)")
    cols = [c for c, _ in spec]
    signs = []
    for c, d in spec:
        if d not in ("min", "max"):
            raise ValueError(f"skyline direction for {c!r} must be min|max, got {d!r}")
        signs.append(1 if d == "min" else -1)

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _sweep(pdf, cols, signs)

    def _global(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        got = list(batches)
        if not got:
            return
        yield _sweep(pd.concat(got, ignore_index=True), cols, signs)

    candidates = df.mapInPandas(_local, schema=df.schema)
    # candidate set = union of batch skylines — small by the skyline
    # cardinality argument above, so the 1-partition fold is a scalar-
    # sized gather, not a corpus collect.
    return candidates.repartition(1).mapInPandas(_global, schema=df.schema)
