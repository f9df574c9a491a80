"""As-of (temporal) join and range join — operators Spark lacks natively.

Not present in the reference (SURVEY.md §2.3 notes "no theta/range/as-of"
joins); mandated by the engine's time-series/feature-lookup use cases.

Both are implemented as *compositions of shuffle-friendly DataFrame ops*
(pyspark guide "As-of / range join" pattern), not nested-loop joins:

- :func:`as_of_join` — union the two sides, sort within key partitions,
  carry the last right-side value forward with an ignore-nulls window.
  One shuffle on the key; no N×M blow-up; scales to arbitrarily large
  sides (this is how you'd do it on 100 TB — the alternative
  ``pd.merge_asof`` per group via applyInPandas dies on skewed keys).
- :func:`range_join` — explode each range into fixed-width buckets and
  equi-join on the bucket id, then filter exactly. Turns a
  BroadcastNestedLoopJoin into a hash join; bucket width trades explode
  fan-out vs per-bucket candidate count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    tie_break: str | None = None,
    assert_unique: bool = False,
) -> DataFrame:
    """For each left row, attach the nearest right row on the same key:
    ``direction='backward'`` (default) → most recent with
    ``right.ts <= left.ts``; ``'forward'`` → earliest with
    ``right.ts >= left.ts`` (both inclusive — pandas ``merge_asof`` /
    DuckDB ASOF semantics). Either way it is ONE key shuffle + one
    in-partition sorted window, not a per-row range probe.

    ``right`` must be unique per (key, ts): duplicate (key, ts) right rows
    make the match nondeterministic (whichever duplicate the in-partition
    sort happens to place last wins). Two opt-in guards enforce the
    contract instead of just documenting it:

    - ``tie_break='col'`` — resolve duplicates DETERMINISTICALLY by
      keeping, per (key, ts), the right row with the greatest value of
      that column (further ties broken by the value columns in order, via
      a single struct-max aggregation — one extra keyed agg on the right
      side, no window);
    - ``assert_unique=True`` — fail fast with ``ValueError`` if any
      (key, ts) group has more than one right row (one cheap aggregate
      job over the right side; use in pipelines where duplicates indicate
      an upstream bug rather than data to be resolved).

    Matched value columns come back as ``asof_<col>`` plus ``asof_ts``;
    unmatched rows keep NULLs. ``tolerance_seconds`` nulls out matches
    farther than the tolerance in the chosen direction.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if assert_unique:
        n_dup = (
            right.groupBy(*key_cols, right_ts)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if n_dup:
            raise ValueError(
                "as_of_join: right side has duplicate (key, ts) rows; "
                "pre-aggregate or pass tie_break= to resolve them "
                "deterministically"
            )
    if tie_break is not None:
        ordered = [tie_break, *[c for c in value_cols if c != tie_break]]
        best = F.max(
            F.struct(*[F.col(c) for c in ordered])
        ).alias("__best")
        right = (
            right.groupBy(*key_cols, right_ts)
            .agg(best)
            .select(
                *key_cols,
                right_ts,
                *[F.col(f"__best.{c}").alias(c) for c in value_cols],
            )
        )
    val_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *key_cols, F.col(right_ts).alias("__ts"), val_struct.alias("__val")
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # at equal ts the right row (__side=0) sorts first, so it is visible
        # to left rows at the same instant (inclusive, = DuckDB ASOF >=)
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # forward: mirror by SORT ORDER, not frame direction. Descending ts
        # with the same running unboundedPreceding..0 frame means the
        # last-seen non-null __val is the SMALLEST right ts >= left ts.
        # (An unboundedFollowing frame + first() has no running-state
        # processor in Spark and re-scans to partition end per row —
        # O(n^2) per key; this shape is O(n).) At equal ts the right row
        # (__side=0) still sorts first, keeping inclusive semantics.
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.desc("__ts"), "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    picked = F.last("__val", ignorenulls=True).over(w)
    filled = u.withColumn("__last", picked)
    out = filled.where(F.col("__side") == 1)

    matched: Column = F.col("__last")
    if tolerance_seconds is not None:
        # cast through TIMESTAMP first: NTZ-typed inputs (untyped-timezone
        # parquet) refuse a direct numeric cast
        lts = F.col("__ts").cast("timestamp").cast("double")
        rts = F.col("__last.__rts").cast("timestamp").cast("double")
        dist = (lts - rts) if direction == "backward" else (rts - lts)
        matched = F.when(dist <= F.lit(tolerance_seconds), matched)
    out = out.withColumn("__m", matched)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        F.col("__m.__rts").alias("asof_ts"),
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    left_value: str,
    lo_col: str,
    hi_col: str,
    bucket_size: float,
    payload_cols: list[str] | None = None,
    inclusive_hi: bool = False,
) -> DataFrame:
    """Join each left row to every range with ``lo <= value < hi``
    (``<= hi`` when ``inclusive_hi``).

    Each range row is exploded to the bucket ids it covers; the left side
    computes its single bucket id; the join becomes an equi hash join on
    bucket + exact interval filter. With broadcast-sized range tables
    Catalyst broadcasts the exploded side automatically.
    """
    payload_cols = payload_cols or [
        c for c in ranges.columns if c not in {lo_col, hi_col}
    ]
    bs = float(bucket_size)
    hi_bucket = F.floor(
        (F.col(hi_col) - F.lit(0 if inclusive_hi else 1e-12)) / bs
    ).cast("long")
    exploded = ranges.select(
        F.col(lo_col).alias("__lo"),
        F.col(hi_col).alias("__hi"),
        *[F.col(c) for c in payload_cols],
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / bs).cast("long"), hi_bucket)
        ).alias("__bucket"),
    )
    l = left.withColumn("__bucket", F.floor(F.col(left_value) / bs).cast("long"))
    cond_hi = (
        F.col(left_value) <= F.col("__hi")
        if inclusive_hi
        else F.col(left_value) < F.col("__hi")
    )
    # inner join: the exact interval filter discards non-matches anyway, and
    # an explicit inner lets Catalyst push/reorder freely
    joined = l.join(exploded, "__bucket", "inner").where(
        (F.col(left_value) >= F.col("__lo")) & cond_hi
    )
    return joined.drop("__bucket", "__lo", "__hi")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_size: float,
) -> DataFrame:
    """Interval×interval overlap join: every (l, r) pair with
    ``l.lo < r.hi AND r.lo < l.hi`` (half-open overlap) — sessions ×
    campaigns, outages × jobs, etc.

    A naive theta-join is a cartesian product; here BOTH sides explode
    their intervals into fixed-width bucket ids, the join is an equi hash
    join on bucket, duplicate (l, r) hits (an overlap can span many
    buckets) are dropped by keeping only the FIRST shared bucket —
    ``greatest(floor(l.lo/bs), floor(r.lo/bs))`` — a stateless dedup that
    avoids a distinct shuffle. The exact overlap predicate then filters
    false bucket neighbors.

    At 100 TB the shuffle volume is O(rows × interval_len/bucket_size):
    pick ``bucket_size`` near the median interval length so each row
    lands in O(1) buckets.
    """
    bs = float(bucket_size)

    def buckets(lo: str, hi: str) -> Column:
        return F.sequence(
            F.floor(F.col(lo) / bs).cast("long"),
            F.floor((F.col(hi) - F.lit(1e-12)) / bs).cast("long"),
        )

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.explode(buckets(left_lo, left_hi)).alias("__bucket"),
    )
    r = right.select(
        *[F.col(c) for c in right.columns],
        F.explode(buckets(right_lo, right_hi)).alias("__bucket"),
    )
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / bs).cast("long"),
        F.floor(F.col(right_lo) / bs).cast("long"),
    )
    overlap = (F.col(left_lo) < F.col(right_hi)) & (
        F.col(right_lo) < F.col(left_hi)
    )
    return (
        l.join(r, "__bucket")
        .where(overlap & (F.col("__bucket") == first_shared))
        .drop("__bucket")
    )
