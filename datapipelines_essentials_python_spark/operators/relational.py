"""Small relational operators the reference exposes ad hoc.

Capability parity (SURVEY.md §2.4 A5, §2.6 O2):

- word count — reference does RDD ``map/flatMap/reduceByKey``
  (``Utilities.py:30-36``); here ``split`` + ``explode`` + ``groupBy().count()``
  stays in Tungsten with map-side partial aggregation;
- top-k per group — the reference's only top-k is the k=1 window filter in
  CDC (``change_data_capture.py:26-28``); generalized to any k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_count(
    df: DataFrame, text_col: str, pattern: str = r"\s+", lowercase: bool = True
) -> DataFrame:
    """Token frequency over a text column → (word, cnt).

    Catalyst plan: project(split) → explode → partial hash agg → shuffle on
    word → final agg. At 100 TB the partial agg collapses the heavy explode
    fan-out before the shuffle — same shape ``reduceByKey`` promised, plus
    codegen.
    """
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = df.select(F.explode(F.split(text, pattern)).alias("word")).where(
        F.col("word") != ""
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column | str],
    k: int = 1,
    rank_col: str = "rank",
    keep_rank: bool = False,
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group via window ranking.

    ``method`` ∈ {row_number, rank, dense_rank} — the reference only ever
    uses row_number (W1); rank/dense_rank exposed per SURVEY §2.5 gap note.
    """
    rankers = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    ranker = rankers[method]
    order = [F.desc(c) if isinstance(c, str) else c for c in order_cols]
    win = Window.partitionBy(*partition_cols).orderBy(*order)
    out = df.withColumn(rank_col, ranker().over(win)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_factor: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: identical semantics to ``big.join(small,
    on, how)``, but hot keys no longer funnel into one reducer.

    The big side gets a deterministic salt = xxhash64(row-of-join-keys +
    uniquifying columns) mod ``salt_factor``; the small side is replicated
    ``salt_factor``× (explode of a literal range). The join key becomes
    (keys..., salt), so a key that used to land on one partition now
    spreads over ``salt_factor`` partitions. Deterministic (hash salt, not
    rand()) → reproducible plans and retry-safe tasks.

    Use when AQE's runtime skew-join splitting isn't available or the skew
    is in an aggregation-feeding join it can't rebalance; cost = small side
    inflated ``salt_factor``×, so keep the small side small. ``how``
    supports inner/left — semantics preserved because every big-side row
    carries exactly one salt and meets the full small side for its key.

    ``salt_cols`` picks which big-side columns feed the salt hash — any
    per-row-varying subset works (the result is identical for EVERY salt
    assignment, since the small side carries all salts per key). Pass one
    cheap high-cardinality column (an id) to avoid hashing wide payload
    columns per row; default hashes all columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    cols = salt_cols if salt_cols is not None else big.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_factor))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = big_s.join(small_s, [*on, "_salt"], how)
    return out.drop("_salt")


def approx_distinct_profile(
    df: DataFrame, columns: list[str], rsd: float = 0.05
) -> DataFrame:
    """Approximate distinct-cardinality profile: one HyperLogLog++ sketch
    per column in a single pass — the scan-speed alternative to N exact
    count-distinct shuffles when profiling wide tables at 100 TB.
    Accuracy knob: ``rsd`` (relative standard deviation). Approximate by
    design → exercised in unit tests, not the value-hash oracle gate."""
    aggs = [
        F.approx_count_distinct(c, rsd).cast("long").alias(f"{c}_approx_distinct")
        for c in columns
    ]
    return df.agg(*aggs)


def approx_quantiles_profile(
    df: DataFrame, column: str, probabilities: list[float], accuracy: int = 10000
) -> DataFrame:
    """Approximate quantiles via the Greenwald-Khanna sketch
    (``percentile_approx``): mergeable partial sketches → one shuffle of
    sketch state, never of data. Exact percentiles at 100 TB would sort
    the column; this reads it once."""
    return df.agg(
        F.percentile_approx(
            column, probabilities, accuracy
        ).alias("quantiles")
    )


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join pruning: drop big-side rows whose key cannot
    be in ``small`` BEFORE the join shuffle.

    The filter is built as a distinct set of bit positions (k deterministic
    xxhash64 seeds mod m) collected from the small side and broadcast as an
    array literal via a join-free ``isin``-style membership check — here
    realized as a broadcast join against the distinct positions table, so
    nothing is collected to the driver. False positives pass (and are
    eliminated by the real join later); false negatives cannot happen, so
    ``bloom_prefilter(...).join(small)`` ≡ ``big.join(small)``.

    At 100 TB this is the classic shuffle-volume reducer for selective
    joins: the big side sheds non-matching rows at scan time instead of
    carrying them through the exchange. Spark's runtime bloom
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
    automatically for some shapes; the explicit operator covers the rest
    (pre-aggregated keys, reused filters, cross-job pruning).
    """
    def positions(key_col: Column, seed: int) -> Column:
        return F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(num_bits))

    bits = None
    for s in range(num_hashes):
        p = small.select(positions(F.col(small_key), s).alias("bit"))
        bits = p if bits is None else bits.unionByName(p)
    bits = bits.distinct()

    out = big
    for s in range(num_hashes):
        out = out.join(
            F.broadcast(bits.withColumnRenamed("bit", f"_b{s}")),
            positions(F.col(big_key), s) == F.col(f"_b{s}"),
            "left_semi",
        )
    return out


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Daily time-series completion with forward fill.

    Aggregates ``val_col`` per (key, day), generates the full calendar
    between each key's first and last day (``sequence`` + ``explode`` — a
    narrow generator, no driver loop), left-joins the observed days back,
    and forward-fills missing days with the last observed value (``last``
    with ``ignorenulls`` over an unbounded-preceding window).

    → ``(key, day, value, filled)`` where ``filled`` marks synthesized
    days. Scale shape: one shuffle for the daily aggregate, one for the
    calendar join (both keyed the same), one window per key ordered by
    day — the calendar explode adds at most rows-per-day × key-span rows,
    independent of the raw event volume.
    """
    from pyspark.sql import Window

    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.sum(F.col(val_col).cast("decimal(18,4)")).cast("double").alias("v"))
    cal = (
        daily.groupBy("key")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select("key", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    joined = cal.join(daily, ["key", "day"], "left")
    w = Window.partitionBy("key").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        "key",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("filled"),
    )


def rolling_daily_mean(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing ``window_days``-day moving average per key, computed on a
    DAILY pre-aggregate: collapse events to (key, day, decimal-exact sum,
    count) first — one keyed shuffle over data that shrinks to
    keys × days — then run a RANGE window over the integer day offset, so
    gaps in the calendar still cover exactly ``window_days`` real days
    (a ROWS frame would silently span gaps).

    The rolling mean divides the windowed decimal sum by the windowed
    count (identical float op on every engine). → (key, day, n, mean).
    """
    day = F.to_date(ts_col)
    daily = (
        df.groupBy(F.col(key_col).alias("key"), day.alias("day"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("key")
        .orderBy(epoch_day)
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "key",
        "day",
        "n",
        F.round(
            F.sum("s").over(w).cast("double") / F.sum("n").over(w).cast("double"), 6
        ).alias("mean"),
    )


def iqr_outliers(
    df: DataFrame, key_col: str, value_col: str, k: float = 1.5
) -> DataFrame:
    """Tukey-fence outlier profile per key: bounds = Q1 − k·IQR / Q3 +
    k·IQR (exact percentiles, rounded to 6 dp so the fence compare is
    engine-portable), plus how many values fall outside.

    Two aggregations, both one shuffle on the key: the quantile pass
    produces a per-key bounds table (broadcast back), the count pass
    classifies. At 100 TB swap the exact percentile for
    ``approx_percentile`` (same contract — see approx_quantiles_profile).

    → (key, n_total, n_outliers, lo, hi).
    """
    bounds = df.groupBy(F.col(key_col).alias("key")).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
    )
    bounds = bounds.select(
        "key",
        F.round(F.col("q1") - k * (F.col("q3") - F.col("q1")), 6).alias("lo"),
        F.round(F.col("q3") + k * (F.col("q3") - F.col("q1")), 6).alias("hi"),
    )
    tagged = df.join(
        F.broadcast(bounds), F.col(key_col) == F.col("key"), "inner"
    )
    out_of_fence = (F.col(value_col) < F.col("lo")) | (
        F.col(value_col) > F.col("hi")
    )
    return tagged.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(out_of_fence.cast("long")).cast("long").alias("n_outliers"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorize ``value_col`` per key: clamp values below the ``lo_q``
    quantile / above the ``hi_q`` quantile to those bounds — the standard
    robust-stats move before mean/σ-based features meet heavy tails.

    Same shape as :func:`iqr_outliers`: one quantile pass producing a
    per-key bounds table (tiny → broadcast back), one clamp projection.
    Bounds are rounded to 6 dp so the clamped output is engine-portable.
    At 100 TB swap the exact percentile for ``approx_percentile``.
    """
    out_col = out_col or f"{value_col}_wins"
    bounds = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.round(F.expr(f"percentile({value_col}, {lo_q})"), 6).alias("__lo"),
        F.round(F.expr(f"percentile({value_col}, {hi_q})"), 6).alias("__hi"),
    )
    clamped = F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    return (
        df.join(F.broadcast(bounds), F.col(key_col) == F.col("__k"), "inner")
        .withColumn(out_col, clamped)
        .drop("__k", "__lo", "__hi")
    )


def chi2_drift(
    df: DataFrame,
    value_col: str,
    split_col: Column,
    edges: list[float],
) -> DataFrame:
    """Distribution-drift detector between two corpus slices (schema- and
    engine-portable alternative to PSI — the chi-square statistic uses
    only +,*,/ so no libm log enters the hash-checked output).

    ``split_col`` must be a boolean Column marking the *reference* slice;
    rows are bucketed by ``edges`` (right-open; underflow → bucket 0,
    overflow → last bucket). Per bucket: reference share ``p``, current
    share ``q``, and contribution ``(q - p)^2 / p``. Σ contribution is
    the chi-square drift statistic; per-bucket rows localize *where* the
    distributions diverge (the actionable part for corpus monitoring).

    Single pass: one bucket-keyed agg with conditional counts (map-side
    combined), totals via a 1-row broadcast — no second scan, no window.
    """
    v = F.col(value_col).cast("double")
    bucket: Column = F.lit(0)
    for i, e in enumerate(edges):
        bucket = F.when(v >= F.lit(float(e)), F.lit(i + 1)).otherwise(bucket)
    is_ref = split_col
    per_bucket = df.select(
        bucket.alias("bucket"), is_ref.alias("is_ref")
    ).groupBy("bucket").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).cast("long").alias("n_cur"),
    )
    # totals as a window over the POST-AGG bucket table (bucket-cardinality
    # rows) — a second aggregate branch would rescan the corpus for the
    # same counts (the mixture_rates lesson; plan-asserted)
    full = Window.partitionBy()
    tot_ref = F.sum("n_ref").over(full).cast("double")
    tot_cur = F.sum("n_cur").over(full).cast("double")
    p = F.col("n_ref").cast("double") / tot_ref
    q = F.col("n_cur").cast("double") / tot_cur
    contrib = F.when(p > 0, (q - p) * (q - p) / p).otherwise(F.lit(0.0))
    return per_bucket.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("q_cur"),
        F.round(contrib, 6).alias("chi2_contrib"),
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    partitions: int = 200,
    hot_threshold: float = 2.0,
) -> DataFrame:
    """Join/agg-key skew diagnostic: per-key row counts, share of total,
    the ratio to a perfectly-uniform partition load, and the salt factor
    that would spread the key back to ~uniform.

    For each key: ``skew_ratio = n_rows * partitions / total`` (1.0 ⇒ the
    key fills exactly one average partition); keys with ``skew_ratio >=
    hot_threshold`` are flagged hot and get ``salt_factor =
    ceil(skew_ratio)`` — the ``salt_factor`` to hand
    :func:`salted_join` / repartition salting. Everything is integer/
    rational arithmetic (engine-portable, hash-checkable).

    One keyed count agg (map-side combined) + a 1-row totals broadcast —
    the profile itself never shuffles more than key-cardinality rows, so
    it's safe to run on a 100 TB fact table before every big join.
    """
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("double").alias("total"))
    ratio = (
        F.col("n_rows").cast("double")
        * F.lit(float(partitions))
        / F.col("total")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("total"), 6).alias("share"),
            F.round(ratio, 6).alias("skew_ratio"),
            (ratio >= F.lit(float(hot_threshold))).alias("is_hot"),
            F.when(ratio >= F.lit(float(hot_threshold)), F.ceil(ratio))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("salt_factor"),
        )
    )


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_distance: int = 2,
    gram: int = 3,
) -> DataFrame:
    """Scalable fuzzy (edit-distance) join via q-gram blocking: instead of
    the O(N×M) cross join, each side explodes its key into character
    ``gram``-grams, candidates meet on an EQUI join over shared grams
    (strings within edit distance d share at least one q-gram when
    ``len >= q·(d+1)``), duplicate pairs are killed by the stateless
    first-shared-gram rule (the lexicographically smallest common gram —
    no DISTINCT shuffle), and the exact levenshtein verify runs only on
    candidates.

    The q-gram guarantee needs ``len >= gram·(max_distance+1)``; SHORTER
    keys are routed through one shared whole-population sentinel block
    (keys with ``len < gram·(d+1) + d`` carry it, since a valid partner of
    a short key can be at most ``d`` longer), so short-key matches are
    never silently dropped. The sentinel block is a bounded mini
    cross-join over the short-key rows only — cheap when short keys are
    rare, and LOUD in the plan (one hot join key) when they are not;
    pre-filter or lengthen keys if your corpus is dominated by them.

    → left row + right row + ``dist``. At 100 TB the shuffle carries
    (gram, row) pairs — O(rows × key_len) — versus the cross join's
    O(N×M) comparisons; frequency-skewed grams behave like any hot join
    key (salt or AQE-skew them).
    """
    cutoff = gram * (max_distance + 1)
    ext = cutoff + max_distance  # short-partner reach: len(short) + d
    sentinel = ""  # real grams are non-empty, so '' cannot collide

    # substring with a per-element start position needs the SQL lambda form
    def gram_array(col: str) -> Column:
        return F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(length({col}) - {gram - 1}, 1)), "
                f"i -> substring({col}, i, {gram}))"
            )
        )

    def block_array(col: str) -> Column:
        ln = F.length(F.col(col))
        grams_ = gram_array(col)
        sent = F.array(F.lit(sentinel))
        return (
            F.when(ln < cutoff, sent)  # guarantee void: sentinel only
            .when(ln < ext, F.array_union(grams_, sent))  # both worlds
            .otherwise(grams_)
        )

    l = left.select(
        *[F.col(c) for c in left.columns], F.explode(block_array(left_key)).alias("__g")
    )
    r = right.select(
        *[F.col(c) for c in right.columns],
        F.explode(block_array(right_key)).alias("__g"),
    )
    # stateless pair dedup: a pair meeting in several blocks is kept only
    # at its canonical one — the sentinel when both sides carry it, else
    # the lexicographically smallest shared gram
    both_sent = (F.length(F.col(left_key)) < ext) & (
        F.length(F.col(right_key)) < ext
    )
    first_shared = F.when(both_sent, F.lit(sentinel)).otherwise(
        F.array_min(F.array_intersect(gram_array(left_key), gram_array(right_key)))
    )
    dist = F.levenshtein(F.col(left_key), F.col(right_key))
    return (
        l.join(r, "__g")
        .where((F.col("__g") == first_shared) & (dist <= max_distance))
        .drop("__g")
        .withColumn("dist", dist.cast("long"))
    )


def grid_nearby_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
    cell: float | None = None,
) -> DataFrame:
    """All point pairs within Euclidean ``radius`` — the spatial
    nearby-join — without a cross join: each point is replicated to its
    3×3 neighborhood of grid cells (``cell >= radius`` guarantees any
    within-radius pair shares one of those cells), the join is an EQUI
    join of replicated-side cell vs home cell, and the exact distance
    check filters corner cases. Each qualifying pair emerges exactly
    once: the home cell is unique, and ``id_a < id_b`` keeps one
    orientation.

    → (id_a, id_b, dist_sq). Distance is squared (pure arithmetic — no
    sqrt, engine-portable). Shuffle volume is 9× the points, versus the
    cross join's N²; density per cell is the skew knob (shrink ``cell``
    toward ``radius`` in dense regions).
    """
    c = float(cell if cell is not None else radius)
    if c < radius:
        raise ValueError("cell must be >= radius for the 3x3 guarantee")

    def cell_id(x: Column, y: Column) -> Column:
        return F.floor(x / c).cast("long") * F.lit(1_000_003) + F.floor(
            y / c
        ).cast("long")

    home = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cell_id(F.col(x_col), F.col(y_col)).alias("__cell"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    repl = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("xa"),
        F.col(y_col).alias("ya"),
        F.explode(offsets).alias("o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (
            cell_id(F.col("xa"), F.col("ya"))
            + F.col("o.dx").cast("long") * F.lit(1_000_003)
            + F.col("o.dy").cast("long")
        ).alias("__cell"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        repl.join(home, "__cell")
        .where((F.col("id_a") < F.col("id_b")) & (dist_sq <= F.lit(radius * radius)))
        .select("id_a", "id_b", F.round(dist_sq, 6).alias("dist_sq"))
    )


def debounce(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Leading-edge event debounce: per key, keep an event iff the
    previous RAW event is more than ``gap_seconds`` older (or absent) —
    i.e. the first event of every gap-delimited burst, with suppression
    holding through a dense burst of any length (events 0s, 4s, 8s, 12s
    at gap=5 keep only the first: each row's predecessor is 4s away).
    The telemetry/alert-storm/duplicate-webhook filter.

    ``tie_cols`` breaks equal-timestamp order deterministically (pass
    the id column). Timestamps compare at WHOLE-second granularity
    (epoch seconds, matching the SQL twin's ``epoch_us // 1_000_000``).

    Scale shape: one keyed window (same partitioning as sessionization);
    per-key partitions, no global sort. → input rows, filtered.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(tie_cols or []))
    prev = F.lag(F.col(ts_col).cast("long")).over(w)
    keep = prev.isNull() | (
        (F.col(ts_col).cast("long") - prev) > F.lit(int(gap_seconds))
    )
    return (
        df.withColumn("__keep", keep).where(F.col("__keep")).drop("__keep")
    )
