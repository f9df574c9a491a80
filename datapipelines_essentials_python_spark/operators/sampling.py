"""Deterministic sampling operators for training-data pipelines.

At 100 TB you never want ``rand()`` sampling: it is not reproducible across
retries, recomputations, or engines, and a lost executor re-draws its rows.
Every sampler here derives its keep/drop decision from an md5 hash of the
row's id, so the sample is

- deterministic (same rows on every run, every engine, every cluster size),
- a pure narrow projection (no shuffle, no state, stream-at-scan-speed),
- oracle-checkable (the SQL twin runs the same md5 arithmetic).

The salt string partitions the hash space, so independent samples are drawn
with different salts (e.g. train/validation splits that provably do not
correlate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(col: Column | str, salt: str = "") -> Column:
    """Uniform [0, 1) value derived from md5(salt|id): the first 8 hex chars
    as a 32-bit integer over 2^32. Deterministic and portable."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def uniform_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, keyed on ``id_col``."""
    return df.where(hash_fraction(id_col, salt) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling — the standard rebalancing move
    for training corpora (e.g. downsample English, keep all low-resource
    languages).

    ``fractions`` maps stratum value → keep fraction; strata not listed get
    ``default_fraction``. One narrow projection, no shuffle: the stratum
    rate lookup is a literal CASE chain, the keep decision a hash compare.
    """
    rate: Column = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(rate)
    return df.where(hash_fraction(id_col, salt) < rate)


def split_train_holdout(
    df: DataFrame, id_col: str, holdout_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic disjoint train/holdout split (same hash, one compare):
    a row is in exactly one side on every engine and every rerun."""
    frac = hash_fraction(id_col, salt)
    return df.where(frac >= holdout_fraction), df.where(frac < holdout_fraction)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    salt: str = "",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    ``weight`` (a per-row Column in [0, 1] — e.g. a quality score, a
    mixture weight, a per-domain rate).

    The keep decision is ``hash_fraction(id) < weight`` — still a pure
    narrow projection, still reproducible across runs/engines/cluster
    sizes, unlike ``df.sample``/``rand()``. This is the standard
    quality-weighted data-mixing move for training corpora: higher-quality
    documents survive proportionally more often, with zero shuffle cost.
    """
    return df.where(hash_fraction(id_col, salt) < weight)
