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
