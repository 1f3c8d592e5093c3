"""Top-k per group (SURVEY §2.12 E6).

``row_number`` over a per-group window + filter — Spark pushes the
rank predicate into the window sort (WindowGroupLimit in the physical
plan), so each partition keeps only k rows per group during the sort
instead of ranking everything. Always pass a deterministic tiebreaker.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
