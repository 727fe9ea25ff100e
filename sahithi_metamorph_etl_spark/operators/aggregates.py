"""Aggregation operators (SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups with >1 row (reference A5/Q1, `utils.py:136-140`).

    Returns (keys..., n_rows). The validator uses ``limit(1)`` on this to
    gate writes cheaply; exposed as a DataFrame so it is also a query.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def two_level_aggregate(
    df: DataFrame,
    fine_keys: list[str],
    fine_aggs: list[Column],
    coarse_keys: list[str],
    coarse_aggs: list[Column],
) -> tuple[DataFrame, DataFrame]:
    """The reference's A1→A2 cascade (`m_supplier_performance_task.py:121-141`):
    aggregate at a fine grain, then re-aggregate coarser. Returns BOTH
    levels because the fine level typically also feeds a ranking window
    (W1). Spark already does partial/final aggregation inside each
    groupBy; the cascade exists for reuse, not for performance.
    """
    fine = df.groupBy(*fine_keys).agg(*fine_aggs)
    coarse = fine.groupBy(*coarse_keys).agg(*coarse_aggs)
    return fine, coarse
