"""Window operators (SURVEY.md §2.5-2.6).

W1 (top-1 product per supplier, `m_supplier_performance_task.py:144-155`)
generalized to top-k per group — with REQUIRED deterministic tie-breakers:
the reference orders only by revenue, so equal-revenue products give a
nondeterministic "top product" run to run. Determinism is a correctness
property for this engine (hash-compared against an oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int = 1,
    rank_col: str = "RANK",
    keep_rank: bool = False,
) -> DataFrame:
    """row_number over (partition by .. order by ..) <= k.

    ``order_by`` should end with a unique tie-breaker column. row_number
    (not rank/dense_rank) keeps exactly k rows per group.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Gap-based sessionization (batch): lag + cumulative-sum of
    new-session flags. The streaming twin is
    ``streaming.events.sessionized_stream`` (native ``session_window``).

    Adds ``session_id`` (1-based per user). One shuffle on ``user_col``;
    both window passes reuse the same partitioning.
    """
    order = [F.col(ts_col)] + ([F.col(tie_breaker)] if tie_breaker else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000  # microsecond precision, no truncation
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # timestamp_diff works for both TIMESTAMP and TIMESTAMP_NTZ columns
    # (unix_micros would reject NTZ — the testdata events table is NTZ)
    new_session = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_session).over(running))
