"""As-of (backward) join — an operator Spark's DataFrame API lacks.

For every left row, attach the LATEST right row with
``right_ts <= left_ts`` for the same key. The naive formulations are a
range theta-join (O(n·m) nested loop) or per-key collect; the scalable
form used here is the union-merge: tag both sides, union on the key,
and run ONE window pass ordered by (ts, side) where
``last(right_payload, ignorenulls=True)`` carries the most recent right
values forward onto each left row. Exactly one shuffle (the window
partitioning), no row explosion, any key cardinality.

Equal timestamps match (right sorts before left at the same ts). The
right side must be unique per (key, ts) — pre-aggregate it if not —
otherwise "the" most recent row is ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Backward as-of join: left columns + ``right_payload`` columns
    (null where no right row is at-or-before the left timestamp)."""
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    ).select(*l.columns)  # align column order for the union

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l.unionByName(r).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_payload
        ],
    )
    return merged.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_payload],
    )
