"""As-of join (backward and forward) — an operator Spark's DataFrame
API lacks.

For every left row, attach the LATEST right row with
``right_ts <= left_ts`` (backward) or the EARLIEST right row with
``right_ts >= left_ts`` (forward) for the same key. The naive
formulations are a
range theta-join (O(n·m) nested loop) or per-key collect; the scalable
form used here is the union-merge: tag both sides, union on the key,
and run ONE window pass ordered by (ts, side) where
``last(struct(right_payload), ignorenulls=True)`` carries the most
recent right row forward onto each left row. Exactly one shuffle (the
window partitioning), no row explosion, any key cardinality.

The payload travels as a single struct so every output column comes
from the SAME matched right row — matching DuckDB ``ASOF JOIN``, which
returns the matched row wholesale including its legitimate NULLs.
(Carrying columns independently would let an older row's non-null value
leak into a newer row's NULL slot.)

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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left columns + ``right_payload`` columns (null where
    no right row qualifies).

    ``direction="backward"`` (default) attaches the LATEST right row
    with ``right_ts <= left_ts``; ``"forward"`` attaches the EARLIEST
    right row with ``right_ts >= left_ts`` (the mirrored window: right
    rows sort after same-ts left rows and ``first()`` looks forward).
    Equal timestamps match in both directions. Same plan shape either
    way — one shuffle, no row explosion."""
    from pyspark.sql.types import StructField, StructType

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    backward = direction == "backward"
    left_cols = left.columns
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_payload]
    )
    # side ordering puts the right row INSIDE the left row's frame at
    # equal timestamps: right before left when looking backward, right
    # after left when looking forward
    left_side, right_side = (1, 0) if backward else (0, 1)
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        # One struct per right row: the window's last()/first() then
        # carries the whole matched row, so a NULL inside the payload
        # stays NULL.
        F.struct(*[F.col(c) for c in right_payload]).alias("__r"),
    ).select(*l.columns)  # align column order for the union

    w = Window.partitionBy(*on).orderBy("__ts", "__side")
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        carry = F.last("__r", ignorenulls=True)
    else:
        w = w.rowsBetween(0, Window.unboundedFollowing)
        carry = F.first("__r", ignorenulls=True)
    merged = l.unionByName(r).select("*", carry.over(w).alias("__m"))
    return merged.filter(F.col("__side") == left_side).select(
        *left_cols,
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_payload],
    )
