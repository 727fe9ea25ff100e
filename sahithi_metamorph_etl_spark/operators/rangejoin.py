"""Range (interval) join — scalar value ⋈ [lo, hi] intervals.

Spark plans a plain ``v BETWEEN lo AND hi`` join as a broadcast
nested-loop (O(n·m) comparisons) because there is no equi-key. The
scalable form is interval bucketing: quantize the value axis into
fixed-width buckets, explode each interval to the buckets it covers,
equi-join on the bucket id, and re-check the exact predicate. Work
becomes O(n + m·avg_span/width + matches) with an ordinary hash
shuffle — the same trick extends to time ranges and 2-D (geo) grids.

Choose ``bucket_width`` near the typical interval span: too small
explodes the interval side, too large degrades toward the cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def range_join_bucketed(
    values: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """INNER join of ``values`` rows onto every ``intervals`` row whose
    ``[lo_col, hi_col]`` (inclusive) contains ``value_col``. (Outer
    variants would need the exact recheck folded into the join
    condition; the post-join filter here would silently drop preserved
    null rows, so they are not offered.)"""
    v = values.withColumn(BUCKET_COL, F.floor(F.col(value_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    joined = v.join(iv, BUCKET_COL, "inner")
    return joined.filter(
        F.col(value_col).between(F.col(lo_col), F.col(hi_col))
    ).drop(BUCKET_COL)
