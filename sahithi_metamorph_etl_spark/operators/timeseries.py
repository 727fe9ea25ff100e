"""Time-series densification: per-key daily gap-fill with zero-fill /
forward-fill — the "resample('1D')" of a warehouse fact table.

The reference's marts aggregate per run_date and leave activity gaps
implicit; downstream consumers (charts, window features, training-label
joins) usually need EVERY calendar day present per key. This operator
densifies an already per-(key, day) aggregated frame.

SCALE SHAPE: one span aggregate per key (map-side combined), a
``sequence``-explode that generates exactly the semantic output rows
(each key's min..max day — no cross join against a global calendar
dimension, so a key active for one week costs seven rows even when the
table spans decades), one (key, day) left join back, and per-key
PARTITIONED windows for the forward fill — no un-partitioned window
anywhere, no driver actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    zero_fill: list[str] = (),
    ffill: list[str] = (),
) -> DataFrame:
    """Densify a per-(key, day) frame to every calendar day between
    each key's first and last observed day.

    Generated days get 0 in ``zero_fill`` columns (additive metrics:
    counts, sums) and the last observed value in ``ffill`` columns
    (state-like metrics: prices, balances; leading days before the
    first observation stay NULL by construction — there is nothing to
    carry). Columns in neither list pass through as NULL on generated
    days. Input must be unique per (key, day).
    """
    overlap = set(zero_fill) & set(ffill)
    if overlap:
        raise ValueError(f"columns in both zero_fill and ffill: {sorted(overlap)}")
    missing = [c for c in [*zero_fill, *ffill] if c not in df.columns]
    if missing:
        raise ValueError(f"fill columns not in frame: {missing}")
    spans = df.groupBy(*key_cols).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    days = spans.select(
        *key_cols, F.explode(F.sequence("__d0", "__d1")).alias(date_col)
    )
    joined = days.join(df, [*key_cols, date_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_cols = []
    for c in joined.columns:
        if c in zero_fill:
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif c in ffill:
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
