"""Incremental (high-water-mark) ingestion.

The reference emulates incrementality with daily Airflow runs +
``DAY_DT`` partitions; the general pattern — read only rows newer than
the last successfully loaded watermark, then advance the watermark —
works for any monotonic column (event time, auto-increment id, CDC
LSN) and any source.

Scale notes: the predicate is a plain comparison, so it reaches the
source as a parquet row-group filter (`PushedFilters`) or a JDBC WHERE
clause (via ``jdbc_query_source``) — an incremental load scans new
data only, not the table. `advance_watermark` is ONE max() action over
the slice just read (aggregate pushdown applies for parquet).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_slice(df: DataFrame, watermark_col: str, last_value: Any | None) -> DataFrame:
    """Rows strictly newer than ``last_value`` (None = initial full
    load). Strict inequality means re-runs with the same watermark are
    idempotent as long as the watermark column is monotonic per commit
    batch — the standard high-water-mark contract."""
    if last_value is None:
        return df
    # cast the literal to the column's own type: a naive datetime literal
    # becomes TIMESTAMP (session-tz); casting it to a TIMESTAMP_NTZ
    # column's type round-trips through the same session tz, so the
    # comparison is deterministic regardless of session timezone — and
    # stays a pushable scalar predicate either way. The lookup is
    # case-insensitive to match the analyzer's default column
    # resolution; an unknown name falls through and lets the analyzer
    # raise its own (clearer) error.
    types = {f.name.lower(): f.dataType for f in df.schema.fields}
    bound = F.lit(last_value)
    if watermark_col.lower() in types:
        bound = bound.cast(types[watermark_col.lower()])
    return df.filter(F.col(watermark_col) > bound)


def advance_watermark(df: DataFrame, watermark_col: str) -> Any | None:
    """New high-water mark: max(watermark_col) over the slice just
    processed (None if the slice was empty). Persist this value in the
    pipeline's state store and feed it to the next incremental_slice."""
    row = df.agg(F.max(watermark_col).alias("hwm")).first()
    return row["hwm"] if row else None
