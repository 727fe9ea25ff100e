"""Projection / rename / schema-drift operators (SURVEY.md §2.2).

The reference handles column drift two ways: positional rename ladders
(`ingestion_task.py:42-46,100-108,159-164,215-224` — P2) and name
normalization (`adhoc_load_sales_20250707_file.py:31-32` — P3). Both are
first-class, reusable operators here, plus an explicit contract
conformer (name-based with positional fallback) since drifted headers
are a recurring production incident in the reference
(SampleData/Customers_20250315.csv trailing-comma header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_columns(df: DataFrame) -> DataFrame:
    """strip / upper-case / spaces→underscores on every column name."""
    return df.toDF(*[c.strip().upper().replace(" ", "_") for c in df.columns])


def rename_positional(df: DataFrame, names: list[str]) -> DataFrame:
    """Positional rename (reference P2). Extra trailing columns (e.g. a
    phantom column from a trailing-comma CSV header) are dropped; missing
    trailing columns raise."""
    if len(df.columns) < len(names):
        raise ValueError(f"need {len(names)} columns, source has {len(df.columns)}: {df.columns}")
    kept = df.columns[: len(names)]
    return df.select([F.col(f"`{old}`").alias(new) for old, new in zip(kept, names)])


def conform_to_contract(
    df: DataFrame,
    schema: T.StructType,
    positional_fallback: bool = True,
    missing_as_null: bool = False,
) -> DataFrame:
    """Project ``df`` onto an explicit contract.

    1. normalize source names; match contract fields by name (case-blind)
    2. unmatched contract fields: positional fallback (if enabled) over
       the still-unclaimed source columns, else null (if allowed), else
       raise
    3. cast every matched column to the contract type

    This subsumes the reference's drift-repair scripts
    (`adhoc_column_mismatch_20250711_file.py`) as one declarative op.
    """
    norm_src = {c.strip().upper().replace(" ", "_"): c for c in df.columns}
    claimed: set[str] = set()
    by_position = [c for c in df.columns]
    out = []
    for i, field in enumerate(schema.fields):
        key = field.name.strip().upper().replace(" ", "_")
        src = norm_src.get(key)
        if src is not None and src not in claimed:
            claimed.add(src)
            out.append(F.col(f"`{src}`").cast(field.dataType).alias(field.name))
        elif positional_fallback and i < len(by_position) and by_position[i] not in claimed:
            src = by_position[i]
            claimed.add(src)
            out.append(F.col(f"`{src}`").cast(field.dataType).alias(field.name))
        elif missing_as_null:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            raise ValueError(f"contract column {field.name!r} not found in {df.columns}")
    return df.select(out)
