"""REST/JSON-API source (reference S2/S3).

The reference fetches JSON driver-side and builds ``Row`` objects
(`utils.py:34-105`, `ingestion_task.py:28-39`). Same shape here, minus
the inference: records become a DataFrame under an explicit contract.
The HTTP client itself is injected (a callable returning ``list[dict]``)
so the engine has no hard dependency on any service; at real scale a
paged endpoint should be read with a DataSourceV2-style reader instead
(SURVEY.md §4 custom-rule verdict).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def rows_from_records(
    spark: SparkSession,
    records: Sequence[dict] | Callable[[], Sequence[dict]],
    schema: T.StructType,
    normalize_keys: bool = True,
) -> DataFrame:
    """Build a typed DataFrame from driver-side JSON records.

    ``normalize_keys`` applies the same key normalization as
    ``operators.projection.normalize_columns`` (strip/upper/underscores)
    so drifting API payload keys still land on the contract
    (reference behavior at `adhoc_load_sales_20250707_file.py:31-32`).
    """
    data = records() if callable(records) else records
    wanted = schema.fieldNames()
    if normalize_keys:
        # match on the NORMALIZED form of both sides, emit the schema's
        # exact field names — a lower/mixed-case contract would otherwise
        # silently null every value
        norm = lambda k: k.strip().upper().replace(" ", "_")  # noqa: E731
        data = [{norm(k): v for k, v in rec.items()} for rec in data]
        data = [{k: rec.get(norm(k)) for k in wanted} for rec in data]
    else:
        data = [{k: rec.get(k) for k in wanted} for rec in data]
    return spark.createDataFrame(data, schema=schema)
