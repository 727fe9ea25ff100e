"""Driver contract for the spark-graft builder (PySpark target).

Thin bridge onto the engine's query catalog
(``sahithi_metamorph_etl_spark.queries``): every implemented operator
from SURVEY.md §2 is a named catalog entry with a Spark DataFrame
implementation and, where SQL-expressible, a DuckDB oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sahithi_metamorph_etl_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the supplier-performance mart (reference entry
    point 2 — the richest single pipeline) on sf0.001."""
    from sahithi_metamorph_etl_spark.queries.catalog import get_query

    return get_query("mart_supplier_performance").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
