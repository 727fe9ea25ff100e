"""DuckDB oracle harness mirroring the driver's correctness gate:
run the Spark query and the oracle SQL on the same parquet tables,
then compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

from sahithi_metamorph_etl_spark.core.contracts import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_value(v):
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (int,)):
        return str(v)
    # array-valued cells: Spark toPandas and DuckDB fetchdf both hand
    # list columns back as numpy arrays — recurse elementwise (the
    # driver's comparator does the same over collect()ed lists)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    import numpy as np

    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_value(x) for x in v.tolist()) + "]"
    if pd.isna(v):
        return "∅"
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    actual = spark_df.toPandas()
    expected = run_oracle(oracle_sql, sf_dir)
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch\n spark: {sorted(actual.columns)}\n oracle: {sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), f"{name}: row count {len(actual)} != {len(expected)}"
    a, e = canon_rows(actual), canon_rows(expected)
    if a != e:
        diffs = [(x, y) for x, y in zip(a, e) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, oracle): {diffs}")
