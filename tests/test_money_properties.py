"""Property-based tests (hypothesis) for the deterministic money layer —
the cross-engine hazard SURVEY.md §7(3): double rounding and summation
order must produce identical bits in Spark and DuckDB for ANY input,
not just the fixtures."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sahithi_metamorph_etl_spark.functions.money import (
    davg,
    dround,
    dsum,
    money_units,
    o_davg,
    o_dsum,
    o_money_units,
    o_round,
)

# money-like doubles: what price*discount arithmetic actually produces
_money = st.floats(
    min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False, width=64
)


def _py_dround(x: float, scale: int = 2) -> float:
    f = float(10**scale)
    return math.copysign(1.0, x) * math.floor(abs(x) * f + 0.5) / f if x != 0 else 0.0


@settings(max_examples=5, deadline=None)
@given(st.lists(_money, min_size=1, max_size=300))
def test_dround_matches_python_ref_and_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [r["r"] for r in df.select(dround(F.col("x"), 2).alias("r")).collect()]
    expected = [_py_dround(v, 2) for v in values]
    assert got == expected
    con = duckdb.connect()
    oracle = [
        con.execute(f"SELECT {o_round('x', 2)} FROM (SELECT CAST(? AS double) x)", [v]).fetchone()[0]
        for v in values
    ]
    assert got == oracle


@settings(max_examples=5, deadline=None)
@given(st.lists(_money, min_size=2, max_size=300), st.randoms())
def test_dsum_is_order_independent_and_matches_duckdb(spark, values, rnd):
    shuffled = list(values)
    rnd.shuffle(shuffled)
    a = spark.createDataFrame([(v,) for v in values], "x double")
    b = spark.createDataFrame([(v,) for v in shuffled], "x double")
    ra = a.agg(dsum(F.col("x"), 2).alias("s")).first()["s"]
    rb = b.agg(dsum(F.col("x"), 2).alias("s")).first()["s"]
    assert ra == rb  # integer micro-unit accumulation: order can't move the total
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x double)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    oracle = con.execute(f"SELECT {o_dsum('x', 2)} FROM t").fetchone()[0]
    assert ra == oracle


def _py_units(x: float) -> int:
    # the Python reference of money_units: half-away on x*1e6 with the
    # same IEEE op sequence (sign/abs/mul/add/floor)
    return int(math.copysign(1.0, x) * math.floor(abs(x) * 1e6 + 0.5)) if x != 0 else 0


@settings(max_examples=5, deadline=None)
@given(st.lists(_money, min_size=1, max_size=300))
def test_money_units_matches_python_ref_and_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [r["u"] for r in df.select(money_units(F.col("x")).alias("u")).collect()]
    assert got == [_py_units(v) for v in values]
    con = duckdb.connect()
    oracle = [
        con.execute(
            f"SELECT {o_money_units('x')} FROM (SELECT CAST(? AS double) x)", [v]
        ).fetchone()[0]
        for v in values
    ]
    assert got == oracle
    # dsum equals the integer-unit reference end-to-end
    s = df.agg(dsum(F.col("x"), 2).alias("s")).first()["s"]
    assert s == _py_dround(sum(_py_units(v) for v in values) / 1e6, 2)


@settings(max_examples=5, deadline=None)
@given(st.lists(_money, min_size=1, max_size=200))
def test_davg_matches_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(davg(F.col("x"), 4).alias("a")).first()["a"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x double)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    oracle = con.execute(f"SELECT {o_davg('x', 4)} FROM t").fetchone()[0]
    assert got == oracle


def test_usum_overflow_boundary_is_loud_and_checked_sum_routes(spark):
    """Pin the documented usum boundary: past ~9.2e12 money units the
    bigint micro-unit accumulator must FAIL LOUDLY (ANSI overflow — the
    DuckDB oracle silently promotes to HUGEINT there, so a silent Spark
    wrap would be a cross-engine divergence), and checked_sum must route
    such a declared bound onto the exact decimal path and keep going."""
    import pytest

    from sahithi_metamorph_etl_spark.functions.money import (
        _USUM_MAX_ABS_TOTAL,
        checked_sum,
        dec_sum,
        usum,
    )

    big = 9.0e12  # each row near the single-row ceiling
    df = spark.createDataFrame([(big,), (big,), (big,)], "v double")
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        df.agg(usum(F.col("v")).alias("s")).collect()

    routed = df.agg(checked_sum(F.col("v"), max_abs_total=3 * big).alias("s")).collect()[0]["s"]
    exact = df.agg(dec_sum(F.col("v")).alias("s")).collect()[0]["s"]
    assert routed == float(round(exact, 2))

    # below the (headroomed) boundary the fast path is taken and agrees
    small = spark.createDataFrame([(1.25,), (2.50,), (-0.75,)], "v double")
    fast = small.agg(checked_sum(F.col("v"), max_abs_total=1e6).alias("s")).collect()[0]["s"]
    assert fast == 3.0
    assert _USUM_MAX_ABS_TOTAL > 9.2e12
