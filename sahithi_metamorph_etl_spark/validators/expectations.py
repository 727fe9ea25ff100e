"""Declarative data-quality expectations (Deequ/dbt-test style).

The reference's gates raise on first failure (`utils.py:122-140` →
validators.checks); production pipelines also need the REPORT form —
evaluate every expectation in one pass, emit a row per check, let the
orchestrator decide what blocks. Both forms share one scan: all
violation counts are columns of a single aggregation (plus one expand
per exact uniqueness check), unpivoted like operators.profiling.

Expectations are data, not code, so a pipeline's quality contract can
live in config and the report is oracle-checkable SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    kind: str                      # not_null | unique | in_set | between | matches
    columns: tuple[str, ...]
    params: tuple[Any, ...] = field(default=())

    @property
    def name(self) -> str:
        return f"{self.kind}({', '.join(self.columns)})"


def expect_not_null(*columns: str) -> Expect:
    return Expect("not_null", columns)


def expect_unique(*columns: str) -> Expect:
    return Expect("unique", columns)


def expect_in_set(column: str, values: list) -> Expect:
    return Expect("in_set", (column,), (tuple(values),))


def expect_between(column: str, lo, hi) -> Expect:
    return Expect("between", (column,), (lo, hi))


def expect_matches(column: str, regex: str) -> Expect:
    return Expect("matches", (column,), (regex,))


def _violations(e: Expect) -> Column:
    """Count of rows (or duplicate rows, for unique) violating ``e``."""
    if e.kind == "not_null":
        cond = None
        for c in e.columns:
            n = F.col(c).isNull()
            cond = n if cond is None else (cond | n)
        return F.count(F.when(cond, 1))
    if e.kind == "unique":
        # duplicate rows = total non-null-key rows minus distinct keys
        key_ok = None
        for c in e.columns:
            nn = F.col(c).isNotNull()
            key_ok = nn if key_ok is None else (key_ok & nn)
        return F.count(F.when(key_ok, 1)) - F.count_distinct(*[F.col(c) for c in e.columns])
    if e.kind == "in_set":
        (values,) = e.params
        c = F.col(e.columns[0])
        return F.count(F.when(c.isNotNull() & ~c.isin(*values), 1))
    if e.kind == "between":
        lo, hi = e.params
        c = F.col(e.columns[0])
        return F.count(F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), 1))
    if e.kind == "matches":
        (regex,) = e.params
        c = F.col(e.columns[0])
        return F.count(F.when(c.isNotNull() & ~c.rlike(regex), 1))
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def run_expectations(df: DataFrame, expectations: list[Expect]) -> DataFrame:
    """(expectation, kind, n_rows, n_violations, passed) — one row per
    expectation, ALL computed in a single aggregation pass."""
    if not expectations:
        raise ValueError("no expectations given")
    for e in expectations:
        for c in e.columns:
            if c not in df.columns:
                raise ValueError(f"expectation {e.name}: unknown column {c!r}")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        _violations(e).cast("bigint").alias(f"__v_{i}") for i, e in enumerate(expectations)
    ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.kind).alias("kind"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{i}").alias("n_violations"),
                (F.col(f"__v_{i}") == 0).alias("passed"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def route_invalid(
    df: DataFrame, checks: dict[str, Column], reason_col: str = "failed_checks"
) -> tuple[DataFrame, DataFrame]:
    """Row-level quarantine router: ``checks`` maps check name → a
    BOOLEAN Column that is True when the row is VALID. Returns
    (valid, invalid) where invalid rows carry the array of failed
    check names — the reference raises and halts (Q1); production
    routes bad rows to a quarantine sink and keeps loading.
    Null check results count as failures (unknown ≠ valid)."""
    if not checks:
        raise ValueError("no checks given")
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in checks.items()
            ]
        )
    )
    tagged = df.withColumn(reason_col, failed)
    valid = tagged.filter(F.size(reason_col) == 0).drop(reason_col)
    invalid = tagged.filter(F.size(reason_col) > 0)
    return valid, invalid
