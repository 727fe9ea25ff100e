"""Deterministic money rounding.

Spark's ``round()`` on doubles goes through the shortest decimal
representation (BigDecimal HALF_UP) while DuckDB and most other engines
round in binary float math — the two disagree whenever the true product
lands on an exact ``x.xx5`` boundary, which happens constantly for
2-decimal prices times 2-decimal discount factors (SURVEY.md §7 hazard
(3), observed in practice on the customer-sales-report mart).

``dround`` is round-half-away-from-zero computed with plain IEEE ops
(sign/abs/mul/add/floor/div) so ANY engine that evaluates the same
expression on the same double produces the same bits. The catalog uses
it on every monetary output; ``o_round`` emits the identical expression
for the DuckDB oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(c: Column, scale: int = 2) -> Column:
    """Round half away from zero, bit-reproducible across engines."""
    f = float(10 ** scale)
    return F.signum(c) * F.floor(F.abs(c) * f + F.lit(0.5)) / f


def o_round(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`dround` (same IEEE op sequence)."""
    f = float(10 ** scale)
    return f"(sign({expr}) * floor(abs({expr}) * {f} + 0.5) / {f})"


# --- exact (order-independent) money aggregation --------------------------
#
# A double sum depends on partition/accumulation ORDER, so two engines can
# disagree by an ulp — which flips a 2dp rounding whenever the true total
# lands on a .005 boundary (common: prices and discounts are 2dp decimals).
# Money aggregates therefore sum in DECIMAL(38,6): the per-row double →
# decimal conversion is a pure function of the double's bits, decimal
# addition is exact and order-independent, and decimal rounding is
# half-away-from-zero in both Spark (HALF_UP) and DuckDB.

_DEC = "decimal(38,6)"


def dec_sum(c: Column) -> Column:
    """Exact decimal sum of a money expression (keep for reuse/ordering)."""
    return F.sum(c.cast(_DEC))


def dsum(c: Column, scale: int = 2) -> Column:
    """Deterministic rounded sum of a money column, returned as double."""
    return F.round(dec_sum(c), scale).cast("double")


def davg(c: Column, scale: int = 2) -> Column:
    """Deterministic rounded mean: exact decimal sum → double → /count."""
    return dround(dec_sum(c).cast("double") / F.count(c), scale)


def o_dec_sum(expr: str) -> str:
    return f"sum(CAST({expr} AS DECIMAL(38,6)))"


def o_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(round({o_dec_sum(expr)}, {scale}) AS double)"


def o_davg(expr: str, scale: int = 2) -> str:
    return o_round(f"(CAST({o_dec_sum(expr)} AS double) / count({expr}))", scale)
