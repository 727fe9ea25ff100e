"""In-flight pipeline metrics via ``DataFrame.observe`` — counts
without extra jobs.

The reference audits loads by calling ``.count()`` before/after writes
(SURVEY.md §2.4 A8), which re-runs the upstream pipeline once per
metric — its validator doubles every source read. Spark's observation
API attaches aggregate metrics to a plan and collects them as a side
effect of the ONE action that was happening anyway: the write both
lands the data and reports row counts / sums / null counts, with zero
additional scans.

At 100 TB this is the difference between auditing for free and paying
a full extra pass per audited table.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_write(
    df: DataFrame,
    write: Callable[[DataFrame], None],
    metrics: dict[str, Column] | None = None,
) -> dict[str, Any]:
    """Run ``write(df)`` with observation metrics attached; returns the
    collected metric values after the write completes. Default metric is
    ``n_rows``; pass any aggregate expressions::

        stats = observed_write(
            mart,
            lambda d: d.write.mode("overwrite").parquet(path),
            {"n_rows": F.count(F.lit(1)),
             "null_keys": F.sum(F.col("k").isNull().cast("bigint")),
             "total_amount": F.sum("amount")},
        )
        if stats["n_rows"] == 0: raise EmptyInputError(...)

    ONE job: the metrics ride the write's own pass over the data —
    no re-scan, no second action, no cached intermediate. The returned
    dict is the post-write audit record (row counts for reconciliation,
    null-key counts for quality gates)."""
    metrics = metrics or {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    write(observed)
    return dict(obs.get)
