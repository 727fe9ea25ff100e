"""Physical-plan guards: make plan shape a TESTABLE contract.

At 100 TB the difference between a good and a catastrophic run is plan
shape — a filter that stopped reaching the scan, a dimension join that
silently fell back from broadcast to sort-merge, a Python stage that
crept into a hot path. Those regressions pass every row-level test; the
only way to catch them in CI is to assert on the plan itself. PLANS.md
documents the audited shapes; this module makes the same counters
available programmatically so pipelines (and this repo's tests) can pin
them.

Counters are string-level over the executed plan — intentionally: the
physical-node class names (`Exchange`, `BroadcastExchange`,
`SortMergeJoin`, `PushedFilters: [...`, `...InPandas`,
`BatchEvalPython`) are the stable public surface Spark prints, and a
string count survives Spark minor-version node refactors better than
walking private plan trees.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanSummary:
    shuffles: int            # every shuffle Exchange (hash/range/round-robin/single-partition)
    broadcasts: int          # BroadcastExchange nodes
    sort_merge_joins: int
    broadcast_hash_joins: int
    pushed_filter_scans: int  # scans with a NON-empty PushedFilters list
    python_stages: int       # mapInPandas/applyInPandas/row-UDF stages
    file_scans: int          # FileScan/BatchScan source nodes (re-scan detector)
    unpartitioned_windows: int = 0  # Window nodes with NO partition spec (single-partition funnels)
    # Of the above, how many sit INSIDE an InMemoryRelation subtree —
    # the cache-BUILD plan a persisted frame prints under every
    # InMemoryTableScan consumer. Those stages run ONCE at
    # materialization, not per consumer, so a static count that
    # includes them overstates per-run work (e.g. the minhash band
    # frame: its Arrow signature stage appears under each of many
    # band self-join branches but executes a single time).
    python_stages_cached: int = 0
    shuffles_cached: int = 0


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _count_unpartitioned_windows(plan: str) -> int:
    """Window nodes whose spec has no PARTITION BY — the plan line is
    ``Window [exprs], [order]`` (two top-level bracket groups) versus
    ``Window [exprs], [partition], [order]`` (three). These are the
    nodes Spark warns about with "No Partition Defined ... moving all
    data to a single partition" — the classic 100 TB scale-killer.
    Bracket groups are counted with a depth scan so brackets inside
    expressions cannot miscount."""
    n = 0
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*")
        if not stripped.startswith("Window "):
            continue
        depth = groups = 0
        for ch in stripped:
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups == 2:
            n += 1
    return n


def _cached_line_mask(plan: str) -> list[bool]:
    """True per line when the line sits inside an ``InMemoryRelation``
    subtree (the cache-build plan). Tree membership follows the print
    indentation: a node's children render strictly deeper, so a line at
    depth <= the relation's depth closes the subtree. Depth = offset of
    the node name past the `` :+-*`` tree-drawing prefix."""
    mask: list[bool] = []
    stack: list[int] = []  # depths of open InMemoryRelation nodes
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*")
        depth = len(line) - len(stripped)
        if stripped:
            while stack and depth <= stack[-1]:
                stack.pop()
        mask.append(bool(stack))
        if stripped.startswith("InMemoryRelation"):
            stack.append(depth)
    return mask


def plan_summary(df: DataFrame) -> PlanSummary:
    """Count the scale-relevant physical operators in ``df``'s plan
    (pre-execution; AQE may further coalesce at runtime, it does not add
    exchanges or joins). ``python_stages_cached``/``shuffles_cached``
    report the subset of those counts that live under an
    ``InMemoryRelation`` (one-time cache-build work, not per-run)."""
    plan = _plan_string(df)
    cached = _cached_line_mask(plan)
    lines = plan.splitlines()
    py_cached = sum(
        len(re.findall(r"InPandas|BatchEvalPython|ArrowEvalPython", ln))
        for ln, c in zip(lines, cached) if c
    )
    shuf_cached = sum(
        len(re.findall(r"(?<![A-Za-z])Exchange ", ln))
        for ln, c in zip(lines, cached) if c
    )
    # count every shuffle Exchange variant: a guard that missed
    # RoundRobinPartitioning (df.repartition(n) / REBALANCE hints) would
    # pass while a full-data round-robin shuffle crept into a pinned
    # plan. "Exchange" at a node boundary excludes BroadcastExchange,
    # which is tracked separately (broadcasting a dim is the GOOD case).
    shuffle_exchanges = len(re.findall(r"(?<![A-Za-z])Exchange ", plan))
    return PlanSummary(
        shuffles=shuffle_exchanges,
        broadcasts=plan.count("BroadcastExchange"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        pushed_filter_scans=len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        python_stages=len(re.findall(r"InPandas|BatchEvalPython|ArrowEvalPython", plan)),
        # every source scan node: N scans of the same table = N reads of
        # it (how an operator that "only" adds probe passes shows up)
        file_scans=len(re.findall(r"FileScan|BatchScan", plan)),
        unpartitioned_windows=_count_unpartitioned_windows(plan),
        python_stages_cached=py_cached,
        shuffles_cached=shuf_cached,
    )


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    min_pushed_filter_scans: int | None = None,
    forbid_python: bool = False,
    forbid_sort_merge_join: bool = False,
    require_broadcast_joins: int | None = None,
) -> PlanSummary:
    """Raise ``AssertionError`` (with the offending counts) when the
    plan violates the stated shape; returns the summary for further
    checks. Use in pipeline CI next to row-level tests::

        assert_plan(mart_df, max_shuffles=6, forbid_python=True)
    """
    s = plan_summary(df)
    errs = []
    if max_shuffles is not None and s.shuffles > max_shuffles:
        errs.append(f"shuffles {s.shuffles} > max {max_shuffles}")
    if min_pushed_filter_scans is not None and s.pushed_filter_scans < min_pushed_filter_scans:
        errs.append(
            f"pushed-filter scans {s.pushed_filter_scans} < required {min_pushed_filter_scans}"
        )
    if forbid_python and s.python_stages:
        errs.append(f"{s.python_stages} Python stage(s) in a plan declared JVM-only")
    if forbid_sort_merge_join and s.sort_merge_joins:
        errs.append(f"{s.sort_merge_joins} sort-merge join(s) in a plan declared broadcast-only")
    if require_broadcast_joins is not None and s.broadcast_hash_joins < require_broadcast_joins:
        errs.append(
            f"broadcast-hash joins {s.broadcast_hash_joins} < required {require_broadcast_joins}"
        )
    if errs:
        raise AssertionError("plan-shape violation: " + "; ".join(errs))
    return s
