"""Dependency-ordered pipeline runner with retries (reference entry
point 1: `ETL_Airflow/dags/metamorph_etl_dag.py:26-49` — an Airflow DAG
with ``retries: 3`` / 2-minute delay and the topology
``[suppliers, products, customers] >> sales >> supplier_perf >>
product_perf >> customer_report``).

The engine stays orchestrator-agnostic: this is NOT a scheduler, it is
the minimal composition primitive — declare tasks + dependencies, run
them topologically with per-task retries, skip downstream of a failure
while unrelated branches continue. A real deployment hands the same
task functions to Airflow/Dagster; tests and single-process backfills
run them here.

Driver-side only: each task typically submits Spark jobs; the runner
executes tasks sequentially in deterministic topological order
(declaration order among ready tasks). Parallel independent tasks are
an orchestrator concern — inside one SparkSession they would contend
for the same executors anyway.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class PipelineTask:
    """One unit of work. ``fn`` receives a dict of {dep name: result}."""

    name: str
    fn: Callable[[dict[str, Any]], Any]
    deps: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class TaskRun:
    status: str                       # success | failed | skipped
    attempts: int = 0
    result: Any = None
    error: BaseException | None = None


class PipelineFailure(Exception):
    def __init__(self, runs: dict[str, TaskRun]):
        self.runs = runs
        failed = [n for n, r in runs.items() if r.status == "failed"]
        skipped = [n for n, r in runs.items() if r.status == "skipped"]
        super().__init__(f"pipeline failed: failed={failed} skipped={skipped}")


def _topo_order(tasks: list[PipelineTask]) -> list[PipelineTask]:
    by_name = {}
    for t in tasks:
        if t.name in by_name:
            raise ValueError(f"duplicate task name {t.name!r}")
        by_name[t.name] = t
    for t in tasks:
        for d in t.deps:
            if d not in by_name:
                raise ValueError(f"task {t.name!r} depends on unknown task {d!r}")
    order: list[PipelineTask] = []
    done: set[str] = set()
    pending = list(tasks)  # declaration order kept among ready tasks
    while pending:
        ready = [t for t in pending if all(d in done for d in t.deps)]
        if not ready:
            cycle = [t.name for t in pending]
            raise ValueError(f"dependency cycle among {cycle}")
        for t in ready:
            order.append(t)
            done.add(t.name)
        pending = [t for t in pending if t.name not in done]
    return order


def run_pipeline(
    tasks: list[PipelineTask],
    raise_on_failure: bool = True,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, TaskRun]:
    """Run tasks in dependency order. A task failing all its attempts
    marks every transitive downstream task ``skipped``; independent
    branches still run (Airflow's default trigger rule). Returns
    {name: TaskRun}; raises :class:`PipelineFailure` (carrying the
    runs) if anything failed, unless ``raise_on_failure=False``."""
    runs: dict[str, TaskRun] = {}
    for t in _topo_order(tasks):
        bad_deps = [d for d in t.deps if runs[d].status != "success"]
        if bad_deps:
            runs[t.name] = TaskRun(status="skipped")
            continue
        upstream = {d: runs[d].result for d in t.deps}
        run = TaskRun(status="failed")
        for attempt in range(1, t.retries + 2):
            run.attempts = attempt
            try:
                run.result = t.fn(upstream)
                run.status = "success"
                run.error = None
                break
            except Exception as e:  # noqa: BLE001 — retry any task error
                run.error = e
                if attempt <= t.retries and t.retry_delay_s > 0:
                    sleep(t.retry_delay_s)
        runs[t.name] = run
    if raise_on_failure and any(r.status != "success" for r in runs.values()):
        raise PipelineFailure(runs)
    return runs
