#!/usr/bin/env python
"""r15 quiet re-measure, per the r14 verdict's order #4:

- `mart_supplier_performance` is MANDATORY: the driver's r14 top ratio
  (1.92 -> 2.93s, 1.53x) was judge-adjudicated as environment noise
  from plan identity (byte-identical physical plan r13->r14, zero mart
  source changes) plus local canary math (1.13x raw ~= 0.96 adjusted),
  but it was never directly interleaved-remeasured — this closes it
  with data.
- plus any row whose r15-local canary-adjusted ratio vs
  bench_r14_local.json exceeds 1.10x (pass names as argv, computed by
  the caller from bench_r15_local.json).

NOTHING in the r15 diff touches these plans: the round's source
changes are the saturated roster swap (catalog ordering only) and the
neardup corrupted-store probe (streaming guard path, not a bench
row's plan). Hypothesis for every row is machine noise.

Protocol = scripts/remeasure_r13.py / _r14.py: noop sink, clear-cache,
FIVE interleaved canary-bracketed rounds, best-of-5, verdict on the
canary-adjusted ratio vs the r14 local archive (read from
bench_r14_local.json, not hand-copied).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sahithi_metamorph_etl_spark.core.session import get_spark  # noqa: E402
from sahithi_metamorph_etl_spark.queries.catalog import all_queries  # noqa: E402

MANDATORY = ["mart_supplier_performance"]
CHANGED: set[str] = set()
CANARY = "pricing_summary"
ROUNDS = 5


def main() -> None:
    targets = MANDATORY + [a for a in sys.argv[1:] if a not in MANDATORY]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench_r14_local.json")) as fh:
        r14 = json.load(fh)
    r14_q = r14["queries"]
    r14_canary = r14["canary"]["median_sec"]
    missing = [t for t in targets if t not in r14_q]
    assert not missing, f"targets absent from bench_r14_local.json: {missing}"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r15")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    for name in [CANARY] + targets:  # warmup
        run(name)

    canary: list[float] = []
    best: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {t: [] for t in targets}
    for _ in range(ROUNDS):
        canary.append(run(CANARY))
        for name in targets:
            el = run(name)
            all_runs[name].append(el)
            best[name] = min(best.get(name, el), el)
    canary.append(run(CANARY))

    # upper median (sorted[n//2]), NOT the interpolated median: kept for
    # cross-round comparability — the r13/r14 remeasure archives and
    # bench.py's canary median_sec all use this convention, so both
    # sides of the adjusted ratio are biased the same way. The shipped
    # artifacts additionally carry *_exact_median cross-check ratios
    # (post-processed): in r15 no verdict changes side of the 1.10
    # threshold under the true median.
    cmed = sorted(canary)[len(canary) // 2]
    out = {"canary_runs": canary, "canary_median": cmed, "queries": {}}
    for name in targets:
        adj = (best[name] / cmed) / (r14_q[name] / r14_canary)
        verdict = (
            "noise" if adj <= 1.10
            else ("changed-path (expected)" if name in CHANGED else "INVESTIGATE")
        )
        out["queries"][name] = {
            "runs": all_runs[name],
            "best": best[name],
            "r14_local": r14_q[name],
            "adj_ratio_vs_r14_local": round(adj, 3),
            "verdict": verdict,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
