#!/usr/bin/env python
"""r16 quiet re-measure, per the r15 verdict's order #3 and the
ADVICE_r15 median-of-5 item:

- `doc_pack_sequences` and `parts_fuzzy_match` are MANDATORY: both
  left r15 as INVESTIGATE in the committed remeasure artifacts (0.56 /
  0.69 s rows where timer noise dominates). The r15 verdict already
  adjudicated them noise by triangulation (plans byte-identical to the
  r14 audit; global-best adjusted ratios vs the quiet r13 archive
  1.047 / 0.982); this run closes them with a direct measurement whose
  verdict RULE uses the triangulation protocol, not only the noisy
  r14/r15 denominators.
- plus any row whose r16-local canary-adjusted ratio vs
  bench_r15_local.json exceeds 1.10x (names passed as argv, computed
  by the caller from bench_r16_local.json).

Protocol = scripts/remeasure_r15.py (noop sink, clear-cache, FIVE
interleaved canary-bracketed rounds) with two r16 upgrades from
ADVICE_r15:

1. median-of-5 is RECORDED alongside best-of-5 for every row, and the
   adjusted ratios are reported under both statistics — best-of-5 vs a
   single-pass archive biases ratios toward "noise", so a small real
   regression could hide; the median column removes that bias (the
   archive side stays the single bench pass, so median-adjusted ratios
   are conservative, i.e. biased AGAINST us).
2. sub-second rows (archive < 1.0 s) are triangulated against the
   QUIET r13 archive (bench_r13_local.json, canary 0.487 — the lowest
   canary on record) as the denominator of record: the r14/r15
   archives were captured under elevated canaries (0.563-0.663),
   which deflates their sub-second denominators and manufactures
   spurious >1.10x ratios. A sub-second row is noise if its
   canary-adjusted ratio vs the r13 quiet archive is <= 1.10 (plan
   byte-identity is checked separately by the plan_audit_r16 diff,
   expected zero diffs round-wide).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sahithi_metamorph_etl_spark.core.session import get_spark  # noqa: E402
from sahithi_metamorph_etl_spark.queries.catalog import all_queries  # noqa: E402

MANDATORY = ["doc_pack_sequences", "parts_fuzzy_match"]
CHANGED: set[str] = set()  # r16 touches no bench row's plan
CANARY = "pricing_summary"
ROUNDS = 5


def _upper_median(xs: list[float]) -> float:
    # sorted[n//2], NOT interpolated: the convention every archive's
    # canary median_sec uses, kept so both ratio sides bias the same way
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    targets = MANDATORY + [a for a in sys.argv[1:] if a not in MANDATORY]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    archives = {}
    for rnd in ("r13", "r15"):
        with open(os.path.join(repo, f"bench_{rnd}_local.json")) as fh:
            archives[rnd] = json.load(fh)
    r15_q = archives["r15"]["queries"]
    r15_canary = archives["r15"]["canary"]["median_sec"]
    r13_q = archives["r13"]["queries"]
    r13_canary = archives["r13"]["canary"]["median_sec"]
    missing = [t for t in targets if t not in r15_q]
    assert not missing, f"targets absent from bench_r15_local.json: {missing}"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r16")
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
    all_runs: dict[str, list[float]] = {t: [] for t in targets}
    for _ in range(ROUNDS):
        canary.append(run(CANARY))
        for name in targets:
            all_runs[name].append(run(name))
    canary.append(run(CANARY))

    cmed = _upper_median(canary)
    out = {"canary_runs": canary, "canary_median": cmed, "queries": {}}
    for name in targets:
        best = min(all_runs[name])
        med = _upper_median(all_runs[name])
        adj_best = (best / cmed) / (r15_q[name] / r15_canary)
        adj_med = (med / cmed) / (r15_q[name] / r15_canary)
        row = {
            "runs": all_runs[name],
            "best": best,
            "median": med,
            "r15_local": r15_q[name],
            "adj_best_vs_r15_local": round(adj_best, 3),
            "adj_median_vs_r15_local": round(adj_med, 3),
        }
        sub_second = r15_q[name] < 1.0 or best < 1.0
        if sub_second and name in r13_q:
            adj_b13 = (best / cmed) / (r13_q[name] / r13_canary)
            adj_m13 = (med / cmed) / (r13_q[name] / r13_canary)
            row["r13_quiet_local"] = r13_q[name]
            row["adj_best_vs_r13_quiet"] = round(adj_b13, 3)
            row["adj_median_vs_r13_quiet"] = round(adj_m13, 3)
            decisive = adj_b13  # quiet archive is the record for sub-second
        else:
            decisive = adj_best
        row["verdict"] = (
            "noise" if decisive <= 1.10
            else ("changed-path (expected)" if name in CHANGED else "INVESTIGATE")
        )
        out["queries"][name] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
