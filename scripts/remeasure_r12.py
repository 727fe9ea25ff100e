#!/usr/bin/env python
"""r12 quiet re-measure of the seven queries the r12 bench flagged as
>10% canary-adjusted vs the archived r11 per-query map (bench protocol:
re-run interleaved A/B only when a ratio exceeds 1.10x).

Two of the seven CHANGED code this round and a real delta is the
expected outcome, not noise:
- emb_random_projection: the graded entry now posexplodes to scalar
  (vec_id, j, value) rows — ~64x more (narrow) output rows by design.
- emb_rp_rerank_topk: the rerank query side is now bounded by a
  left-semi join against the candidate ids (the r11 ADVICE fix for the
  unbounded broadcast) — one extra join/distinct per call.
The other five are unchanged paths; hypothesis = machine noise.

Protocol = scripts/remeasure_r11.py: noop sink, clear-cache, FIVE
interleaved canary-bracketed rounds, best-of-5, verdict on the
canary-adjusted ratio vs r11.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sahithi_metamorph_etl_spark.core.session import get_spark  # noqa: E402
from sahithi_metamorph_etl_spark.queries.catalog import all_queries  # noqa: E402

TARGETS = [
    "doc_dsir_weights",
    "emb_lsh_mp_topk",
    "emb_random_projection",
    "emb_rp_rerank_topk",
    "corpus_clean_pipeline",
    "supplier_part_agg",
    "doc_containment_pairs",
]
CHANGED = {"emb_random_projection", "emb_rp_rerank_topk"}
# bench_r11_local.json archived values (sf0.1, best-of-2, same protocol)
R11 = {
    "doc_dsir_weights": 0.901,
    "emb_lsh_mp_topk": 1.358,
    "emb_random_projection": 0.852,
    "emb_rp_rerank_topk": 2.752,
    "corpus_clean_pipeline": 0.913,
    "supplier_part_agg": 0.78,
    "doc_containment_pairs": 2.154,
}
R11_CANARY = 0.454
CANARY = "pricing_summary"
ROUNDS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r12")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    for name in [CANARY] + TARGETS:  # warmup
        run(name)

    canary: list[float] = []
    best: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {t: [] for t in TARGETS}
    for _ in range(ROUNDS):
        canary.append(run(CANARY))
        for name in TARGETS:
            el = run(name)
            all_runs[name].append(el)
            best[name] = min(best.get(name, el), el)
    canary.append(run(CANARY))

    cmed = sorted(canary)[len(canary) // 2]
    out = {"canary_runs": canary, "canary_median": cmed, "queries": {}}
    for name in TARGETS:
        adj = (best[name] / cmed) / (R11[name] / R11_CANARY)
        verdict = (
            "noise" if adj <= 1.10
            else ("changed-path (expected)" if name in CHANGED else "INVESTIGATE")
        )
        out["queries"][name] = {
            "runs": all_runs[name],
            "best": best[name],
            "r11": R11[name],
            "adj_ratio_vs_r11": round(adj, 3),
            "verdict": verdict,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
