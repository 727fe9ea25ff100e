#!/usr/bin/env python
"""r11 quiet re-measure of the seven queries the r10 bench flagged as
>10% canary-adjusted regressions vs r9 (VERDICT r10 "What's wrong" #2).

None of the seven code paths changed in r10, and the r10 bench session
was load-noisy (canary swung 0.445-0.75 across runs), so the working
hypothesis is machine noise. Protocol here: same noop-sink/clear-cache
methodology as bench.py, but each query is timed in FIVE interleaved
rounds bracketed by canary runs (canary, q1..q7, canary, q1..q7, ...)
and we take best-of-5 — interleaving spreads any load transient across
all queries instead of biasing one, and best-of-N is the steady state.

Verdict against r9: ratio = (best_now / canary_now_median) /
(r9_sec / r9_canary_median). Within ~1.10 => noise confirmed.
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
    "multimodal_wav_roundtrip",
    "doc_rarity_score",
    "events_cumulative_new_users",
    "multimodal_audio_stats",
    "doc_minhash_lsh_pairs",
    "corpus_vocabulary",
    "recon_bucketed_zero_shuffle",
]
# BENCH_r09/BENCH_r10 archived values (sf0.1, best-of-2, same protocol)
R9 = {
    "multimodal_wav_roundtrip": 0.292,
    "doc_rarity_score": 0.477,
    "events_cumulative_new_users": 0.427,
    "multimodal_audio_stats": 0.327,
    "doc_minhash_lsh_pairs": 1.966,
    "corpus_vocabulary": 0.417,
    "recon_bucketed_zero_shuffle": 1.258,
}
R9_CANARY = 0.424
R10 = {
    "multimodal_wav_roundtrip": 0.434,
    "doc_rarity_score": 0.633,
    "events_cumulative_new_users": 0.56,
    "multimodal_audio_stats": 0.418,
    "doc_minhash_lsh_pairs": 2.482,
    "corpus_vocabulary": 0.517,
    "recon_bucketed_zero_shuffle": 1.542,
}
R10_CANARY = 0.468
CANARY = "pricing_summary"
ROUNDS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r11")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    # warmup (codegen, Python workers, page cache)
    for name in [CANARY] + TARGETS:
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
        adj_vs_r9 = (best[name] / cmed) / (R9[name] / R9_CANARY)
        adj_vs_r10 = (best[name] / cmed) / (R10[name] / R10_CANARY)
        out["queries"][name] = {
            "runs": all_runs[name],
            "best": best[name],
            "r9": R9[name],
            "r10": R10[name],
            "adj_ratio_vs_r9": round(adj_vs_r9, 3),
            "adj_ratio_vs_r10": round(adj_vs_r10, 3),
            "verdict": "noise" if adj_vs_r9 <= 1.10 else "INVESTIGATE",
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
