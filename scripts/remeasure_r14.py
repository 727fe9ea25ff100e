#!/usr/bin/env python
"""r14 quiet re-measure of the fourteen queries whose r14-local bench
rows exceeded 1.10x canary-adjusted vs bench_r13_local.json (bench
protocol: re-run interleaved A/B only when a ratio exceeds 1.10x).

NONE of the fourteen changed code this round — the r14 diff touches
the quantized scans only through (a) the rerank=None budget floor
(every bench row pins an explicit rerank) and (b) the survivor-list
broadcast guard, which leaves bounded entries' plans identical (the
hint still applies under the 1M-row bound; pinned by
test_adc_exact_rerank_broadcast_guard). The r14 bench also ran with a
canary median 1.21x over r13 (sandbox load, the same uniform shift
the canary protocol attributed in r12 and r13), so the hypothesis for
every row is machine noise.

Protocol = scripts/remeasure_r13.py: noop sink, clear-cache, FIVE
interleaved canary-bracketed rounds, best-of-5, verdict on the
canary-adjusted ratio vs the r13 local archive.
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
    "events_sessionization",
    "emb_sq8_topk",
    "customer_scd2_asof",
    "emb_kmeans_clusters",
    "customer_scd2_chain",
    "emb_random_projection",
    "doc_repetition_stats",
    "mart_customer_sales_report",
    "doc_neardup_incremental",
    "doc_rarity_score",
    "orders_price_quantile_hist",
    "doc_dsir_sample",
    "emb_cosine_topk",
    "mart_product_performance",
]
CHANGED: set[str] = set()
# bench_r13_local.json archived values (sf0.1, same protocol)
R13 = {
    "events_sessionization": 0.425,
    "emb_sq8_topk": 1.327,
    "customer_scd2_asof": 0.455,
    "emb_kmeans_clusters": 1.462,
    "customer_scd2_chain": 1.168,
    "emb_random_projection": 0.998,
    "doc_repetition_stats": 1.23,
    "mart_customer_sales_report": 4.323,
    "doc_neardup_incremental": 2.078,
    "doc_rarity_score": 0.496,
    "orders_price_quantile_hist": 0.898,
    "doc_dsir_sample": 1.222,
    "emb_cosine_topk": 0.471,
    "mart_product_performance": 1.635,
}
R13_CANARY = 0.487
CANARY = "pricing_summary"
ROUNDS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r14")
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
        adj = (best[name] / cmed) / (R13[name] / R13_CANARY)
        verdict = (
            "noise" if adj <= 1.10
            else ("changed-path (expected)" if name in CHANGED else "INVESTIGATE")
        )
        out["queries"][name] = {
            "runs": all_runs[name],
            "best": best[name],
            "r13_local": R13[name],
            "adj_ratio_vs_r13_local": round(adj, 3),
            "verdict": verdict,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
