#!/usr/bin/env python
"""r20 quiet re-measure — the scripts/remeasure_r19.py protocol rolled
forward one round (archive of record: bench_r19_local_quiet.json, the
r19 QUIET same-HEAD pass — canary median 0.518, canary2 median 2.870;
the plain bench_r19_local.json was a HOT pass, 0.587/3.076, and would
bias every adjusted ratio low — VERDICT_r19 task 5 names the quiet
pass as the archive of record).

Rule set carried verbatim from r19 (all ADVICE_r18 fixes retained,
pinned in tests/test_remeasure_rules_r20.py):

  - `sub_second_rule(archive_sec)` — regime selection is a pure
    function of the ARCHIVE-OF-RECORD time only (ADVICE_r18 #1);
  - denominator selection:
      heavy row (archive >= HEAVY_CUTOFF s)  -> canary2-adjusted ratio
      sub-second row (archive < 1.0 s)       -> quiet-r13 triangulation
      everything between                      -> light-canary adjustment
  - canary self-normalization rule for target == pricing_summary (raw
    best-to-best vs the quiet r13 archive under the canary-quietness
    precondition), `median_would_flag` on every row, CHANGED only via
    the --changed=a,b flag.

CANARY2_ARCHIVE gains the r19 samples on both sides (local 2.870 from
bench_r19_local_quiet.json — the archive of record — and driver 4.434
from BENCH_r19.json), per VERDICT_r19 task 5.

Everything else is the r19 protocol verbatim: noop sink, clearCache
after every run, warmup pass, FIVE canary-bracketed rounds,
upper-median canary statistic.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANDATORY: list[str] = []
CANARY = "pricing_summary"
ROUNDS = 5
THRESHOLD = 1.10
QUIET_CANARY_TOL = 1.15
# A row is "heavy" (eligible for the canary2 denominator) when its
# archive-of-record time is at least this many seconds — the regime
# where multi-core contention, not scheduling latency, dominates.
HEAVY_CUTOFF = 2.0
# A row is "sub-second" (eligible for the quiet-r13 triangulation)
# when its ARCHIVE-OF-RECORD time is under this many seconds. The
# current round's own samples play no part in regime selection
# (ADVICE_r18 #1).
SUB_SECOND_CUTOFF = 1.0
# canary2 baselines per VERDICT_r17 task 4 / VERDICT_r19 task 5.
# Keyed by the bench artifact each baseline was measured in; the
# *_local entries are the denominator mates of the corresponding
# local bench archive's per-row times (r19_local = the QUIET pass,
# bench_r19_local_quiet.json — the r20 archive of record).
CANARY2_ARCHIVE: dict[str, float] = {
    "r17_local": 2.664,   # bench_r17_local.json canary2.median_sec
    "r17_driver": 2.767,  # BENCH_r17.json canary2.median_sec
    "r18_local": 2.445,   # bench_r18_local.json canary2.median_sec
    "r18_driver": 2.965,  # BENCH_r18.json canary2.median_sec
    "r19_local": 2.870,   # bench_r19_local_quiet.json canary2.median_sec
    "r19_driver": 4.434,  # BENCH_r19.json canary2.median_sec (hot round)
}


def _upper_median(xs: list[float]) -> float:
    # sorted[n//2], NOT interpolated: the convention every archive's
    # canary median_sec uses, kept so both ratio sides bias the same way
    return sorted(xs)[len(xs) // 2]


def sub_second_rule(archive_sec: float, cutoff: float = SUB_SECOND_CUTOFF) -> bool:
    """Whether a row takes the quiet-r13 sub-second triangulation.

    Pure function of the ARCHIVE-OF-RECORD time only (ADVICE_r18 #1):
    which regime a row lives in is a property of its established cost,
    never of today's samples — a heavy row whose current best dips
    under 1.0 s is exactly the case that needs the
    contention-normalized canary2 denominator, not the friendliest one.
    """
    return archive_sec < cutoff


def canary_rule_verdict(
    raw_best_ratio_vs_quiet: float,
    canary_median: float,
    quiet_canary_median: float,
    threshold: float = THRESHOLD,
    tol: float = QUIET_CANARY_TOL,
) -> tuple[str, str]:
    """Verdict for the canary query itself (unchanged from r17-r19).

    Canary-adjusting the canary divides a sample of X by the median of
    X — self-correlated and pathological. Instead: require the machine
    to be at least comparably quiet to the r13 archive (precondition),
    then judge the RAW best-to-best ratio against the quiet archive.
    """
    if canary_median > tol * quiet_canary_median:
        return (
            "INVESTIGATE",
            f"canary-quietness precondition failed: this run's canary median "
            f"{canary_median:.3f}s > {tol} x quiet-archive median "
            f"{quiet_canary_median:.3f}s; raw comparison not meaningful — "
            f"rerun on a quieter machine",
        )
    if raw_best_ratio_vs_quiet <= threshold:
        return (
            "noise",
            f"canary self-normalization rule: target IS the canary, so the "
            f"verdict uses RAW best-to-best vs the quiet r13 archive "
            f"({raw_best_ratio_vs_quiet:.3f} <= {threshold}) under a "
            f"comparably quiet machine (canary median {canary_median:.3f}s "
            f"vs quiet archive {quiet_canary_median:.3f}s)",
        )
    return (
        "INVESTIGATE",
        f"raw best-to-best vs quiet r13 archive = "
        f"{raw_best_ratio_vs_quiet:.3f} > {threshold} under a comparably "
        f"quiet machine — possible real regression of the canary query",
    )


def row_verdict(
    name: str,
    adj_best: float,
    adj_median: float,
    changed: frozenset[str] | set[str] = frozenset(),
    threshold: float = THRESHOLD,
) -> tuple[str, bool]:
    """Verdict for a non-canary row (unchanged from r17-r19).

    best-adjusted remains decisive (the archive is a single pass, so a
    median-vs-single-pass gate is biased against us), but the median's
    dissent is machine-visible via the returned median_would_flag.
    """
    median_would_flag = adj_median > threshold
    if adj_best <= threshold:
        return ("noise", median_would_flag)
    if name in changed:
        return ("changed-path (expected)", median_would_flag)
    return ("INVESTIGATE", median_would_flag)


def decisive_statistic(
    archive_sec: float,
    adj_light_best: float,
    adj_light_median: float,
    adj_c2_best: float | None,
    adj_c2_median: float | None,
    heavy_cutoff: float = HEAVY_CUTOFF,
) -> tuple[str, float, float]:
    """Pick the denominator for a row (VERDICT_r17 task 4).

    Heavy rows (archive-of-record >= heavy_cutoff seconds) use the
    canary2-adjusted ratios when canary2 was measured on both sides —
    contention-normalized, the regime those rows actually live in.
    Light rows (and heavy rows without a canary2 sample, e.g. an
    archive round predating canary2) keep the light-canary adjustment.
    Returns (denominator_name, decisive_best, decisive_median).

    The sub-second quiet-r13 route is selected BEFORE this function by
    sub_second_rule(archive_sec) — on the archive time only, so a
    heavy row can never be diverted here by one fast sample
    (ADVICE_r18 #1).
    """
    if archive_sec >= heavy_cutoff and adj_c2_best is not None:
        assert adj_c2_median is not None
        return ("canary2", adj_c2_best, adj_c2_median)
    return ("light", adj_light_best, adj_light_median)


def main() -> None:
    changed: set[str] = set()
    targets: list[str] = list(MANDATORY)
    for a in sys.argv[1:]:
        if a.startswith("--changed="):
            changed |= {n for n in a[len("--changed="):].split(",") if n}
        elif a not in targets:
            targets.append(a)

    from sahithi_metamorph_etl_spark.core.session import get_spark
    from sahithi_metamorph_etl_spark.llm.clustering import kmeans_lloyd
    from sahithi_metamorph_etl_spark.queries.catalog import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    archives = {}
    for rnd, fn in (("r13", "bench_r13_local.json"),
                    ("r19", "bench_r19_local_quiet.json")):
        with open(os.path.join(repo, fn)) as fh:
            archives[rnd] = json.load(fh)
    r19_q = archives["r19"]["queries"]
    r19_canary = archives["r19"]["canary"]["median_sec"]
    r19_canary2 = archives["r19"]["canary2"]["median_sec"]
    assert r19_canary2 == CANARY2_ARCHIVE["r19_local"]
    r13_q = archives["r13"]["queries"]
    r13_canary = archives["r13"]["canary"]["median_sec"]
    missing = [t for t in targets if t not in r19_q and t != CANARY]
    assert not missing, f"targets absent from bench_r19_local_quiet.json: {missing}"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r20")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    emb_c2 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def run_canary2() -> float:
        # identical microbench to bench.py's canary2 (k=16, n_iter=4 —
        # deliberately NOT the graded emb_kmeans_clusters' k=8/n_iter=2)
        t0 = time.perf_counter()
        kmeans_lloyd(emb_c2, k=16, n_iter=4).write.format("noop").mode(
            "overwrite"
        ).save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    non_canary = [t for t in targets if t != CANARY]
    any_heavy = any(r19_q[n] >= HEAVY_CUTOFF for n in non_canary)
    for name in [CANARY] + non_canary:  # warmup
        run(name)
    if any_heavy:
        run_canary2()  # warmup

    canary: list[float] = []
    canary2: list[float] = []
    all_runs: dict[str, list[float]] = {t: [] for t in non_canary}
    for _ in range(ROUNDS):
        canary.append(run(CANARY))
        if any_heavy:
            canary2.append(run_canary2())
        for name in non_canary:
            all_runs[name].append(run(name))
    canary.append(run(CANARY))
    if any_heavy:
        canary2.append(run_canary2())

    cmed = _upper_median(canary)
    c2med = _upper_median(canary2) if canary2 else None
    out = {
        "canary_runs": canary,
        "canary_median": cmed,
        "canary2_runs": canary2,
        "canary2_median": c2med,
        "canary2_archive": CANARY2_ARCHIVE,
        "changed_declared": sorted(changed),
        "queries": {},
        "median_flags": [],
    }
    for name in non_canary:
        best = min(all_runs[name])
        med = _upper_median(all_runs[name])
        adj_best = (best / cmed) / (r19_q[name] / r19_canary)
        adj_med = (med / cmed) / (r19_q[name] / r19_canary)
        row = {
            "runs": all_runs[name],
            "best": best,
            "median": med,
            "r19_local_quiet": r19_q[name],
            "adj_best_vs_r19_local_quiet": round(adj_best, 3),
            "adj_median_vs_r19_local_quiet": round(adj_med, 3),
        }
        adj_c2_best = adj_c2_med = None
        if c2med is not None and r19_q[name] >= HEAVY_CUTOFF:
            adj_c2_best = (best / c2med) / (r19_q[name] / r19_canary2)
            adj_c2_med = (med / c2med) / (r19_q[name] / r19_canary2)
            row["adj_best_vs_r19_local_quiet_canary2"] = round(adj_c2_best, 3)
            row["adj_median_vs_r19_local_quiet_canary2"] = round(adj_c2_med, 3)
        # ADVICE_r18 #1: regime selection on the archive time ONLY
        if sub_second_rule(r19_q[name]) and name in r13_q:
            adj_b13 = (best / cmed) / (r13_q[name] / r13_canary)
            adj_m13 = (med / cmed) / (r13_q[name] / r13_canary)
            row["r13_quiet_local"] = r13_q[name]
            row["adj_best_vs_r13_quiet"] = round(adj_b13, 3)
            row["adj_median_vs_r13_quiet"] = round(adj_m13, 3)
            dec_name, dec_best, dec_med = "quiet_r13", adj_b13, adj_m13
        else:
            dec_name, dec_best, dec_med = decisive_statistic(
                r19_q[name], adj_best, adj_med, adj_c2_best, adj_c2_med
            )
        row["decisive_denominator"] = dec_name
        verdict, median_would_flag = row_verdict(name, dec_best, dec_med, changed)
        row["verdict"] = verdict
        row["median_would_flag"] = median_would_flag
        if median_would_flag:
            out["median_flags"].append(name)
        out["queries"][name] = row

    if CANARY in targets:
        # The canary's own samples ARE the bracketing runs above.
        best = min(canary)
        raw_ratio = best / r13_q[CANARY]
        verdict, rationale = canary_rule_verdict(raw_ratio, cmed, r13_canary)
        out["queries"][CANARY] = {
            "runs": canary,
            "best": best,
            "median": cmed,
            "r13_quiet_local": r13_q[CANARY],
            "raw_best_ratio_vs_r13_quiet": round(raw_ratio, 3),
            "quiet_canary_median": r13_canary,
            "verdict": verdict,
            "rationale": rationale,
            "rule": "canary self-normalization: raw best-to-best vs quiet "
                    "archive, canary-quietness precondition, no canary "
                    "adjustment",
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
