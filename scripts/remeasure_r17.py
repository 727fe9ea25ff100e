#!/usr/bin/env python
"""r17 quiet re-measure — protocol of scripts/remeasure_r16.py with the
three ADVICE_r16 fixes and the VERDICT_r16 task-2 canary rule codified:

1. (ADVICE_r16 #1 / verdict task 2) The canary query itself
   (pricing_summary) can be a remeasure target; canary-adjusting it is
   self-correlated (a sample of X divided by the median of X). The rule
   is now IN the script as a pure function (`canary_rule_verdict`):
   when target == CANARY the verdict compares RAW best-to-best against
   the QUIET r13 archive, gated on a canary-quietness precondition
   (this run's canary median must be <= QUIET_CANARY_TOL x the r13
   quiet canary median, else the raw comparison is not meaningful and
   the row stays INVESTIGATE). The verdict AND its rationale are
   embedded in the JSON output, so the artifact is self-contained — no
   prose adjudication block needed.

2. (ADVICE_r16 #2) best-of-5 vs a single-pass archive biases verdicts
   toward "noise". The median-adjusted ratio is now machine-visible in
   the decision layer: every row records `median_would_flag` (True
   when the median-adjusted decisive ratio exceeds the threshold even
   though best passed), and the top level carries a `median_flags`
   list. best remains the headline statistic (the archive side is a
   single pass, so median-vs-single-pass is biased AGAINST us and
   would manufacture flags on quiet rows), but the bias is no longer
   silent: a future reader of the artifact alone sees exactly which
   verdicts the median statistic would have contested.

3. (ADVICE_r16 #3) CHANGED is no longer a hardcoded empty set with a
   dead verdict branch: it is populated from the `--changed=a,b` flag,
   so the "changed-path (expected)" branch exists only as a reachable,
   caller-declared path.

Measurement protocol unchanged from r16: noop sink, clearCache after
every run, warmup pass, FIVE canary-bracketed rounds, upper-median
canary statistic, sub-second rows (archive < 1 s) triangulated against
the quiet r13 archive (bench_r13_local.json, canary 0.487 — lowest on
record) as the denominator of record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pricing_summary is MANDATORY this round: remeasure_r16_out.json left
# it as an open INVESTIGATE (the rule-based verdict there could not
# handle target == canary); the r16 verdict adjudicated it noise in
# prose. Re-measuring it here closes the artifact chain with a
# RULE-decided verdict, no prose needed. (Both r15 sub-second
# INVESTIGATE carry-overs were closed in r16.)
MANDATORY: list[str] = ["pricing_summary"]
CANARY = "pricing_summary"
ROUNDS = 5
THRESHOLD = 1.10
# Canary-quietness precondition for the raw (un-adjusted) comparison:
# this run's canary median may exceed the quiet r13 archive's canary
# median by at most this factor, else the machine is not comparable.
QUIET_CANARY_TOL = 1.15


def _upper_median(xs: list[float]) -> float:
    # sorted[n//2], NOT interpolated: the convention every archive's
    # canary median_sec uses, kept so both ratio sides bias the same way
    return sorted(xs)[len(xs) // 2]


def canary_rule_verdict(
    raw_best_ratio_vs_quiet: float,
    canary_median: float,
    quiet_canary_median: float,
    threshold: float = THRESHOLD,
    tol: float = QUIET_CANARY_TOL,
) -> tuple[str, str]:
    """Verdict for the canary query itself (VERDICT_r16 task 2).

    Canary-adjusting the canary divides a sample of X by the median of
    X — self-correlated and pathological. Instead: require the machine
    to be at least comparably quiet to the r13 archive (precondition),
    then judge the RAW best-to-best ratio against the quiet archive.
    Returns (verdict, rationale); both go into the JSON artifact.
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
    """Verdict for a non-canary row (ADVICE_r16 #2 fix).

    best-adjusted remains decisive (the archive is a single pass, so a
    median-vs-single-pass gate is biased against us), but the median's
    dissent is machine-visible: returns (verdict, median_would_flag)
    where median_would_flag is True when the median-adjusted ratio
    exceeds the threshold even though best passed.
    """
    median_would_flag = adj_median > threshold
    if adj_best <= threshold:
        return ("noise", median_would_flag)
    if name in changed:
        return ("changed-path (expected)", median_would_flag)
    return ("INVESTIGATE", median_would_flag)


def main() -> None:
    changed: set[str] = set()
    targets: list[str] = list(MANDATORY)
    for a in sys.argv[1:]:
        if a.startswith("--changed="):
            changed |= {n for n in a[len("--changed="):].split(",") if n}
        elif a not in targets:
            targets.append(a)

    from sahithi_metamorph_etl_spark.core.session import get_spark
    from sahithi_metamorph_etl_spark.queries.catalog import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    archives = {}
    for rnd in ("r13", "r16"):
        with open(os.path.join(repo, f"bench_{rnd}_local.json")) as fh:
            archives[rnd] = json.load(fh)
    r16_q = archives["r16"]["queries"]
    r16_canary = archives["r16"]["canary"]["median_sec"]
    r13_q = archives["r13"]["queries"]
    r13_canary = archives["r13"]["canary"]["median_sec"]
    missing = [t for t in targets if t not in r16_q and t != CANARY]
    assert not missing, f"targets absent from bench_r16_local.json: {missing}"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r17")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return el

    non_canary = [t for t in targets if t != CANARY]
    for name in [CANARY] + non_canary:  # warmup
        run(name)

    canary: list[float] = []
    all_runs: dict[str, list[float]] = {t: [] for t in non_canary}
    for _ in range(ROUNDS):
        canary.append(run(CANARY))
        for name in non_canary:
            all_runs[name].append(run(name))
    canary.append(run(CANARY))

    cmed = _upper_median(canary)
    out = {
        "canary_runs": canary,
        "canary_median": cmed,
        "changed_declared": sorted(changed),
        "queries": {},
        "median_flags": [],
    }
    for name in non_canary:
        best = min(all_runs[name])
        med = _upper_median(all_runs[name])
        adj_best = (best / cmed) / (r16_q[name] / r16_canary)
        adj_med = (med / cmed) / (r16_q[name] / r16_canary)
        row = {
            "runs": all_runs[name],
            "best": best,
            "median": med,
            "r16_local": r16_q[name],
            "adj_best_vs_r16_local": round(adj_best, 3),
            "adj_median_vs_r16_local": round(adj_med, 3),
        }
        sub_second = r16_q[name] < 1.0 or best < 1.0
        if sub_second and name in r13_q:
            adj_b13 = (best / cmed) / (r13_q[name] / r13_canary)
            adj_m13 = (med / cmed) / (r13_q[name] / r13_canary)
            row["r13_quiet_local"] = r13_q[name]
            row["adj_best_vs_r13_quiet"] = round(adj_b13, 3)
            row["adj_median_vs_r13_quiet"] = round(adj_m13, 3)
            dec_best, dec_med = adj_b13, adj_m13  # quiet archive decisive
        else:
            dec_best, dec_med = adj_best, adj_med
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
            "rule": "canary self-normalization (VERDICT_r16 task 2): raw "
                    "best-to-best vs quiet archive, canary-quietness "
                    "precondition, no canary adjustment",
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
