#!/usr/bin/env python
"""r20 envelope triangulation — the rule-decided final adjudication
stage for rows the single-round (r19-quiet-archive) remeasure rules
left INVESTIGATE. Protocol of scripts/remeasure_envelope_r19.py rolled
forward one round, with the ADVICE_r19 #2-#3 fixes:

ADVICE_r19 #2: r19's canary samples_considered pool hard-coded
bench_r19_local.json and so omitted the four other same-HEAD r19
passes that existed in the repo — the pool-asymmetry the ADVICE_r17 #2
rule is about, creeping back in on the current-round side. The pool is
now built by `current_round_bench_files(repo)`, a glob over
bench_r20_local*.json, so every same-HEAD pass of the current round
feeds the best-of-pool numerator automatically (pinned in
tests/test_remeasure_rules_r20.py).

ADVICE_r19 #3: r19's round-level drift guard mixed heterogeneous
statistics — the canary contributed a RAW best-to-best
median-of-archives ratio while every other row contributed
canary-ADJUSTED ratios, one differently-scaled input to the >1/3
fraction rule. The guard's input set is now filtered through
`drift_pool`, which excludes the canary row; the canary's own
envelope verdict (canary_envelope_verdict, raw symmetric pools) is
unaffected and still stands on its own, and the exclusion is recorded
in the guard's output so nothing is hidden (pinned).

Carried from r18/r19 (ADVICE_r17 #1-2, ADVICE_r18 #2, all pinned):
  - every envelope verdict records `median_of_archives_ratio` and
    `dissenting_rounds` so one favorable archive can never silently
    carry a verdict;
  - the canary-envelope comparison is symmetric: best-of-pool over
    the archive's timed row AND its interleaved per-block canary
    samples (`archive_canary_best`) on the denominator side, matching
    the best-of-all-today's-samples numerator;
  - the round-level drift guard flags the ROUND for a quiet rerun
    when >1/3 of the remeasured headline rows exceed threshold x
    their median-of-archives, with a >= MIN_DRIFT_ROWS floor below
    which the verdict is OK_SMALL_N.

Per-row noise/INVESTIGATE semantics are unchanged from r17-r19
(VERDICT_r17 endorsed them): a row is noise iff its plan-audit entry
is IDENTICAL to a green archived round's AND its canary-adjusted
ratio vs at least one such round is <= threshold.

The ARCHIVES table gains ALL FIVE r19 same-HEAD bench passes (the
machine-round envelope spanned 100.6-125.2 s purely by host
contention — VERDICT_r19 adjudicated this; feeding all five forward
is what lets the envelope rule see both the quiet floor and the hot
edge), every one covered by plan_audit_r19.json, following the
r14/r14_rerun and r18/r18_rerun precedent.

Inputs are the already-written measurement artifacts
(remeasure_r20_out.json and, if present, remeasure_r20_rerun_out.json
— this script performs NO timing of its own), the r12-r19 local bench
archives, and the per-round plan audits (current round:
plan_audit_r20.json). Output: remeasure_r20_final.json.

Usage: python scripts/remeasure_envelope_r20.py   (from anywhere)
"""

from __future__ import annotations

import glob as _glob
import json
import os

THRESHOLD = 1.10
# Round-level drift guard: strictly more than this fraction of the
# remeasured headline rows above THRESHOLD x median-of-archives flags
# the ROUND for a quiet-machine rerun...
ROUND_FLAG_FRACTION = 1 / 3
# ...but only once the remeasured set is at least this large
# (ADVICE_r18 #2): below this floor a single noisy row IS the
# majority, and a round-level rerun demand from one row is exactly
# the per-row-noise-amplification the guard exists to prevent.
MIN_DRIFT_ROWS = 3
CANARY = "pricing_summary"

# Archived local bench runs at externally-green HEADs, with the plan
# audit that covers each HEAD. r11 is excluded: its plan-audit schema
# predates the current counter set. r19 contributes ALL FIVE same-HEAD
# passes — the widest machine-round envelope yet recorded
# (VERDICT_r19: 100.6-125.2 s at canary2 2.742-3.687, pure contention).
ARCHIVES: list[tuple[str, str, str]] = [
    ("r12", "bench_r12_local.json", "plan_audit_r12.json"),
    ("r13", "bench_r13_local.json", "plan_audit_r13.json"),
    ("r14", "bench_r14_local.json", "plan_audit_r14.json"),
    ("r14_rerun", "bench_r14_local_rerun.json", "plan_audit_r14.json"),
    ("r15", "bench_r15_local.json", "plan_audit_r15.json"),
    ("r16", "bench_r16_local.json", "plan_audit_r16.json"),
    ("r17", "bench_r17_local.json", "plan_audit_r17.json"),
    ("r18", "bench_r18_local.json", "plan_audit_r18.json"),
    ("r18_rerun", "bench_r18_local_rerun.json", "plan_audit_r18.json"),
    ("r19", "bench_r19_local.json", "plan_audit_r19.json"),
    ("r19_rerun", "bench_r19_local_rerun.json", "plan_audit_r19.json"),
    ("r19_quiet", "bench_r19_local_quiet.json", "plan_audit_r19.json"),
    ("r19_quiet2", "bench_r19_local_quiet2.json", "plan_audit_r19.json"),
    ("r19_quiet3", "bench_r19_local_quiet3.json", "plan_audit_r19.json"),
]

CURRENT_AUDIT = "plan_audit_r20.json"
# Glob for every same-HEAD bench pass of the CURRENT round
# (ADVICE_r19 #2): the canary best-of-pool numerator must see all of
# them, not a hand-picked one.
CURRENT_BENCH_GLOB = "bench_r20_local*.json"


def _upper_median(xs: list[float]) -> float:
    # sorted[n//2]: the same convention as every archive's canary
    # median_sec, kept so ratios bias the same way everywhere
    return sorted(xs)[len(xs) // 2]


def current_round_bench_files(repo: str, pattern: str = CURRENT_BENCH_GLOB) -> list[str]:
    """Every same-HEAD bench pass of the current round (ADVICE_r19 #2).

    A glob, not a hard-coded filename: r19 listed only
    bench_r19_local.json and silently omitted its four sibling passes,
    re-introducing the pool asymmetry ADVICE_r17 #2 closed on the
    archive side. Sorted for deterministic artifact output; direction
    is conservative either way (a bigger pool can only lower the
    best), but symmetry is the point.
    """
    return sorted(_glob.glob(os.path.join(repo, pattern)))


def drift_pool(
    median_ratios: dict[str, float], canary: str = CANARY
) -> dict[str, float]:
    """Input set for the round-level drift guard (ADVICE_r19 #3).

    The canary's envelope statistic is a RAW best-to-best ratio while
    every other row's is canary-ADJUSTED — mixed scales in one
    fraction rule. Exclude the canary here; its own raw-pool envelope
    verdict still stands separately, and the caller records the
    exclusion in the guard's artifact so it is visible, not silent.
    """
    return {n: r for n, r in median_ratios.items() if n != canary}


def envelope_stats(
    ratios: dict[str, float], threshold: float = THRESHOLD
) -> dict[str, float | int]:
    """Leniency-visibility stats over a row's per-round adjusted ratios
    (ADVICE_r17 #1): the ratio vs the MEDIAN of the plan-identical
    archives and how many archives individually dissent from a noise
    verdict. Returned empty-safe so callers can always embed it."""
    if not ratios:
        return {"median_of_archives_ratio": None, "dissenting_rounds": 0,
                "rounds_compared": 0}
    return {
        "median_of_archives_ratio": round(_upper_median(list(ratios.values())), 3),
        "dissenting_rounds": sum(1 for r in ratios.values() if r > threshold),
        "rounds_compared": len(ratios),
    }


def envelope_verdict(
    name: str,
    best: float,
    canary_median: float,
    per_round: dict[str, tuple[float, float]],
    plan_identical: dict[str, bool],
    threshold: float = THRESHOLD,
) -> tuple[str, dict[str, float], dict, str]:
    """Verdict for a non-canary row against the green-round envelope.

    per_round maps round -> (archived row seconds, archived canary
    median seconds); plan_identical maps round -> whether the row's
    plan-audit entry equals the current round's. Returns (verdict,
    per-round adjusted ratios over plan-identical rounds, leniency
    stats per envelope_stats, rationale). Rounds without plan identity
    are excluded — comparing across different plans would conflate
    code change with environment.
    """
    ratios = {
        rnd: round((best / canary_median) / (q / c), 3)
        for rnd, (q, c) in per_round.items()
        if plan_identical.get(rnd)
    }
    stats = envelope_stats(ratios, threshold)
    if not ratios:
        return (
            "INVESTIGATE",
            ratios,
            stats,
            f"{name}: no plan-identical green round to compare against — "
            f"the envelope rule cannot apply",
        )
    best_round = min(ratios, key=ratios.get)
    if ratios[best_round] <= threshold:
        return (
            "noise",
            ratios,
            stats,
            f"{name}: canary-adjusted {ratios[best_round]:.3f} vs the "
            f"plan-identical green {best_round} archive (<= {threshold}) — "
            f"at parity with an externally-verified round "
            f"({stats['dissenting_rounds']}/{stats['rounds_compared']} "
            f"archives dissent; median-of-archives ratio "
            f"{stats['median_of_archives_ratio']}; plans byte-identical)",
        )
    return (
        "INVESTIGATE",
        ratios,
        stats,
        f"{name}: slower than EVERY plan-identical green round "
        f"(min ratio {ratios[best_round]:.3f} vs {best_round} > "
        f"{threshold}) — consistent with a real regression, not "
        f"explainable by archive-round choice",
    )


def round_drift_verdict(
    median_ratios: dict[str, float],
    threshold: float = THRESHOLD,
    max_fraction: float = ROUND_FLAG_FRACTION,
    min_rows: int = MIN_DRIFT_ROWS,
) -> tuple[str, list[str], str]:
    """Round-level drift guard (VERDICT_r17 task 3 + ADVICE_r18 #2).

    median_ratios maps each remeasured headline row to its
    median-of-archives adjusted ratio (canary already excluded by
    drift_pool — ADVICE_r19 #3 — so every input is on the same
    canary-adjusted scale). If strictly more than max_fraction of the
    rows exceed threshold AND the set has at least min_rows rows, the
    per-row envelope is being carried by favorable archive tails
    fleet-wide — flag the ROUND for a quiet-machine full rerun. Below
    min_rows the fraction rule degenerates (n=1: one noisy row = 100%
    and would demand a round-level rerun all by itself — ADVICE_r18
    #2), so the verdict is OK_SMALL_N: per-row verdicts carry the
    adjudication and the flagged rows are still listed. Per-row
    verdicts stand in every case; the flag is about this
    machine-round's trustworthiness. Returns (verdict, rows above
    threshold, rationale).
    """
    flagged = sorted(n for n, r in median_ratios.items() if r > threshold)
    n = len(median_ratios)
    if n and n < min_rows:
        return (
            "OK_SMALL_N",
            flagged,
            f"{len(flagged)}/{n} remeasured headline rows exceed "
            f"{threshold} x their median-of-plan-identical-archives, but "
            f"the round-level flag needs >= {min_rows} remeasured rows to "
            f"fire (ADVICE_r18 #2: with n < {min_rows} a single noisy row "
            f"is the majority and would demand a full rerun by itself) — "
            f"the per-row envelope verdicts carry the adjudication",
        )
    if n and len(flagged) > max_fraction * n:
        return (
            "RERUN_ROUND",
            flagged,
            f"{len(flagged)}/{n} remeasured headline rows exceed "
            f"{threshold} x their median-of-plan-identical-archives — more "
            f"than {max_fraction:.2f} of the set; the per-row envelope "
            f"verdicts stand but this machine-round's bench must be rerun "
            f"on a quiet machine before its numbers are archived",
        )
    return (
        "OK",
        flagged,
        f"{len(flagged)}/{n} remeasured headline rows exceed {threshold} x "
        f"their median-of-plan-identical-archives (round flags only above "
        f"{max_fraction:.2f} of a set of >= {min_rows} rows; canary "
        f"excluded — mixed-scale input, ADVICE_r19 #3)",
    )


def archive_canary_best(bench: dict, canary: str = CANARY) -> float:
    """Best-of-comparable-pool for an archive round's canary query
    (ADVICE_r17 #2): the minimum over the archive's timed row AND its
    interleaved per-block canary samples — the same pooling the
    current-round side uses, so the raw ratio is best-to-best of
    like-sized pools on both sides."""
    vals = [bench["queries"][canary]]
    blocks = (bench.get("canary") or {}).get("per_block_sec") or []
    vals.extend(c for blk in blocks for c in blk)
    return min(vals)


def canary_envelope_verdict(
    best: float,
    per_round_raw: dict[str, float],
    plan_identical: dict[str, bool],
    threshold: float = THRESHOLD,
) -> tuple[str, dict[str, float], dict, str]:
    """Envelope verdict for the canary query itself (raw, un-adjusted).

    Canary-adjusting the canary is self-correlated, so compare RAW
    best-to-best against each plan-identical green round. per_round_raw
    must already be the archive-side best-of-pool per
    archive_canary_best (ADVICE_r17 #2 — symmetric pools). Leniency
    stats are embedded exactly as for non-canary rows.
    """
    ratios = {
        rnd: round(best / q, 3)
        for rnd, q in per_round_raw.items()
        if plan_identical.get(rnd)
    }
    stats = envelope_stats(ratios, threshold)
    if not ratios:
        return ("INVESTIGATE", ratios, stats,
                "no plan-identical round to compare")
    best_round = min(ratios, key=ratios.get)
    if ratios[best_round] <= threshold:
        return (
            "noise",
            ratios,
            stats,
            f"canary envelope rule: raw best {best:.3f}s is "
            f"{ratios[best_round]:.3f}x the plan-identical green "
            f"{best_round} archive's best-of-pool (<= {threshold}; "
            f"{stats['dissenting_rounds']}/{stats['rounds_compared']} "
            f"archives dissent, median-of-archives ratio "
            f"{stats['median_of_archives_ratio']}) — this machine-round's "
            f"floor matches a state that already passed",
        )
    return (
        "INVESTIGATE",
        ratios,
        stats,
        f"raw best {best:.3f}s exceeds {threshold}x EVERY plan-identical "
        f"green round's best-of-pool (min {ratios[best_round]:.3f}x vs "
        f"{best_round}) — possible real canary-query regression",
    )


def _plan_identity(repo: str, names: list[str]) -> dict[str, dict[str, bool]]:
    """name -> round -> (plan_audit entry equals r20's entry)."""
    with open(os.path.join(repo, CURRENT_AUDIT)) as fh:
        cur = json.load(fh)["entries"]
    out: dict[str, dict[str, bool]] = {n: {} for n in names}
    for rnd, _, audit in ARCHIVES:
        with open(os.path.join(repo, audit)) as fh:
            ent = json.load(fh).get("entries", {})
        for n in names:
            out[n][rnd] = n in ent and ent[n] == cur.get(n)
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    benches: dict[str, dict] = {}
    for rnd, bench, _ in ARCHIVES:
        with open(os.path.join(repo, bench)) as fh:
            benches[rnd] = json.load(fh)

    # measurement artifacts (this script times nothing itself)
    runs = []
    for fn in ("remeasure_r20_out.json", "remeasure_r20_rerun_out.json"):
        path = os.path.join(repo, fn)
        if os.path.exists(path):
            with open(path) as fh:
                runs.append((fn, json.load(fh)))
    assert runs, "no remeasure_r20 artifacts found"

    # every target measured in either run; the rerun supersedes the
    # first run where both measured
    rows: dict[str, dict] = {}
    for fn, art in runs:
        for name, row in art["queries"].items():
            rows[name] = {"source": fn, "canary_median": art["canary_median"], **row}

    identity = _plan_identity(repo, list(rows))

    out = {
        "protocol": (
            "consolidates the remeasure_r20 artifacts; rows the "
            "single-round (r19-quiet-archive) rules left INVESTIGATE get "
            "the envelope rule: plan-identity-gated canary-adjusted "
            "comparison against EVERY green r12-r19 local archive (all "
            "FIVE r19 same-HEAD passes included — the machine-round "
            "envelope); noise iff at parity with at least one, with "
            "median-of-archives ratio and dissenting-round count embedded "
            "per row (ADVICE_r17 #1). The canary query uses raw "
            "best-to-best of symmetric pools (ADVICE_r17 #2), with the "
            "current-round pool built by glob over bench_r20_local*.json "
            "(ADVICE_r19 #2). A round-level drift guard flags the ROUND "
            "for a quiet rerun when >1/3 of remeasured headline rows "
            "exceed 1.10x their median-of-archives, with a >= 3-row floor "
            "below which the verdict is OK_SMALL_N (ADVICE_r18 #2); the "
            "canary is excluded from the guard's input pool — its raw "
            "ratio is on a different scale than the canary-adjusted rows "
            "(ADVICE_r19 #3)."
        ),
        "queries": {},
        "open_investigations": [],
    }
    drift_inputs: dict[str, float] = {}
    for name, row in sorted(rows.items()):
        rec = {
            "single_round_verdict": row["verdict"],
            "source": row["source"],
            "best": row["best"],
            "median": row["median"],
            "median_would_flag": row.get("median_would_flag"),
        }
        if name == CANARY:
            # symmetric best-of-pool on both sides (ADVICE_r17 #2);
            # current-round pool globbed, not hand-picked (ADVICE_r19 #2)
            per_raw = {
                rnd: archive_canary_best(b) for rnd, b in benches.items()
                if name in b["queries"]
            }
            samples: dict[str, float] = {}
            for fn, art in runs:
                samples[fn + ":canary_runs"] = min(art["canary_runs"])
            for path in current_round_bench_files(repo):
                with open(path) as fh:
                    b20 = json.load(fh)
                samples[os.path.basename(path) + ":pool"] = archive_canary_best(b20)
            best_today = min(samples.values())
            verdict, ratios, stats, rationale = canary_envelope_verdict(
                best_today, per_raw, identity[name]
            )
            rec["best"] = best_today
            rec["samples_considered"] = samples
            rec["archive_best_of_pool"] = per_raw
            rec.update(
                final_verdict=verdict,
                raw_ratio_per_round=ratios,
                plan_identical_rounds=sorted(
                    r for r, ok in identity[name].items() if ok
                ),
                rationale=rationale,
                **stats,
            )
            # ADVICE_r19 #3: the canary's raw-scale ratio does NOT
            # enter drift_inputs; drift_pool would drop it anyway, but
            # we record the stat per-row where it belongs.
            if stats["median_of_archives_ratio"] is not None:
                drift_inputs[name] = stats["median_of_archives_ratio"]
        else:
            per_round = {
                rnd: (b["queries"][name], b["canary"]["median_sec"])
                for rnd, b in benches.items() if name in b["queries"]
            }
            verdict, ratios, stats, rationale = envelope_verdict(
                name, row["best"], row["canary_median"], per_round, identity[name]
            )
            # the drift guard sees EVERY remeasured row's median-of-
            # archives ratio, including rows the single-round rule
            # already closed — drift hides exactly there
            if stats["median_of_archives_ratio"] is not None:
                drift_inputs[name] = stats["median_of_archives_ratio"]
            if row["verdict"] != "INVESTIGATE":
                rec["final_verdict"] = row["verdict"]
                rec["rationale"] = (
                    "closed by the single-round rule; no envelope needed"
                )
                rec.update(**stats)
            else:
                rec.update(
                    final_verdict=verdict,
                    adjusted_ratio_per_round=ratios,
                    plan_identical_rounds=sorted(
                        r for r, ok in identity[name].items() if ok
                    ),
                    rationale=rationale,
                    **stats,
                )
        if rec["final_verdict"] == "INVESTIGATE":
            out["open_investigations"].append(name)
        out["queries"][name] = rec

    pool = drift_pool(drift_inputs)
    drift_verdict, drift_rows, drift_rationale = round_drift_verdict(pool)
    out["round_drift_guard"] = {
        "verdict": drift_verdict,
        "rows_above_median_threshold": drift_rows,
        "median_ratios": pool,
        "excluded_mixed_scale_rows": sorted(set(drift_inputs) - set(pool)),
        "rationale": drift_rationale,
    }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
