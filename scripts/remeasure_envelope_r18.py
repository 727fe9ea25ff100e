#!/usr/bin/env python
"""r18 envelope triangulation — the rule-decided final adjudication
stage for rows the single-round (r17-archive) remeasure rules left
INVESTIGATE, upgraded per VERDICT_r17 task 3 and ADVICE_r17 items 1-2:

1. (ADVICE_r17 #1 / VERDICT_r17 task 3) The r17 envelope declared
   "noise" on parity with ANY one green archive (min ratio over
   rounds) — a leniency that grows as green archives accumulate and
   can ratchet each row against its fastest-ever round while the
   fleet-wide median drifts up (r17 local totals: 96.4 -> 103.8 s at
   flat canary). Two guards now make that visible and bounded:
     - every envelope verdict also records `median_of_archives_ratio`
       (the row's canary-adjusted ratio vs the MEDIAN of its
       plan-identical green archives) and `dissenting_rounds` (how
       many plan-identical archives would individually flag it), so
       one favorable archive can never silently carry a verdict;
     - a ROUND-level rule (`round_drift_verdict`, pure, pinned):
       if more than a third of the remeasured headline rows exceed
       threshold x their median-of-archives, the ROUND (not the row)
       is flagged RERUN_ROUND for a quiet-machine full rerun —
       per-row verdicts stand, but the artifact demands the rerun.
2. (ADVICE_r17 #2) The canary-envelope comparison is now symmetric:
   today's statistic is best-of-all-today's-samples, so each archive
   denominator is likewise best over the archive's timed row AND its
   interleaved per-block canary samples (`archive_canary_best`),
   best-of-comparable-pools on both sides.

Per-row noise/INVESTIGATE semantics are otherwise unchanged from r17
(VERDICT_r17 endorsed them): a row is noise iff its plan-audit entry
is IDENTICAL to a green archived round's AND its canary-adjusted
ratio vs at least one such round is <= threshold. The drift guard is
deliberately round-level — tightening the per-row rule to
median-of-archives would manufacture INVESTIGATEs on rows that merely
have a noisy archive history, which is exactly the failure mode the
envelope exists to absorb.

Inputs are the already-written measurement artifacts
(remeasure_r18_out.json and, if present, remeasure_r18_rerun_out.json
— this script performs NO timing of its own), the r12-r17 local bench
archives, and the per-round plan audits (current round:
plan_audit_r18.json). Output: remeasure_r18_final.json.

Usage: python scripts/remeasure_envelope_r18.py   (from anywhere)
"""

from __future__ import annotations

import json
import os

THRESHOLD = 1.10
# Round-level drift guard: strictly more than this fraction of the
# remeasured headline rows above THRESHOLD x median-of-archives flags
# the ROUND for a quiet-machine rerun.
ROUND_FLAG_FRACTION = 1 / 3

# Archived local bench runs at externally-green HEADs, with the plan
# audit that covers each HEAD. r11 is excluded: its plan-audit schema
# predates the current counter set.
ARCHIVES: list[tuple[str, str, str]] = [
    ("r12", "bench_r12_local.json", "plan_audit_r12.json"),
    ("r13", "bench_r13_local.json", "plan_audit_r13.json"),
    ("r14", "bench_r14_local.json", "plan_audit_r14.json"),
    ("r14_rerun", "bench_r14_local_rerun.json", "plan_audit_r14.json"),
    ("r15", "bench_r15_local.json", "plan_audit_r15.json"),
    ("r16", "bench_r16_local.json", "plan_audit_r16.json"),
    ("r17", "bench_r17_local.json", "plan_audit_r17.json"),
]

CURRENT_AUDIT = "plan_audit_r18.json"


def _upper_median(xs: list[float]) -> float:
    # sorted[n//2]: the same convention as every archive's canary
    # median_sec, kept so ratios bias the same way everywhere
    return sorted(xs)[len(xs) // 2]


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
) -> tuple[str, list[str], str]:
    """Round-level drift guard (VERDICT_r17 task 3).

    median_ratios maps each remeasured headline row to its
    median-of-archives adjusted ratio. If strictly more than
    max_fraction of the rows exceed threshold, the per-row envelope is
    being carried by favorable archive tails fleet-wide — flag the
    ROUND for a quiet-machine full rerun. Per-row verdicts stand
    either way; the flag is about this machine-round's trustworthiness.
    Returns (verdict, rows above threshold, rationale).
    """
    flagged = sorted(n for n, r in median_ratios.items() if r > threshold)
    n = len(median_ratios)
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
        f"{max_fraction:.2f} of the set)",
    )


def archive_canary_best(bench: dict, canary: str = "pricing_summary") -> float:
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
    """name -> round -> (plan_audit entry equals r18's entry)."""
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
    for fn in ("remeasure_r18_out.json", "remeasure_r18_rerun_out.json"):
        path = os.path.join(repo, fn)
        if os.path.exists(path):
            with open(path) as fh:
                runs.append((fn, json.load(fh)))
    assert runs, "no remeasure_r18 artifacts found"

    # every target measured in either run; the rerun supersedes the
    # first run where both measured
    rows: dict[str, dict] = {}
    for fn, art in runs:
        for name, row in art["queries"].items():
            rows[name] = {"source": fn, "canary_median": art["canary_median"], **row}

    identity = _plan_identity(repo, list(rows))

    out = {
        "protocol": (
            "consolidates the remeasure_r18 artifacts; rows the "
            "single-round (r17-archive) rules left INVESTIGATE get the "
            "envelope rule: plan-identity-gated canary-adjusted comparison "
            "against EVERY green r12-r17 local archive; noise iff at "
            "parity with at least one, with median-of-archives ratio and "
            "dissenting-round count embedded per row (ADVICE_r17 #1). The "
            "canary query uses raw best-to-best of symmetric pools "
            "(ADVICE_r17 #2). A round-level drift guard flags the ROUND "
            "for a quiet rerun when >1/3 of remeasured headline rows "
            "exceed 1.10x their median-of-archives (VERDICT_r17 task 3)."
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
        if name == "pricing_summary":
            # symmetric best-of-pool on both sides (ADVICE_r17 #2)
            per_raw = {
                rnd: archive_canary_best(b) for rnd, b in benches.items()
                if name in b["queries"]
            }
            samples: dict[str, float] = {}
            for fn, art in runs:
                samples[fn + ":canary_runs"] = min(art["canary_runs"])
            bench18 = os.path.join(repo, "bench_r18_local.json")
            if os.path.exists(bench18):
                with open(bench18) as fh:
                    b18 = json.load(fh)
                samples["bench_r18_local.json:pool"] = archive_canary_best(b18)
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

    drift_verdict, drift_rows, drift_rationale = round_drift_verdict(drift_inputs)
    out["round_drift_guard"] = {
        "verdict": drift_verdict,
        "rows_above_median_threshold": drift_rows,
        "median_ratios": drift_inputs,
        "rationale": drift_rationale,
    }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
