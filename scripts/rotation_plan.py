#!/usr/bin/env python
"""Rotation-policy bookkeeping for the catalog's priority-50
(`queries/catalog.py` ROTATION POLICY).

Reads every shipped CORRECTNESS_r*.json, computes per-entry external
check history and consecutive-out streaks, and reports:

- entries that have NEVER had an external driver row (must be in next
  round's 50 — rule 2);
- entries whose out-streak has reached the rule-3 bound (no entry out
  more than two consecutive rounds ⇒ streak-2 entries MUST be in);
- whether the CURRENT ``_PRIORITY`` satisfies the policy against that
  history (exit 1 if not).

Run from the repo root: ``python scripts/rotation_plan.py``.
tests/test_entry.py pins the same check in CI so a round that adds
entries or forgets to rotate fails loudly instead of silently
starving an entry of external verification.

``--propose`` additionally prints the NEXT round's slot arithmetic
from the shipped history: the fixed slots (anchors + rule-2
never-checked + rule-3 streak-2 must-returns), the free-slot count,
and the streak-1 holdovers ranked as filler candidates — run it FIRST
thing each round, after the driver writes the new CORRECTNESS file.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANCHORS = (
    "mart_supplier_performance", "mart_product_performance",
    "mart_customer_sales_report", "pipeline_customer_sales_report",
    "recon_row_summary", "recon_mismatched_cells",
    "recon_column_mismatches", "recon_sample_mismatches",
    "recon_extra_rows",
)


def history() -> dict[int, set[str]]:
    """round number -> entry names that got an external row that round."""
    out: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        out[rnd] = set(json.load(open(path)))
    return out


def audit(priority: tuple[str, ...], names: list[str]) -> tuple[list[str], dict]:
    """Policy violations for ``priority`` given shipped history.

    An entry's out-streak counts consecutive COMPLETED rounds (since it
    first appeared in any round) without an external row; entries born
    after the last round have streak 0 but belong to the never-run set.
    """
    rounds = history()
    if not rounds:
        return [], {}
    last = max(rounds)
    streaks: dict[str, int] = {}
    never: list[str] = []
    for n in names:
        appeared = [r for r in rounds if n in rounds[r]]
        if not appeared:
            never.append(n)
            continue
        s = 0
        for r in range(last, min(appeared), -1):
            if r not in rounds:  # a gap in the shipped round files is
                continue  # not an "out" round — only real rounds count
            if n in rounds[r]:
                break
            s += 1
        streaks[n] = s

    errs: list[str] = []
    pset = set(priority)
    if len(priority) != 50:
        errs.append(f"priority list has {len(priority)} entries, driver checks 50")
    if len(pset) != len(priority):
        errs.append("priority list has duplicates")
    for a in ANCHORS:
        if a not in pset:
            errs.append(f"anchor {a} missing from priority (rule 1)")
    for n in never:
        if n not in pset:
            errs.append(f"{n} has never had an external row and is not prioritized (rule 2)")
    for n, s in streaks.items():
        if s >= 2 and n not in pset:
            errs.append(f"{n} out for {s} consecutive rounds and still out (rule 3)")
    unknown = [n for n in priority if n not in names]
    if unknown:
        errs.append(f"priority names not in catalog: {unknown}")
    return errs, {"never": never, "streaks": streaks, "last_round": last}


def main() -> int:
    from sahithi_metamorph_etl_spark.queries import catalog

    names = list(catalog.all_queries())
    priority = catalog._PRIORITY
    errs, info = audit(priority, names)
    print(f"catalog entries: {len(names)}; last external round: r{info.get('last_round')}")
    never = info.get("never", [])
    print(f"never externally checked: {never or 'none'}")
    due = sorted(
        (n for n, s in info.get("streaks", {}).items() if s >= 1 and n not in set(priority)),
        key=lambda n: -info["streaks"][n],
    )
    if due:
        print("out and accruing streak (must return within rule-3 bound):")
        for n in due:
            print(f"  {n}: out {info['streaks'][n]} round(s)")
    if "--propose" in sys.argv:
        streaks = info.get("streaks", {})
        must = sorted(n for n, s in streaks.items() if s >= 2)
        fixed = list(ANCHORS) + [n for n in never if n not in ANCHORS] + [
            n for n in must if n not in ANCHORS and n not in never
        ]
        print(f"\nPROPOSAL for the round after r{info.get('last_round')}:")
        print(f"  anchors: {len(ANCHORS)}")
        print(f"  rule-2 never-checked: {len(never)} {never or ''}")
        print(f"  rule-3 must-returns (streak>=2): {len(must)}")
        for n in must:
            print(f"    {n}")
        free = 50 - len(fixed)
        print(f"  fixed slots: {len(fixed)}  ->  free filler slots: {free}")
        if free < 0:
            print("  IMPOSSIBLE: fixed slots exceed 50 — the policy cannot be met")
            return 1
        fillers = sorted(
            (n for n, s in streaks.items() if s == 1 and n not in set(fixed)),
            key=str,
        )
        print(f"  streak-1 filler candidates ({len(fillers)}, pick one per family;")
        print("  unchosen ones become the NEXT round's must-returns):")
        for n in fillers:
            print(f"    {n}")

    if errs:
        print("POLICY VIOLATIONS:")
        for e in errs:
            print(f"  - {e}")
        return 1
    print("priority-50 satisfies the rotation policy.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
