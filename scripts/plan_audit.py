#!/usr/bin/env python
"""Exhaustive plan-shape audit: build EVERY catalog entry's DataFrame
and record its `operators.plancheck.plan_summary` counters — the
machine-generated companion to PLANS.md's prose audits, so plan-shape
regressions (a broadcast falling back to SMJ, a Python stage creeping
into a JVM path, an un-partitioned window appearing) surface as a
diffable artifact instead of requiring a manual `.explain` pass per
entry.

Entries whose fn() RETURNS a driver-localized frame (the ANN
recall-summary entries and other `createDataFrame(collect())`
localizations, plus streaming entries that run to memory) show the
trivial plan of the RESULT — their lifecycle plans are audited in
PLANS.md prose and pinned by tests; the audit marks them `localized`.

Usage: python scripts/plan_audit.py [sf_dir]   (default sf0.001 —
plan shape is scale-independent; small inputs keep the entries that
execute work in fn() fast). Prints one JSON object; summary lines on
stderr. Paste-worthy table: scripts/plan_audit.py --table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sahithi_metamorph_etl_spark.core.session import get_spark  # noqa: E402
from sahithi_metamorph_etl_spark.operators.plancheck import (  # noqa: E402
    _plan_string,
    plan_summary,
)
from sahithi_metamorph_etl_spark.queries.catalog import all_queries  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_table = "--table" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_audit")

    out: dict[str, dict] = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
            s = plan_summary(df)
            plan = _plan_string(df)
            localized = (
                "LocalTableScan" in plan or "Scan ExistingRDD" in plan
            ) and s.file_scans == 0
            out[name] = {
                "shuffles": s.shuffles,
                "broadcasts": s.broadcasts,
                "smj": s.sort_merge_joins,
                "bhj": s.broadcast_hash_joins,
                "pushed_filter_scans": s.pushed_filter_scans,
                "python_stages": s.python_stages,
                "file_scans": s.file_scans,
                "unpartitioned_windows": s.unpartitioned_windows,
                # counts sitting under an InMemoryRelation: cache-BUILD
                # work that runs once at materialization, not per run —
                # subtract before reading the static totals as per-run
                # cost (e.g. doc_minhash_lsh_pairs' persisted band frame
                # repeats its Arrow stage under every self-join branch)
                "python_stages_cached": s.python_stages_cached,
                "shuffles_cached": s.shuffles_cached,
                "localized": localized,
            }
        except Exception as e:  # pragma: no cover - audit must finish
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        spark.catalog.clearCache()

    errs = {n: r for n, r in out.items() if "error" in r}
    live = {n: r for n, r in out.items() if "error" not in r and not r["localized"]}
    print(
        f"entries={len(out)} errors={len(errs)} localized="
        f"{sum(1 for r in out.values() if r.get('localized'))}",
        file=sys.stderr,
    )
    print(
        "smj_entries="
        + ",".join(sorted(n for n, r in live.items() if r["smj"])),
        file=sys.stderr,
    )
    print(
        "unpartitioned_window_entries="
        + ",".join(sorted(n for n, r in live.items() if r["unpartitioned_windows"])),
        file=sys.stderr,
    )
    print(
        "cached_branch_entries (python/shuffle counts partly one-time "
        "cache-build, not per-run)="
        + ",".join(sorted(
            n for n, r in live.items()
            if r["python_stages_cached"] or r["shuffles_cached"]
        )),
        file=sys.stderr,
    )
    worst = sorted(live.items(), key=lambda kv: -kv[1]["shuffles"])[:10]
    print(
        "most_shuffles=" + ",".join(f"{n}:{r['shuffles']}" for n, r in worst),
        file=sys.stderr,
    )
    if as_table:
        hdr = "| entry | shuf | bcast | smj | py | scans | unpart-win |"
        print(hdr + "\n|" + "---|" * 7)
        for n, r in sorted(out.items()):
            if "error" in r:
                print(f"| `{n}` | ERROR: {r['error']} |")
            elif r["localized"]:
                print(f"| `{n}` | localized result — lifecycle audited in prose |")
            else:
                print(
                    f"| `{n}` | {r['shuffles']} | {r['broadcasts']} | {r['smj']} "
                    f"| {r['python_stages']} | {r['file_scans']} "
                    f"| {r['unpartitioned_windows']} |"
                )
    else:
        print(json.dumps({"sf_dir": sf_dir, "entries": out}))


if __name__ == "__main__":
    main()
