"""Pins for the r19 remeasure rules (ADVICE_r18 items 1-2 +
VERDICT_r18 task 5's mechanical rollforward).

These test the PURE rule functions in scripts/remeasure_r19.py and
scripts/remeasure_envelope_r19.py — no Spark session needed. They fail
against the r18 scripts: r18 has no `sub_second_rule` (its sub-second
gate also admitted `best < 1.0`, the ADVICE_r18 #1 reroute), its
`round_drift_verdict` has no minimum-n floor (ADVICE_r18 #2), its
CANARY2_ARCHIVE lacks the r18 baselines, and its envelope ARCHIVES
lack the r18 same-HEAD pair.
"""

from __future__ import annotations

import importlib.util
import os

import pytest


def _load(fn: str):
    spec = importlib.util.spec_from_file_location(
        fn.removesuffix(".py"),
        os.path.join(os.path.dirname(__file__), "..", "scripts", fn),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rules():
    return _load("remeasure_r19.py")


@pytest.fixture(scope="module")
def envelope():
    return _load("remeasure_envelope_r19.py")


# --- sub-second gate on archive-of-record only (ADVICE_r18 #1) ---

def test_sub_second_rule_is_archive_only(rules):
    # The rule is a function of the archive time ALONE: it takes no
    # current-round sample at all, so a lucky best can't reroute a row.
    assert rules.sub_second_rule(0.9) is True
    assert rules.sub_second_rule(1.0) is False  # strict <, documented
    assert rules.sub_second_rule(2.5) is False


def test_heavy_row_with_subsecond_best_stays_on_canary2(rules):
    # The exact ADVICE_r18 #1 scenario: archive 2.5 s (heavy), current
    # best dipped to 0.9 s. r18's `or best < 1.0` gate would have sent
    # this row to the quiet-r13 light-canary path; r19 must keep it on
    # the canary2 denominator decisive_statistic promises for heavy
    # rows. sub_second_rule sees only the archive time → False →
    # decisive_statistic picks canary2.
    assert rules.sub_second_rule(2.5) is False
    dec, best, med = rules.decisive_statistic(
        archive_sec=2.5,
        adj_light_best=0.40,
        adj_light_median=0.44,
        adj_c2_best=0.42,
        adj_c2_median=0.46,
    )
    assert dec == "canary2"
    assert best == 0.42 and med == 0.46


def test_midweight_row_with_subsecond_best_stays_on_light(rules):
    # Same fix, light regime: archive 1.4 s is neither sub-second nor
    # heavy; a 0.8 s best must not divert it to quiet-r13.
    assert rules.sub_second_rule(1.4) is False
    dec, _, _ = rules.decisive_statistic(1.4, 1.01, 1.03, None, None)
    assert dec == "light"


def test_archive_subsecond_row_takes_quiet_r13(rules):
    # The triangulation route still exists for genuinely sub-second
    # rows (archive-of-record under 1.0 s).
    assert rules.sub_second_rule(0.55) is True


# --- canary2 archive rollforward (VERDICT_r18 task 5) ---

def test_canary2_archive_table_carries_r17_and_r18_baselines(rules):
    # r17 entries carried verbatim; r18 appended from
    # bench_r18_local.json (quiet pass) and BENCH_r18.json canary2.
    assert rules.CANARY2_ARCHIVE["r17_local"] == pytest.approx(2.664)
    assert rules.CANARY2_ARCHIVE["r17_driver"] == pytest.approx(2.767)
    assert rules.CANARY2_ARCHIVE["r18_local"] == pytest.approx(2.445)
    assert rules.CANARY2_ARCHIVE["r18_driver"] == pytest.approx(2.965)


def test_heavy_row_uses_canary2_denominator(rules):
    dec, best, med = rules.decisive_statistic(
        archive_sec=3.789,  # emb_sq8_ivf_topk's r18 driver time
        adj_light_best=1.18,
        adj_light_median=1.22,
        adj_c2_best=1.04,
        adj_c2_median=1.07,
    )
    assert dec == "canary2"
    assert best == 1.04 and med == 1.07


def test_heavy_row_without_canary2_falls_back_to_light(rules):
    dec, best, _ = rules.decisive_statistic(5.0, 1.08, 1.12, None, None)
    assert dec == "light"
    assert best == 1.08


# --- drift-guard minimum-n floor (ADVICE_r18 #2) ---

def test_round_drift_small_n_cannot_rerun_round(envelope):
    # The exact ADVICE_r18 #2 degenerate case: n=1 with the single row
    # at 1.11x median-of-archives. r18's rule flagged RERUN_ROUND
    # (1/1 > 1/3); r19 must return OK_SMALL_N — and still LIST the row
    # so nothing is hidden.
    verdict, flagged, rationale = envelope.round_drift_verdict({"q": 1.11})
    assert verdict == "OK_SMALL_N"
    assert flagged == ["q"]
    assert "per-row" in rationale


def test_round_drift_small_n_boundary(envelope):
    # n=2 is still below the floor; n=3 is the first set where the
    # fraction rule applies (and 2/3 > 1/3 fires it).
    assert envelope.MIN_DRIFT_ROWS == 3
    v2, _, _ = envelope.round_drift_verdict({"a": 1.5, "b": 1.5})
    assert v2 == "OK_SMALL_N"
    v3, flagged3, _ = envelope.round_drift_verdict(
        {"a": 1.5, "b": 1.5, "c": 1.0}
    )
    assert v3 == "RERUN_ROUND"
    assert flagged3 == ["a", "b"]


def test_round_drift_small_n_all_quiet_is_still_ok_small_n(envelope):
    # Below the floor the verdict names the regime even when nothing is
    # flagged, so the artifact shows the guard was size-suppressed
    # rather than silently passing.
    verdict, flagged, _ = envelope.round_drift_verdict({"q": 1.0})
    assert verdict == "OK_SMALL_N"
    assert flagged == []


def test_round_drift_at_or_above_floor_unchanged_from_r18(envelope):
    # At n >= 3 the r18 semantics are untouched: strictly more than a
    # third flags, exactly a third does not, empty set is OK.
    ratios = {f"q{i}": 1.0 for i in range(6)} | {
        "h1": 1.15, "h2": 1.2, "h3": 1.25, "h4": 1.3
    }
    verdict, flagged, rationale = envelope.round_drift_verdict(ratios)
    assert verdict == "RERUN_ROUND"  # 4/10 > 1/3
    assert flagged == ["h1", "h2", "h3", "h4"]
    assert "quiet machine" in rationale
    v, flagged_third, _ = envelope.round_drift_verdict(
        {"a": 1.2, "b": 1.0, "c": 1.0}
    )
    assert v == "OK" and flagged_third == ["a"]
    assert envelope.round_drift_verdict({})[0] == "OK"


def test_round_drift_is_round_level_not_row_level(envelope):
    quiet_but_one = {f"q{i}": 0.98 for i in range(9)} | {"bad": 3.0}
    assert envelope.round_drift_verdict(quiet_but_one)[0] == "OK"
    mild_everywhere = {f"q{i}": 1.12 for i in range(10)}
    assert envelope.round_drift_verdict(mild_everywhere)[0] == "RERUN_ROUND"


# --- envelope archive rollforward (VERDICT_r18 tasks 4-5) ---

def test_envelope_archives_include_both_r18_passes(envelope):
    # Both same-HEAD r18 bench passes (quiet 94.6 s + loaded 107.0 s —
    # the machine-round envelope) join the archive table, both covered
    # by plan_audit_r18.json, following the r14/r14_rerun precedent.
    table = {rnd: (bench, audit) for rnd, bench, audit in envelope.ARCHIVES}
    assert table["r18"] == ("bench_r18_local.json", "plan_audit_r18.json")
    assert table["r18_rerun"] == (
        "bench_r18_local_rerun.json", "plan_audit_r18.json"
    )
    assert table["r17"] == ("bench_r17_local.json", "plan_audit_r17.json")
    assert envelope.CURRENT_AUDIT == "plan_audit_r19.json"


# --- carried r17/r18 rules, re-pinned against the r19 modules ---

def test_envelope_records_median_and_dissent(envelope):
    verdict, ratios, stats, rationale = envelope.envelope_verdict(
        "q",
        best=1.2,
        canary_median=0.5,
        per_round={"r14": (1.2, 0.5), "r15": (1.0, 0.5), "r16": (1.05, 0.5)},
        plan_identical={"r14": True, "r15": True, "r16": True},
    )
    assert verdict == "noise"  # parity with r14 (ratio 1.0)
    assert stats["rounds_compared"] == 3
    assert stats["dissenting_rounds"] == 2
    assert stats["median_of_archives_ratio"] == pytest.approx(1.143, abs=1e-3)
    assert "2/3" in rationale


def test_envelope_requires_plan_identity(envelope):
    verdict, ratios, stats, rationale = envelope.envelope_verdict(
        "q", 1.0, 0.5, {"r14": (1.2, 0.5)}, plan_identical={"r14": False}
    )
    assert verdict == "INVESTIGATE"
    assert ratios == {}
    assert stats["rounds_compared"] == 0
    assert "plan-identical" in rationale


def test_archive_canary_best_pools_block_samples(envelope):
    bench = {
        "queries": {"pricing_summary": 0.447},
        "canary": {"per_block_sec": [[0.51, 0.405, 0.48], [0.46, 0.44]]},
    }
    assert envelope.archive_canary_best(bench) == pytest.approx(0.405)


def test_canary_envelope_symmetric_pool(envelope):
    verdict, ratios, stats, _ = envelope.canary_envelope_verdict(
        best=0.484,
        per_round_raw={"r16": 0.405},
        plan_identical={"r16": True},
    )
    assert ratios["r16"] == pytest.approx(1.195, abs=1e-3)
    assert verdict == "INVESTIGATE"
    assert stats["dissenting_rounds"] == 1


def test_canary_rule_verdict_carried(rules):
    verdict, _ = rules.canary_rule_verdict(1.05, 0.55, 0.52)
    assert verdict == "noise"
    verdict, rationale = rules.canary_rule_verdict(1.05, 0.80, 0.52)
    assert verdict == "INVESTIGATE"
    assert "precondition" in rationale
    verdict, _ = rules.canary_rule_verdict(1.15, 0.55, 0.52)
    assert verdict == "INVESTIGATE"


def test_row_verdict_carried(rules):
    assert rules.row_verdict("q", 1.05, 1.2) == ("noise", True)
    assert rules.row_verdict("q", 1.15, 1.15) == ("INVESTIGATE", True)
    assert rules.row_verdict("q", 1.15, 1.0, {"q"}) == (
        "changed-path (expected)", False
    )
