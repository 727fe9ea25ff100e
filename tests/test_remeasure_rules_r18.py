"""Pins for the r18 remeasure rules (VERDICT_r17 tasks 3-4 +
ADVICE_r17 items 1-2).

These test the PURE rule functions in scripts/remeasure_r18.py and
scripts/remeasure_envelope_r18.py — no Spark session needed. They fail
against the r17 scripts (no canary2 denominator option, no
median-of-archives/dissent fields, no round-level drift guard, and an
asymmetric canary pool).
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
    return _load("remeasure_r18.py")


@pytest.fixture(scope="module")
def envelope():
    return _load("remeasure_envelope_r18.py")


# --- canary2 denominator option (VERDICT_r17 task 4) ---

def test_canary2_archive_table_carries_r17_baselines(rules):
    # r17 is canary2's first sample on both sides; these exact values
    # come from bench_r17_local.json and BENCH_r17.json canary2 blocks.
    assert rules.CANARY2_ARCHIVE["r17_local"] == pytest.approx(2.664)
    assert rules.CANARY2_ARCHIVE["r17_driver"] == pytest.approx(2.767)


def test_heavy_row_uses_canary2_denominator(rules):
    # A heavy row (archive >= HEAVY_CUTOFF) with canary2 measured on
    # both sides is decided by the contention-normalized statistic,
    # not the 0.5s scheduling-latency canary.
    dec, best, med = rules.decisive_statistic(
        archive_sec=3.691,  # emb_sq8_ivf_topk's r17 local archive time
        adj_light_best=1.18,
        adj_light_median=1.22,
        adj_c2_best=1.04,
        adj_c2_median=1.07,
    )
    assert dec == "canary2"
    assert best == 1.04 and med == 1.07


def test_light_row_keeps_light_canary(rules):
    dec, best, med = rules.decisive_statistic(
        archive_sec=0.9,
        adj_light_best=1.02,
        adj_light_median=1.05,
        adj_c2_best=1.30,
        adj_c2_median=1.32,
    )
    assert dec == "light"
    assert best == 1.02 and med == 1.05


def test_heavy_row_without_canary2_falls_back_to_light(rules):
    # e.g. an archive round predating canary2: the option only applies
    # when BOTH sides measured it.
    dec, best, med = rules.decisive_statistic(
        archive_sec=5.0,
        adj_light_best=1.08,
        adj_light_median=1.12,
        adj_c2_best=None,
        adj_c2_median=None,
    )
    assert dec == "light"
    assert best == 1.08


def test_canary2_cutoff_boundary(rules):
    # exactly at the cutoff counts as heavy (>=, documented)
    dec, _, _ = rules.decisive_statistic(
        rules.HEAVY_CUTOFF, 1.0, 1.0, 0.99, 1.0
    )
    assert dec == "canary2"


# --- median-of-archives visibility (ADVICE_r17 #1) ---

def test_envelope_records_median_and_dissent(envelope):
    # Min-rule still closes the row, but the leniency is measurable:
    # two of three plan-identical archives would individually flag it
    # and the median-of-archives ratio is above threshold.
    verdict, ratios, stats, rationale = envelope.envelope_verdict(
        "q",
        best=1.2,
        canary_median=0.5,
        per_round={"r14": (1.2, 0.5), "r15": (1.0, 0.5), "r16": (1.05, 0.5)},
        plan_identical={"r14": True, "r15": True, "r16": True},
    )
    assert verdict == "noise"  # parity with r14 (ratio 1.0)
    assert stats["rounds_compared"] == 3
    assert stats["dissenting_rounds"] == 2  # r15 (1.2) and r16 (~1.143)
    assert stats["median_of_archives_ratio"] == pytest.approx(1.143, abs=1e-3)
    assert "2/3" in rationale  # dissent visible in the rationale too


def test_envelope_unanimous_noise_has_zero_dissent(envelope):
    _, _, stats, _ = envelope.envelope_verdict(
        "q", 1.0, 0.5,
        per_round={"r16": (1.0, 0.5), "r17": (1.05, 0.5)},
        plan_identical={"r16": True, "r17": True},
    )
    assert stats["dissenting_rounds"] == 0
    assert stats["median_of_archives_ratio"] <= 1.0


def test_envelope_requires_plan_identity(envelope):
    verdict, ratios, stats, rationale = envelope.envelope_verdict(
        "q", 1.0, 0.5, {"r14": (1.2, 0.5)}, plan_identical={"r14": False}
    )
    assert verdict == "INVESTIGATE"
    assert ratios == {}
    assert stats["rounds_compared"] == 0
    assert "plan-identical" in rationale


def test_envelope_flags_true_regression(envelope):
    verdict, ratios, stats, _ = envelope.envelope_verdict(
        "q",
        best=2.0,
        canary_median=0.5,
        per_round={"r15": (1.0, 0.5), "r16": (1.1, 0.5)},
        plan_identical={"r15": True, "r16": True},
    )
    assert verdict == "INVESTIGATE"
    assert stats["dissenting_rounds"] == stats["rounds_compared"] == 2


# --- round-level drift guard (VERDICT_r17 task 3) ---

def test_round_drift_flags_when_over_a_third_exceed(envelope):
    ratios = {f"q{i}": 1.0 for i in range(6)} | {
        "h1": 1.15, "h2": 1.2, "h3": 1.25, "h4": 1.3
    }
    verdict, flagged, rationale = envelope.round_drift_verdict(ratios)
    assert verdict == "RERUN_ROUND"  # 4/10 > 1/3
    assert flagged == ["h1", "h2", "h3", "h4"]
    assert "quiet machine" in rationale


def test_round_drift_ok_at_exactly_a_third(envelope):
    # strictly MORE than a third flags; exactly a third does not
    ratios = {"a": 1.2, "b": 1.0, "c": 1.0}
    verdict, flagged, _ = envelope.round_drift_verdict(ratios)
    assert verdict == "OK"
    assert flagged == ["a"]


def test_round_drift_empty_set_is_ok(envelope):
    assert envelope.round_drift_verdict({})[0] == "OK"


def test_round_drift_is_round_level_not_row_level(envelope):
    # The guard never touches per-row verdicts: a single catastrophic
    # row in a big quiet set stays an OK round (that row is the per-row
    # rules' job), while fleet-wide mild drift flags the round.
    quiet_but_one = {f"q{i}": 0.98 for i in range(9)} | {"bad": 3.0}
    assert envelope.round_drift_verdict(quiet_but_one)[0] == "OK"
    mild_everywhere = {f"q{i}": 1.12 for i in range(10)}
    assert envelope.round_drift_verdict(mild_everywhere)[0] == "RERUN_ROUND"


# --- symmetric canary pools (ADVICE_r17 #2) ---

def test_archive_canary_best_pools_block_samples(envelope):
    # The exact ADVICE_r17 #2 example: r16's queries value is 0.447 but
    # its own canary blocks contain 0.405 — the archive side must be
    # the min over BOTH, matching how the current-round side pools.
    bench = {
        "queries": {"pricing_summary": 0.447},
        "canary": {"per_block_sec": [[0.51, 0.405, 0.48], [0.46, 0.44]]},
    }
    assert envelope.archive_canary_best(bench) == pytest.approx(0.405)


def test_archive_canary_best_without_blocks(envelope):
    bench = {"queries": {"pricing_summary": 0.5}}
    assert envelope.archive_canary_best(bench) == pytest.approx(0.5)


def test_canary_envelope_symmetric_pool_changes_verdict(envelope):
    # With the r17 asymmetric rule, best 0.484 vs r16's single value
    # 0.447 gave 1.083 (noise). The symmetric pool (denominator 0.405)
    # gives 1.195 — the same measurement must now look to OTHER
    # plan-identical rounds for parity rather than banking the
    # asymmetry. Here no other round is identical, so it stays open.
    verdict, ratios, stats, _ = envelope.canary_envelope_verdict(
        best=0.484,
        per_round_raw={"r16": 0.405},
        plan_identical={"r16": True},
    )
    assert ratios["r16"] == pytest.approx(1.195, abs=1e-3)
    assert verdict == "INVESTIGATE"
    assert stats["dissenting_rounds"] == 1


def test_canary_envelope_noise_with_parity_round(envelope):
    verdict, ratios, stats, rationale = envelope.canary_envelope_verdict(
        best=0.44,
        per_round_raw={"r16": 0.405, "r17": 0.42},
        plan_identical={"r16": True, "r17": True},
    )
    assert verdict == "noise"
    assert ratios["r17"] == pytest.approx(1.048, abs=1e-3)
    assert "best-of-pool" in rationale
    assert stats["rounds_compared"] == 2
