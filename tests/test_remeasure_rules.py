"""Pins for the r17 remeasure verdict rules (VERDICT_r16 task 2 +
ADVICE_r16 items 1-3).

These test the PURE rule functions in scripts/remeasure_r17.py — no
Spark session needed. They fail against the r16 script (which had no
canary rule, no median flag, and a hardcoded empty CHANGED set).
"""

from __future__ import annotations

import importlib.util
import os

import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "remeasure_r17",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "remeasure_r17.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rules():
    return _load()


# --- canary self-normalization rule (ADVICE_r16 #1 / verdict task 2) ---

def test_canary_rule_r16_pricing_summary_scenario(rules):
    # The exact r16 adjudication the rule codifies: raw best-to-best
    # 1.094 vs the quiet r13 archive, canary medians 0.542 vs 0.487
    # (precondition holds: 0.542 <= 1.15 * 0.487). Must come out
    # "noise" from the RULE, no manual adjudication block.
    verdict, rationale = rules.canary_rule_verdict(1.094, 0.542, 0.487)
    assert verdict == "noise"
    assert "RAW best-to-best" in rationale  # rationale embedded in artifact


def test_canary_rule_precondition_blocks_raw_comparison(rules):
    # A loud machine (canary median well above tol x quiet archive)
    # must NOT emit a noise verdict even if the raw ratio looks fine.
    verdict, rationale = rules.canary_rule_verdict(0.95, 0.80, 0.487)
    assert verdict == "INVESTIGATE"
    assert "precondition" in rationale


def test_canary_rule_flags_real_regression(rules):
    verdict, rationale = rules.canary_rule_verdict(1.30, 0.50, 0.487)
    assert verdict == "INVESTIGATE"
    assert "1.300" in rationale


def test_canary_rule_never_canary_adjusts(rules):
    # Self-correlation guard: the rule's inputs are the RAW ratio and
    # the two canary medians — identical raw ratios under different
    # (quiet) canary medians must yield identical verdicts.
    v1, _ = rules.canary_rule_verdict(1.05, 0.50, 0.487)
    v2, _ = rules.canary_rule_verdict(1.05, 0.43, 0.487)
    assert v1 == v2 == "noise"


# --- median visibility (ADVICE_r16 #2) ---

def test_row_verdict_noise_both_statistics(rules):
    assert rules.row_verdict("q", 0.98, 1.02) == ("noise", False)


def test_row_verdict_median_dissent_is_machine_visible(rules):
    # The r16 example from the advice: customer_scd2_chain best-adj
    # passed but median-adj 1.149 would flag — the verdict stays
    # best-decided but the dissent must be returned as a flag.
    verdict, median_would_flag = rules.row_verdict("customer_scd2_chain", 1.04, 1.149)
    assert verdict == "noise"
    assert median_would_flag is True


def test_row_verdict_investigate(rules):
    verdict, median_would_flag = rules.row_verdict("q", 1.25, 1.30)
    assert verdict == "INVESTIGATE"
    assert median_would_flag is True


# --- CHANGED from argv (ADVICE_r16 #3) ---

# --- envelope triangulation (r17 final adjudication stage) ---

def _load_envelope():
    spec = importlib.util.spec_from_file_location(
        "remeasure_envelope_r17",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "remeasure_envelope_r17.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def envelope():
    return _load_envelope()


def test_envelope_r17_gif_frames_scenario(envelope):
    # The exact r17 case the rule codifies: multimodal_gif_frames
    # measured best 1.676s under canary median 0.562 flags 1.16x vs the
    # r16 archive (1.396/0.542) but is at parity with the
    # plan-identical green r14 archive (1.856/0.591) — the r16 flag was
    # an artifact of r16 catching the row at its fast tail.
    verdict, ratios, rationale = envelope.envelope_verdict(
        "multimodal_gif_frames",
        best=1.676,
        canary_median=0.562,
        per_round={"r16": (1.396, 0.542), "r14": (1.856, 0.591)},
        plan_identical={"r16": True, "r14": True},
    )
    assert verdict == "noise"
    # ADVICE_r17 #3: the earlier chained form `> 1.10 < 1.16` parsed as
    # (ratio > 1.10) and (1.10 < 1.16), never checking the upper bound
    assert 1.10 < ratios["r16"] < 1.16  # the single-round rule's flag ...
    assert ratios["r14"] <= 1.10  # ... dissolved by a green round at parity
    assert "r14" in rationale


def test_envelope_requires_plan_identity(envelope):
    # A round whose plan-audit entry differs is EXCLUDED from the
    # envelope; with no identical round left the rule cannot apply.
    verdict, ratios, rationale = envelope.envelope_verdict(
        "q", 1.0, 0.5, {"r14": (1.2, 0.5)}, plan_identical={"r14": False}
    )
    assert verdict == "INVESTIGATE"
    assert ratios == {}
    assert "plan-identical" in rationale


def test_envelope_flags_true_regression(envelope):
    # A real regression predates NO archive: slower than every
    # plan-identical green round stays INVESTIGATE.
    verdict, ratios, _ = envelope.envelope_verdict(
        "q",
        best=2.0,
        canary_median=0.5,
        per_round={"r15": (1.0, 0.5), "r16": (1.1, 0.5)},
        plan_identical={"r15": True, "r16": True},
    )
    assert verdict == "INVESTIGATE"
    assert all(r > 1.10 for r in ratios.values())


def test_canary_envelope_r17_pricing_summary_scenario(envelope):
    # The exact r17 case: remeasure raw best 0.484s fails the quiet-r13
    # precondition (canary median 0.562 > 1.15 x 0.487) but is 1.083x
    # the plan-identical green r16 archive's raw 0.447s — noise, raw
    # comparison, never canary-adjusted.
    verdict, ratios, rationale = envelope.canary_envelope_verdict(
        best=0.484,
        per_round_raw={"r13": 0.33, "r16": 0.447},
        plan_identical={"r13": True, "r16": True},
    )
    assert verdict == "noise"
    assert ratios["r16"] == pytest.approx(1.083, abs=1e-3)
    assert ratios["r13"] > 1.10  # quiet-r13 alone would NOT close it
    assert "raw best" in rationale


def test_canary_envelope_flags_true_regression(envelope):
    verdict, _, rationale = envelope.canary_envelope_verdict(
        best=0.60, per_round_raw={"r16": 0.447}, plan_identical={"r16": True}
    )
    assert verdict == "INVESTIGATE"
    assert "EVERY" in rationale


def test_changed_path_branch_reachable_only_by_declaration(rules):
    # No module-level CHANGED constant (the r16 dead-code shape) ...
    assert not hasattr(rules, "CHANGED")
    # ... the branch is reached via the caller-declared set:
    assert rules.row_verdict("q", 1.25, 1.25, changed={"q"})[0] == (
        "changed-path (expected)"
    )
    # ... and without declaration the same ratios INVESTIGATE:
    assert rules.row_verdict("q", 1.25, 1.25, changed=set())[0] == "INVESTIGATE"
