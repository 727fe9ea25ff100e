"""Property-based tests (hypothesis) for the r20 remeasure rule
functions in scripts/remeasure_r20.py and
scripts/remeasure_envelope_r20.py (rolled forward from the r19
modules they were first written against — the rules are carried
verbatim, so the invariants must keep holding).

The example pins in tests/test_remeasure_rules_r20.py freeze the
specific ADVICE_r18/ADVICE_r19 scenarios; these properties freeze the
rules' INVARIANTS over the whole input space — verdict domains,
flag-set soundness, regime-selection totality, threshold
monotonicity, drift-pool scale-homogeneity — so a future mechanical
rollforward (r21+) that accidentally perturbs an edge case (ties at
the threshold, the exact 1/3 fraction, the min-n floor boundary, an
empty archive set) fails loudly rather than only on the examples the
advice happened to name.

Pure functions only — no Spark session, no filesystem beyond the
module load.
"""

from __future__ import annotations

import importlib.util
import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _load(fn: str):
    spec = importlib.util.spec_from_file_location(
        fn.removesuffix(".py"),
        os.path.join(os.path.dirname(__file__), "..", "scripts", fn),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


RULES = _load("remeasure_r20.py")
ENVELOPE = _load("remeasure_envelope_r20.py")

# Finite, positive, sane-magnitude ratios/seconds — the domain the
# rules are defined over (bench rows are positive finite seconds).
ratio = st.floats(min_value=0.01, max_value=100.0,
                  allow_nan=False, allow_infinity=False)
seconds = st.floats(min_value=0.001, max_value=1000.0,
                    allow_nan=False, allow_infinity=False)
names = st.text(alphabet="abcdefghij_", min_size=1, max_size=12)
ratio_map = st.dictionaries(names, ratio, max_size=25)


# --- round_drift_verdict (ADVICE_r18 #2 floor + r17 fraction rule) ---

@given(ratio_map)
@settings(max_examples=300)
def test_drift_verdict_domain_and_flag_soundness(ratios):
    verdict, flagged, rationale = ENVELOPE.round_drift_verdict(ratios)
    assert verdict in ("OK", "OK_SMALL_N", "RERUN_ROUND")
    # flagged is exactly the sorted rows strictly above threshold —
    # regardless of verdict, nothing is hidden and nothing invented
    expect = sorted(n for n, r in ratios.items() if r > ENVELOPE.THRESHOLD)
    assert flagged == expect
    assert isinstance(rationale, str) and rationale


@given(ratio_map)
@settings(max_examples=300)
def test_drift_verdict_regime_matches_size_and_fraction(ratios):
    verdict, flagged, _ = ENVELOPE.round_drift_verdict(ratios)
    n = len(ratios)
    if n == 0:
        assert verdict == "OK"
    elif n < ENVELOPE.MIN_DRIFT_ROWS:
        # the floor: a small set can never demand a round rerun
        assert verdict == "OK_SMALL_N"
    elif len(flagged) > ENVELOPE.ROUND_FLAG_FRACTION * n:
        assert verdict == "RERUN_ROUND"
    else:
        assert verdict == "OK"


@given(ratio_map, ratio)
@settings(max_examples=200)
def test_drift_verdict_threshold_monotone(ratios, bump):
    # raising the threshold can only shrink the flag set
    _, low_flags, _ = ENVELOPE.round_drift_verdict(
        ratios, threshold=ENVELOPE.THRESHOLD
    )
    _, high_flags, _ = ENVELOPE.round_drift_verdict(
        ratios, threshold=ENVELOPE.THRESHOLD + abs(bump)
    )
    assert set(high_flags) <= set(low_flags)


# --- drift_pool (ADVICE_r19 #3 scale homogeneity) ---

@given(ratio_map)
@settings(max_examples=300)
def test_drift_pool_excludes_exactly_the_canary(ratios):
    pool = ENVELOPE.drift_pool(ratios)
    # the pool is the input minus the canary row, values untouched —
    # never drops a comparable row, never invents one
    assert pool == {n: r for n, r in ratios.items() if n != ENVELOPE.CANARY}
    assert ENVELOPE.CANARY not in pool
    with_canary = dict(ratios)
    with_canary[ENVELOPE.CANARY] = 1.5
    pool2 = ENVELOPE.drift_pool(with_canary)
    assert ENVELOPE.CANARY not in pool2
    assert pool2 == pool


# --- envelope_stats (ADVICE_r17 #1 leniency visibility) ---

@given(ratio_map)
@settings(max_examples=300)
def test_envelope_stats_invariants(ratios):
    stats = ENVELOPE.envelope_stats(ratios)
    assert stats["rounds_compared"] == len(ratios)
    assert stats["dissenting_rounds"] == sum(
        1 for r in ratios.values() if r > ENVELOPE.THRESHOLD
    )
    if ratios:
        med = stats["median_of_archives_ratio"]
        vals = sorted(ratios.values())
        # upper median: the sorted[n//2] element (rounded to 3 dp)
        assert med == pytest.approx(round(vals[len(vals) // 2], 3))
        # med is rounded to 3 dp, so allow half-ulp-of-rounding slack
        assert min(vals) - 5e-4 <= med <= max(vals) + 5e-4
    else:
        assert stats["median_of_archives_ratio"] is None
        assert stats["dissenting_rounds"] == 0


# --- envelope_verdict (plan-identity gate + min rule) ---

@given(
    seconds, seconds,
    st.dictionaries(names, st.tuples(seconds, seconds), max_size=10),
    st.booleans(),
)
@settings(max_examples=300)
def test_envelope_verdict_consistent_with_min_rule(
    best, canary_median, per_round, identity_bit
):
    plan_identical = {rnd: identity_bit for rnd in per_round}
    verdict, ratios, stats, rationale = ENVELOPE.envelope_verdict(
        "q", best, canary_median, per_round, plan_identical
    )
    assert set(ratios) <= set(per_round)
    if not identity_bit or not per_round:
        # no comparable round -> must stay open, never silently pass
        assert verdict == "INVESTIGATE"
        assert ratios == {}
    else:
        assert set(ratios) == set(per_round)
        if min(ratios.values()) <= ENVELOPE.THRESHOLD:
            assert verdict == "noise"
        else:
            assert verdict == "INVESTIGATE"
    assert stats["rounds_compared"] == len(ratios)
    # ADVICE_r19 #1: the old form parsed as `(A and B) or rationale`,
    # which any non-empty rationale satisfied — enforce both halves.
    assert isinstance(rationale, str) and rationale
    assert "q" in rationale


@given(seconds, st.dictionaries(names, seconds, min_size=1, max_size=8))
@settings(max_examples=200)
def test_canary_envelope_verdict_consistent_with_min_rule(best, per_raw):
    verdict, ratios, stats, _ = ENVELOPE.canary_envelope_verdict(
        best, per_raw, {rnd: True for rnd in per_raw}
    )
    assert set(ratios) == set(per_raw)
    if min(ratios.values()) <= ENVELOPE.THRESHOLD:
        assert verdict == "noise"
    else:
        assert verdict == "INVESTIGATE"
    assert stats["dissenting_rounds"] <= stats["rounds_compared"]


# --- regime selection (ADVICE_r18 #1 + VERDICT_r17 task 4) ---

@given(seconds)
@settings(max_examples=200)
def test_sub_second_rule_equivalence(archive_sec):
    # the rule IS `archive < cutoff` — a pure predicate of the archive
    assert RULES.sub_second_rule(archive_sec) == (
        archive_sec < RULES.SUB_SECOND_CUTOFF
    )


@given(seconds, ratio, ratio, st.one_of(st.none(), ratio),
       st.one_of(st.none(), ratio))
@settings(max_examples=300)
def test_decisive_statistic_totality_and_selection(
    archive_sec, lb, lm, c2b, c2m
):
    if (c2b is None) != (c2m is None):
        c2b = c2m = None  # the caller always sets both or neither
    dec, best, med = RULES.decisive_statistic(archive_sec, lb, lm, c2b, c2m)
    assert dec in ("canary2", "light")
    if archive_sec >= RULES.HEAVY_CUTOFF and c2b is not None:
        assert dec == "canary2" and (best, med) == (c2b, c2m)
    else:
        assert dec == "light" and (best, med) == (lb, lm)
    assert math.isfinite(best) and math.isfinite(med)


# --- row_verdict / canary_rule_verdict ---

@given(names, ratio, ratio)
@settings(max_examples=300)
def test_row_verdict_domain_and_dissent(name, adj_best, adj_median):
    verdict, median_would_flag = RULES.row_verdict(name, adj_best, adj_median)
    assert verdict in ("noise", "INVESTIGATE")  # nothing declared changed
    assert median_would_flag == (adj_median > RULES.THRESHOLD)
    assert (verdict == "noise") == (adj_best <= RULES.THRESHOLD)
    # declaring the row changed converts INVESTIGATE, never noise
    v2, _ = RULES.row_verdict(name, adj_best, adj_median, {name})
    assert v2 == ("noise" if verdict == "noise" else "changed-path (expected)")


@given(ratio, seconds, seconds)
@settings(max_examples=300)
def test_canary_rule_precondition_dominates(raw_ratio, cmed, quiet_med):
    verdict, rationale = RULES.canary_rule_verdict(raw_ratio, cmed, quiet_med)
    if cmed > RULES.QUIET_CANARY_TOL * quiet_med:
        # a loud machine can never produce a noise verdict for the canary
        assert verdict == "INVESTIGATE" and "precondition" in rationale
    else:
        assert verdict == ("noise" if raw_ratio <= RULES.THRESHOLD
                           else "INVESTIGATE")
