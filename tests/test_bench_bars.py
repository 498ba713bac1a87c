"""Bar-scaling configuration guards (round 13, VERDICT r12 task 3).

bench.py's per-family canary scaling is config-as-code; these pins keep
the classification and the factor math from drifting as bars are added:
every SHUFFLE_DOMINATED entry must be an enforced bar (a classified
query with no bar is dead config; a typo'd name silently reverts the
query to scan scaling), and the factor discipline — floor 1, shuffle
cap 1.5 — is asserted on the same expressions bench uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINE_WARM_SF01, SHUFFLE_DOMINATED, scan_rig, shuffle_rig


def test_shuffle_family_is_subset_of_enforced_bars():
    unknown = SHUFFLE_DOMINATED - set(BASELINE_WARM_SF01)
    assert not unknown, f"classified but unenforced (typo?): {sorted(unknown)}"


def test_every_enforced_bar_has_exactly_one_family():
    # scan family is the complement — every bar resolves to one factor
    scan = set(BASELINE_WARM_SF01) - SHUFFLE_DOMINATED
    assert scan | SHUFFLE_DOMINATED == set(BASELINE_WARM_SF01)
    assert not (scan & SHUFFLE_DOMINATED)
    # both families are non-trivial (an empty side means the
    # classification collapsed back to single-canary scaling)
    assert len(SHUFFLE_DOMINATED) >= 10
    assert len(scan) >= 10


def test_family_factor_floor_and_cap():
    """bench.py's ACTUAL factor functions (imported, not re-derived —
    a hand-copied expression here couldn't detect drift): floors keep a
    quiet rig from TIGHTENING bars below their recorded denominators;
    the 1.5 cap keeps one bursty shuffle sample from loosening the
    family's bars unboundedly."""
    for raw, expect in ((0.8, 1.0), (1.0, 1.0), (1.24, 1.24), (2.0, 1.5)):
        assert shuffle_rig(raw) == expect
    for raw, expect in ((0.8, 1.0), (1.3, 1.3), (2.0, 2.0)):
        assert scan_rig(raw) == expect


def test_known_drift_regressors_are_shuffle_family():
    """The three queries the r12 A/B adjudication named as tracking the
    shuffle canary must carry the shuffle classification — they are the
    reason this mechanism exists."""
    for name in (
        "join_min_cost_supplier_q2",
        "dedup_incremental_lsh_delta",
        "agg_ks_two_sample",
    ):
        assert name in SHUFFLE_DOMINATED, name
