"""Grading-order guarantees (round 2): the registry iterates cheap-first
and family-interleaved so a budgeted grading driver covers the most
operators and every operator family, whatever the budget shape."""

from __future__ import annotations

from filemap_spark import all_oracle, all_queries
from filemap_spark.registry import _META


def _tier(name: str) -> int:
    c = _META[name][2]
    return 0 if c <= 1.0 else (1 if c <= 2.5 else 2)


def test_every_family_appears_early():
    order = list(all_queries())
    families = {meta[0] for meta in _META.values()}
    n_fam = len(families)
    prefix = order[:n_fam]
    assert {_META[n][0] for n in prefix} == families, (
        "first |families| entries must span all families"
    )
    # each representative is its family's cheapest tier
    for n in prefix:
        fam = _META[n][0]
        fam_min = min(_tier(m) for m, meta in _META.items() if meta[0] == fam)
        assert _tier(n) == fam_min, n


def test_cost_tiers_are_nondecreasing_after_reps():
    order = list(all_queries())
    n_fam = len({meta[0] for meta in _META.values()})
    tiers = [_tier(n) for n in order[n_fam:]]
    assert tiers == sorted(tiers), "expensive queries must grade last"


def test_oracle_iteration_matches_query_order():
    q = list(all_queries())
    o = list(all_oracle())
    assert o == [n for n in q if n in set(o)]
