"""CATALOG.md drift pin (round 9, VERDICT r8 task 9): the checked-in
operator catalog must equal a fresh regeneration from the live registry —
adding/changing an op without regenerating fails here."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_catalog_regeneration_is_noop():
    from gen_catalog import generate

    on_disk = open(os.path.join(REPO, "CATALOG.md")).read()
    assert on_disk == generate(), (
        "CATALOG.md is stale — run: python scripts/gen_catalog.py"
    )


def test_catalog_covers_every_registered_op():
    from filemap_spark.registry import _META
    from filemap_spark import all_queries

    all_queries()
    text = open(os.path.join(REPO, "CATALOG.md")).read()
    missing = [n for n in _META if f"`{n}`" not in text]
    assert not missing, missing
