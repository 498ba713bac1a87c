"""Wheel-install smoke (round 14, VERDICT r13 task 7).

DEPLOY.md's packaging recipe was verified manually in round 13 and its
operator count promptly went stale (299 vs 302). This test automates the
whole loop so the count can never silently drift again:

    scripts/build_wheel.py  ->  dist/*.whl
    python -m venv --system-site-packages  (pyspark/numpy come from the
        container; the wheel itself installs --no-deps --no-index, i.e.
        fully offline)
    <venv>/bin/filemap-spark ops  ->  stderr "N operators"

and asserts N == len(all_queries()) of the LIVE registry, plus one line
per operator on stdout. Run from a scratch cwd so the repo checkout
cannot shadow the installed wheel.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import venv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_wheel_install_smoke(tmp_path):
    from filemap_spark.registry import all_queries

    build = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_wheel.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    wheel_path = build.stdout.strip().splitlines()[-1]
    assert os.path.exists(wheel_path), wheel_path

    env_dir = tmp_path / "venv"
    venv.create(env_dir, system_site_packages=True, with_pip=True)
    bin_dir = env_dir / ("Scripts" if os.name == "nt" else "bin")

    subprocess.run(
        [
            str(bin_dir / "pip"),
            "install",
            "--no-deps",
            "--no-index",
            "--quiet",
            wheel_path,
        ],
        check=True,
    )

    # cwd=tmp_path: the installed wheel must resolve, not the checkout.
    ops = subprocess.run(
        [str(bin_dir / "filemap-spark"), "ops"],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        check=True,
    )
    live = all_queries()
    m = re.search(r"(\d+) operators", ops.stderr)
    assert m, ops.stderr[-500:]
    assert int(m.group(1)) == len(live)
    lines = [ln for ln in ops.stdout.splitlines() if ln.strip()]
    assert len(lines) == len(live)
    listed = {ln.split("\t")[0] for ln in lines}
    assert listed == set(live)
