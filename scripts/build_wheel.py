#!/usr/bin/env python
"""Zero-dependency wheel builder (round 13, VERDICT r12 task 6).

Produces dist/filemap_spark-<version>-py3-none-any.whl from the package
tree + pyproject.toml using only the stdlib — the build container has
setuptools but not the `wheel` package, and a wheel is just a zip with a
dist-info directory (PEP 427). In an environment with standard tooling,
`python -m build` against pyproject.toml produces an equivalent wheel;
this script exists so the DEPLOY.md recipe works from a bare checkout.

Wheel contents: every .py under filemap_spark/, plus dist-info
(METADATA from pyproject's [project] table, WHEEL, entry_points.txt for
the filemap-spark console script, top_level.txt, RECORD with sha256 +
sizes per PEP 376). Deterministic: fixed zip timestamps, sorted entries.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import zipfile

try:
    import tomllib  # Python >= 3.11
except ModuleNotFoundError:  # pragma: no cover - 3.10 fallback
    import tomli as tomllib  # type: ignore[no-redef]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _record_hash(data: bytes) -> str:
    digest = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def main() -> int:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    name = proj["name"].replace("-", "_")
    version = proj["version"]
    dist_info = f"{name}-{version}.dist-info"
    wheel_name = f"{name}-{version}-py3-none-any.whl"

    files: dict[str, bytes] = {}
    pkg_root = os.path.join(REPO, "filemap_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            full = os.path.join(dirpath, fname)
            arc = os.path.relpath(full, REPO).replace(os.sep, "/")
            files[arc] = open(full, "rb").read()

    metadata = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {version}",
        f"Summary: {proj['description']}",
        f"Requires-Python: {proj['requires-python']}",
        "License: Apache-2.0",
    ]
    metadata += [f"Requires-Dist: {d}" for d in proj["dependencies"]]
    files[f"{dist_info}/METADATA"] = ("\n".join(metadata) + "\n").encode()
    files[f"{dist_info}/WHEEL"] = (
        "Wheel-Version: 1.0\n"
        "Generator: filemap-spark build_wheel.py\n"
        "Root-Is-Purelib: true\n"
        "Tag: py3-none-any\n"
    ).encode()
    scripts = proj.get("scripts", {})
    if scripts:
        lines = ["[console_scripts]"]
        lines += [f"{k} = {v}" for k, v in sorted(scripts.items())]
        files[f"{dist_info}/entry_points.txt"] = (
            "\n".join(lines) + "\n"
        ).encode()
    files[f"{dist_info}/top_level.txt"] = b"filemap_spark\n"

    record_lines = [
        f"{arc},{_record_hash(data)},{len(data)}"
        for arc, data in sorted(files.items())
    ]
    record_lines.append(f"{dist_info}/RECORD,,")
    record = ("\n".join(record_lines) + "\n").encode()

    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, wheel_name)
    fixed_date = (2026, 1, 1, 0, 0, 0)

    def _info(arc: str) -> zipfile.ZipInfo:
        # explicit ZipInfo ignores the ZipFile-level compression default,
        # so set compress_type per entry (else everything ships STORED)
        # and give entries sane 0644 permissions
        zi = zipfile.ZipInfo(arc, date_time=fixed_date)
        zi.compress_type = zipfile.ZIP_DEFLATED
        zi.external_attr = 0o644 << 16
        return zi

    with zipfile.ZipFile(out, "w") as zf:
        for arc, data in sorted(files.items()):
            zf.writestr(_info(arc), data)
        zf.writestr(_info(f"{dist_info}/RECORD"), record)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
