"""Package datachain_spark for cluster submission.

Builds the zip that `spark-submit --py-files` ships to the driver and
every executor — the deployment unit the north rule names (the reference
ships a wheel; a Spark engine ships a py-files zip). Pure stdlib, no
build backend needed: the package is pure Python, all heavy lifting is
Catalyst/JVM-side.

Usage: python tools/package.py [out.zip]   (default dist/datachain_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "datachain_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    # deterministic member order + fixed timestamps -> byte-stable artifact
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                members.append((os.path.relpath(full, root), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in members:
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/datachain_spark.zip"
    print(build_zip(out))
