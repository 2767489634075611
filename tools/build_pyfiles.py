"""Build the ``--py-files`` distribution zip.

    python tools/build_pyfiles.py [dist/s4spark.zip]

Zips the ``super_speedy_syslog_searcher_spark`` package exactly as
``spark-submit --py-files`` expects (package dir at the zip root), so
executors and the driver import identical code with no checkout on
the worker nodes.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "super_speedy_syslog_searcher_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg_root = os.path.join(REPO, PKG)
        for root, _dirs, files in os.walk(pkg_root):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "s4spark.zip"
    )
    print(build(out))
