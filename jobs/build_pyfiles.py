"""Build the --py-files archive for spark-submit deployment.

    python jobs/build_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO_ROOT, "pdf_inspector_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO_ROOT))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO_ROOT, "data", "pyfiles.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    print(build(out))
