"""Build dist/bluegraph_spark.zip for spark-submit --py-files.

Stdlib-only (no build backend needed on cluster edge nodes):

    python scripts/make_pyfiles.py
    spark-submit --py-files dist/bluegraph_spark.zip scripts/submit_job.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "bluegraph_spark.zip")
    pkg = os.path.join(REPO, "bluegraph_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
