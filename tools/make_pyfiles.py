"""Build the --py-files archive for spark-submit deployment.

The north-rule deployment shape is `spark-submit --py-files tilekiln_spark.zip
spark_job.py ...` on a multi-executor cluster: the zip ships the package to
every executor's PYTHONPATH (reference deployment: pip-installed CLI; here the
engine IS the Spark job, so the archive is the unit of deployment).

Usage: python tools/make_pyfiles.py [OUT.zip]   (default dist/tilekiln_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "tilekiln_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "tilekiln_spark.zip")
    print(build(out))
