"""Package the engine for spark-submit --py-files (north rule).

Usage:
  python scripts/make_pyfiles.py [out.zip]
  spark-submit --py-files geokit_spark.zip scripts/job_zone_counts.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "geokit_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "geokit_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)


if __name__ == "__main__":
    main()
