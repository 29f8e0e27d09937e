"""Build the --py-files artifact for cluster submission.

    python package.py                  # -> dist/scrappy_spark.zip
    spark-submit --py-files dist/scrappy_spark.zip your_job.py

The zip contains only the package (no tests, no caches); it is what a
1000-executor run ships to workers.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "scrappy_spark.zip")
    # dirname('') for a bare filename — makedirs('') raises (review r5)
    if os.path.dirname(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "scrappy_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
