"""Build dist/ocr_spark.zip for the spark-submit --py-files launch mode
(north_rule).  Pure-Python package -> a plain zip of the import roots.

  python tools/package.py            # writes dist/ocr_spark.zip
  spark-submit --py-files dist/ocr_spark.zip jobs/extract.py --input ...
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGES = ("ocr_spark", "fixtures")


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "ocr_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for pkg in PACKAGES:
            pkg_root = os.path.join(ROOT, pkg)
            for dirpath, _dirnames, filenames in os.walk(pkg_root):
                if "__pycache__" in dirpath:
                    continue
                for fn in sorted(filenames):
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
