"""Build dist/crawler_spark.zip for spark-submit --py-files (M7).

Pure-stdlib, deterministic member order (sorted), no bytecode.
Usage: python tools/build_dist.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "crawler_spark")
OUT = os.path.join(ROOT, "dist", "crawler_spark.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    members = []
    for dirpath, _dirnames, filenames in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((os.path.relpath(full, ROOT), full))
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(members):
            zf.write(full, arcname)
    return OUT


if __name__ == "__main__":
    print(main())
