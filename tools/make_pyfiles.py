"""Build the --py-files artifact for spark-submit.

Zips the ocr_service_spark package into dist/ocr_service_spark.zip with
sorted member order and fixed timestamps, so the artifact is
byte-deterministic for a given source tree (the same property the
dataset generator has — rebuilds are diffable).

Usage: python tools/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str) -> str:
    pkg_root = os.path.join(REPO, "ocr_service_spark")
    members = []
    for root, _dirs, files in os.walk(pkg_root):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "ocr_service_spark.zip")
    print(build(out))
