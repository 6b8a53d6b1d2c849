#!/usr/bin/env python
"""Build the ``--py-files`` artifact for cluster submission.

The north rule's deployment shape is ``spark-submit --py-files`` on a
multi-executor cluster: the driver ships one zip of the package to every
executor, which adds it to ``sys.path``.  This builds that zip —
``dist/scylla_cdc_rust_spark.zip`` by default — from the package source
only (no tests, no caches), with entries in sorted order and zeroed
timestamps so the artifact is byte-reproducible for a given tree.

    python scripts/make_pyfiles_zip.py [out_zip]
    spark-submit --py-files dist/scylla_cdc_rust_spark.zip \
        examples/replicator.py --log-path ... --target-path ... \
        --watermark-path ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "scylla_cdc_rust_spark"


def build(out_zip: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, PKG)
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(src):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((full, os.path.relpath(full, root)))
    tmp = out_zip + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    os.replace(tmp, out_zip)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dist",
        f"{PKG}.zip",
    )
    print(build(out))
