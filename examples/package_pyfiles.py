#!/usr/bin/env python
"""Build pygraphblas_spark.zip for spark-submit --py-files.

The package is pure Python (DataFrame API + numpy-in-Arrow kernels), so
a zip of the package directory is the whole deployment artifact — no
native builds, no wheels to compile per executor image.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "pygraphblas_spark.zip") -> str:
    pkg = os.path.join(ROOT, "pygraphblas_spark")
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in filenames:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out_path)
    return out_path


if __name__ == "__main__":
    main()
