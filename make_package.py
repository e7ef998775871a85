"""Package the engine for spark-submit --py-files (north_rule deliverable).

    python make_package.py            # -> dist/elasticsearch_batch_percolator_spark.zip
    spark-submit --py-files dist/elasticsearch_batch_percolator_spark.zip \
        your_job.py

The zip contains only the library package (pure Python, no binary deps
beyond numpy/pandas/pyarrow which every executor image ships for pandas
UDFs). No per-row Python is shipped anywhere — all UDFs are Arrow-batched.
"""

from __future__ import annotations

import os
import zipfile

PKG = "elasticsearch_batch_percolator_spark"


def main() -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out = os.path.join(root, "dist", f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(out)
    return out


if __name__ == "__main__":
    main()
