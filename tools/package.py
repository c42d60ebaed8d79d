"""Build ddsketch_spark.zip for ``spark-submit --py-files``.

Usage: python tools/package.py [out.zip]   (default: ./ddsketch_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "ddsketch_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "ddsketch_spark")
        for root, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
