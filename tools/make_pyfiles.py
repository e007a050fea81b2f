"""Build kgnorm.zip for ``spark-submit --py-files`` deployment.

Usage: python tools/make_pyfiles.py [out.zip]
Bundles src/kgnorm plus the data/ fixtures (loaded via KGNORM_DATA_DIR
or a path relative to the package) so a cluster job needs only the zip
and a small driver script.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "kgnorm.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "src", "kgnorm")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, os.path.join(REPO, "src")))
        for f in os.listdir(os.path.join(REPO, "data")):
            if f.endswith(".json"):
                z.write(os.path.join(REPO, "data", f), os.path.join("kgnorm_data", f))
    print(out)


if __name__ == "__main__":
    main()
