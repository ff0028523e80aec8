"""Zip the engine package for ``spark-submit --py-files engine.zip``."""

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(HERE, "engine.zip")
    pkg = os.path.join(HERE, "eaststorm_searchengine_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, HERE))
    print(out)


if __name__ == "__main__":
    main()
