"""Build the --py-files zip for spark-submit deployment.

    python scripts/package.py            # → dist/word_sketch_lucene_spark.zip
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "word_sketch_lucene_spark.zip"
    pkg = ROOT / "word_sketch_lucene_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(ROOT))
        # the grammar catalog ships with the code
        for f in sorted((ROOT / "grammars").glob("*.json")):
            z.write(f, f.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
