"""Build the --py-files zip for cluster submission.

    python3 tools/package_pyfiles.py [dist/simple_html_parser_spark.zip]

Production shape (north_rule):
    spark-submit --py-files dist/simple_html_parser_spark.zip \\
        jobs/extract_job.py --input <iceberg-table> --output ...
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build(dest: str) -> str:
    dest_path = Path(dest)
    dest_path.parent.mkdir(parents=True, exist_ok=True)
    pkg = ROOT / "simple_html_parser_spark"
    with zipfile.ZipFile(dest_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    return str(dest_path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/simple_html_parser_spark.zip"
    print(build(out))
