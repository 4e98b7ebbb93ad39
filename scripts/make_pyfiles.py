#!/usr/bin/env python
"""Package wpextract_spark into a --py-files zip for spark-submit.

Usage: python scripts/make_pyfiles.py [out.zip]   (default dist/wpextract_spark.zip)
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "wpextract_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "wpextract_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(pkg.rglob("*.py")):
            if "__pycache__" in path.parts:
                continue
            # Fixed timestamp/mode: the artifact hash is content-addressed,
            # so rebuilding an unchanged tree gives byte-identical zips.
            info = zipfile.ZipInfo(
                str(path.relative_to(REPO)), date_time=(1980, 1, 1, 0, 0, 0)
            )
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, path.read_bytes())
    print(out)


if __name__ == "__main__":
    main()
