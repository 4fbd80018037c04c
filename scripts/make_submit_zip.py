"""Build refine_spark.zip for `spark-submit --py-files` deployment.

The north rule ships this engine to a multi-executor cluster as
  spark-submit --py-files refine_spark.zip scripts/submit_job.py ...
This packager produces that zip deterministically from the working
tree: every refine_spark/*.py module, nothing else (tests, scripts and
driver-contract files stay out — executors only need the library).

Usage:
  python scripts/make_submit_zip.py [out.zip]   # default: ./refine_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> list[str]:
    pkg = os.path.join(REPO, "refine_spark")
    names = sorted(
        n for n in os.listdir(pkg)
        if n.endswith(".py") and not n.startswith(".")
    )
    # fixed-level DEFLATE + zeroed timestamps: byte-identical archives
    # for identical sources, so cluster deploys are content-addressable
    with zipfile.ZipFile(
        out_path, "w", zipfile.ZIP_DEFLATED, compresslevel=9
    ) as zf:
        for n in names:
            src = os.path.join(pkg, n)
            info = zipfile.ZipInfo(f"refine_spark/{n}", date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(src, "rb") as fh:
                zf.writestr(info, fh.read(), zipfile.ZIP_DEFLATED, compresslevel=9)
    return names


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "refine_spark.zip")
    names = build(out)
    print(f"wrote {out}: {len(names)} modules")


if __name__ == "__main__":
    main()
