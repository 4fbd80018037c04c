"""Capture .explain("formatted") output for declared queries.

Usage: python scripts/capture_plans.py OUTDIR SUFFIX [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: the
bench HEADLINE set). Explain only — no job is executed, so this is safe
to run next to other work without contaminating timings.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from refine_spark.session import get_spark
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="plan_capture", cores=cpus,
                      shuffle_partitions=max(8, 2 * cpus))
    qset = entrymod.queries()
    if not names:
        names = list(qset)
    for name in names:
        try:
            df = qset[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            text = f"ERROR building {name}: {e!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
