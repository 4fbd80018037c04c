"""Time every declared query once (count-forced), one JSON line.

Checklist evidence for OPTIMIZATION_r06.md — NOT the graded bench
(bench.py is frozen; this sweep covers the 35 queries the headline set
does not time). Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/sweep_all_queries.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from refine_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="query_sweep", cores=CPUS,
                      shuffle_partitions=max(8, 2 * CPUS))
    qset = entrymod.queries()
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in qset.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.monotonic()
        try:
            rows[name] = fn(spark, SF_DIR).count()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            out[name] = -1.0
            rows[name] = -1
            print(f"ERROR {name}: {e!r}", file=sys.stderr)
    print(json.dumps({
        "sf_dir": SF_DIR, "cores": CPUS, "wall_sec": out, "rows": rows,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
