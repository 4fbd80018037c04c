"""A/B probe: time a subset of headline queries from the repo rooted at
argv[1], at SPARK_GRAFT_SF_DIR, 2 reps each in one session. One JSON line.

Used for same-box adjudication of round-6 changes vs the round-start
tree (bench.py itself is frozen and identical in both trees).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = sys.argv[1]
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERIES = sys.argv[2:] or [
    "minhash_clusters",
    "simhash_hamming_pairs",
    "substring_pairs",
    "embedding_cosine_pairs",
    "lsh_ann_topk",
]


def main() -> None:
    from refine_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="ab_probe", cores=CPUS, shuffle_partitions=max(8, 2 * CPUS)
    )
    qset = entrymod.queries()
    raw: dict[str, list] = {name: [] for name in QUERIES}
    for _ in range(2):
        for name in QUERIES:
            t0 = time.monotonic()
            qset[name](spark, SF_DIR).count()
            raw[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps({
        "root": ROOT,
        "sf_dir": SF_DIR,
        "mins": {k: min(v) for k, v in raw.items()},
        "raw": raw,
        "loadavg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
