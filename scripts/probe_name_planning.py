"""Isolate the name-pass per-query driver (planning/codegen) cost.

The round-5 per-stage attribution found ~117 s of corpus-size-INDEPENDENT
serial cost in the name-scoring stage (cold 199-245 s vs warm 109-119 s
at 8 cores / 3.2M docs; 64-vs-256 shuffle partitions neutral). Constant
in corpus size => reproducible at a tiny corpus where task work is
negligible. This probe times the stage at N tiny docs, twice, with
per-phase timestamps, to attribute the driver cost.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(os.environ.get("PROBE_DOCS", "20000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from refine_spark import synth
    from refine_spark.pipeline import prepare
    from refine_spark.scoring import name_pass_edges
    from refine_spark.session import get_spark

    spark = get_spark(app_name="probe_name_planning", cores=cores,
                      shuffle_partitions=64)
    docs, _ = synth.to_spark(spark, n_docs=n_docs)
    docs = docs.repartition(cores).localCheckpoint()
    docs.count()
    t0 = time.monotonic()
    base = prepare(docs).localCheckpoint(eager=True)
    named = base.select("doc_id", "url", "cleaned_name", "tokens", "kind")
    print(f"prepare: {time.monotonic()-t0:.1f}s", flush=True)

    for rep in range(3):
        t0 = time.monotonic()
        edges = name_pass_edges(named, id_col="doc_id")
        t1 = time.monotonic()
        n = edges.count()
        t2 = time.monotonic()
        print(f"rep{rep}: build(incl eager ckpts)={t1-t0:.1f}s "
              f"count={t2-t1:.1f}s edges={n}", flush=True)


if __name__ == "__main__":
    main()
