"""Barriered per-stage profile of the dedup pipeline at one core count.

Each stage materializes via localCheckpoint(eager=True) before the next
starts, so per-stage walls are clean (no cross-stage pipelining — the
TOTAL here exceeds the lazy-mode wall by design). Run one leg at a time:

  SPARK_GRAFT_CPUS=2 SPARK_GRAFT_SCALING_DOCS=800000 \
      python scripts/profile_stages.py

NEVER run concurrently with bench.py --scaling (timing contamination).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "400000"))

    from pyspark.sql import functions as F

    from refine_spark import synth
    from refine_spark.cluster import (
        cluster_stats, connected_components, name_pass_clusters,
    )
    from refine_spark.exact import exact_edges
    from refine_spark.pipeline import _relabel_by_url, minhash_edges, prepare
    from refine_spark.scoring import name_pass_edges
    from refine_spark.session import get_spark
    from refine_spark.signatures import simhash_edges, with_signatures
    from refine_spark.substring import substring_edges

    spark = get_spark(
        app_name="refine_spark_profile", cores=cores, shuffle_partitions=64
    )
    docs, _ = synth.to_spark(spark, n_docs=n_docs)
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint()
    docs.count()

    walls: dict[str, float] = {}

    def stage(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        walls[name] = round(time.monotonic() - t0, 2)
        print(f"{name}: {walls[name]}s", file=sys.stderr, flush=True)
        return out

    base = stage("prepare", lambda: prepare(docs).localCheckpoint(eager=True))
    ids = base.select("doc_id", "url")
    e_exact = stage(
        "exact",
        lambda: exact_edges(base, id_col="doc_id").localCheckpoint(eager=True),
    )
    signed = stage(
        "signatures",
        lambda: with_signatures(base.select("doc_id", "text")).localCheckpoint(
            eager=True
        ),
    )
    e_text = stage(
        "text",
        lambda: minhash_edges(signed, id_col="doc_id").localCheckpoint(
            eager=True
        ),
    )
    e_sim = stage(
        "simhash",
        lambda: simhash_edges(
            signed, expand="star", id_col="doc_id"
        ).localCheckpoint(eager=True),
    )
    named = base.select("doc_id", "cleaned_name", "tokens", "kind")
    e_name_raw = stage(
        "name_scoring",
        lambda: name_pass_edges(named, id_col="doc_id").localCheckpoint(
            eager=True
        ),
    )

    def epilogue():
        _, surv = name_pass_clusters(e_name_raw, named, id_col="doc_id")
        return surv.localCheckpoint(eager=True)

    e_name = stage("name_epilogue", epilogue)
    e_sub = stage(
        "substring",
        lambda: substring_edges(base, id_col="doc_id").localCheckpoint(
            eager=True
        ),
    )
    edges = (
        e_exact.unionByName(e_text)
        .unionByName(e_sim)
        .unionByName(e_name)
        .unionByName(e_sub)
    )
    edges = stage("edges_union", lambda: edges.localCheckpoint(eager=True))
    labels = stage(
        "cc",
        lambda: connected_components(edges, id_col="doc_id").localCheckpoint(
            eager=True
        ),
    )

    def emit():
        stats = cluster_stats(edges, labels, id_col="doc_id")
        with_stats = labels.join(stats, "cluster_id").select(
            "doc_id", "cluster_id", "avg_sim", F.col("cluster_size").cast("int")
        )
        out = _relabel_by_url(with_stats, ids, ["avg_sim", "cluster_size"])
        out.count()
        return out

    stage("stats_emit", emit)
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "stages": walls,
                "total": round(sum(walls.values()), 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
