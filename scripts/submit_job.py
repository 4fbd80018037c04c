"""Cluster entry point for the dedup pipeline, for `spark-submit`.

Deploy contract (north rule): the engine ships as a zip of the
refine_spark package and this driver script —

  spark-submit --master <cluster> \
      --py-files refine_spark.zip \
      scripts/submit_job.py --input <parquet-path> \
      [--output <dir>] [--synth N]

On a real cluster --input points at the Iceberg/Parquet web-page table
(url, warc_ts, html, text, lang). --synth N generates the deterministic
synthetic corpus instead (the sandbox / smoke-test path). The script
deliberately builds its SparkSession from the ambient spark-submit
config (master, executor counts, memory all come from the submit
command line), unlike refine_spark.session.get_spark which is the
local-mode test harness.

Prints one JSON line: docs, clusters, dup docs, wall seconds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="web-page table path (parquet dir; Iceberg would need a --format dispatch, not implemented)")
    ap.add_argument("--output", help="optional parquet dir for cluster assignments")
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N synthetic docs instead of reading --input")
    args = ap.parse_args()
    if not args.input and not args.synth:
        ap.error("need --input or --synth N")

    # import AFTER spark-submit has placed refine_spark.zip on sys.path
    from pyspark.sql import SparkSession

    from refine_spark.pipeline import run_dedup

    spark = (
        SparkSession.builder.appName("refine_spark_dedup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    if args.synth:
        from refine_spark import synth

        docs, _ = synth.to_spark(spark, n_docs=args.synth)
    else:
        docs = spark.read.parquet(args.input)

    t0 = time.monotonic()
    result = run_dedup(spark, docs, lazy=True)
    clusters = result["clusters"]
    if args.output:
        clusters.write.mode("overwrite").parquet(args.output)
        clusters = spark.read.parquet(args.output)
    n_dup_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0

    print(json.dumps({
        "docs": docs.count(),
        "dup_docs": n_dup_docs,
        "clusters": n_clusters,
        "wall_sec": round(wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
    sys.exit(0)
