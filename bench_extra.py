"""Stage-isolation benchmarks (guide §1.4: noop sink; §1.5: labeled jobs).

NOT part of the graded bench contract — bench.py is the frozen
measurement harness. This file exists to attribute wall time inside the
expensive queries to their stages so optimizations target the right
operator. One JSON line per probe on stdout.

Usage: python bench_extra.py [probe ...]   (default: all probes)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from refine_spark.session import get_spark
    from refine_spark.config import DedupConfig
    from refine_spark.candidates import _pairs_from_buckets, materialize_pairs
    from refine_spark.substring import winnow_fingerprints, substring_edges
    from refine_spark.partitioning import spread_small

    spark = get_spark(
        app_name="bench_extra", cores=CPUS, shuffle_partitions=max(8, 2 * CPUS)
    )
    sc = spark.sparkContext
    which = set(sys.argv[1:])
    out: dict[str, object] = {"sf_dir": SF_DIR, "loadavg_start": os.getloadavg()[0]}

    docs_raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs_raw.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        F.col("text"),
    )

    if not which or "substring" in which:
        cfg = DedupConfig(
            min_substring=48, winnow_ngram=24, winnow_window=25,
            exact_lcs_verify=True,
        )
        sc.setJobDescription("substring: winnow fingerprints only")
        t0 = time.monotonic()
        fps = winnow_fingerprints(docs, cfg).localCheckpoint(eager=True)
        out["substr_winnow_sec"] = round(time.monotonic() - t0, 3)
        out["substr_fp_rows"] = fps.count()

        sc.setJobDescription("substring: candidate pairs")
        t0 = time.monotonic()
        pairs = (
            _pairs_from_buckets(fps, "url", ["fp"], cfg.band_cap)
            .select("src", "dst")
            .dropDuplicates(["src", "dst"])
        )
        pairs, n_pairs = materialize_pairs(pairs)
        out["substr_pairs_sec"] = round(time.monotonic() - t0, 3)
        out["substr_n_pairs"] = n_pairs

        sc.setJobDescription("substring: full edges (incl. LCS verify)")
        t0 = time.monotonic()
        n_edges = substring_edges(docs, cfg).count()
        out["substr_full_sec"] = round(time.monotonic() - t0, 3)
        out["substr_n_edges"] = n_edges
        sc.setJobDescription(None)

    if not which or "embedding" in which:
        from refine_spark.simsearch import _broadcast_matrix, cosine_dup_pairs

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        sc.setJobDescription("embedding: collect+normalize corpus matrix")
        t0 = time.monotonic()
        ids, mat = _broadcast_matrix(emb, "vec_id", "embedding")
        out["emb_collect_sec"] = round(time.monotonic() - t0, 3)
        out["emb_n"] = int(len(ids))
        out["emb_dim"] = int(mat.shape[1])

        sc.setJobDescription("embedding: full cosine_dup_pairs")
        t0 = time.monotonic()
        n = cosine_dup_pairs(emb, threshold=0.45).count()
        out["emb_full_sec"] = round(time.monotonic() - t0, 3)
        out["emb_n_pairs"] = n
        sc.setJobDescription(None)

    if not which or "simhash" in which:
        from refine_spark.signatures import make_simhash_udf, simhash_edges

        sh = make_simhash_udf(DedupConfig())
        sc.setJobDescription("simhash: signature UDF only")
        t0 = time.monotonic()
        signed = (
            spread_small(docs)
            .select("url", sh(F.col("text")).alias("simhash"))
            .localCheckpoint(eager=True)
        )
        out["simhash_udf_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription("simhash: edges from checkpointed signatures")
        t0 = time.monotonic()
        out["simhash_n_edges"] = simhash_edges(signed).count()
        out["simhash_edges_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)

    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
