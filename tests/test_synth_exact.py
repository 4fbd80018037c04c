"""Synthetic generator determinism + exact-dup pass correctness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from refine_spark import synth
from refine_spark.exact import exact_dup_groups, exact_edges, three_point_sample


def test_gen_documents_deterministic():
    d1, t1 = synth.gen_documents(300)
    d2, t2 = synth.gen_documents(300)
    assert d1.equals(d2) and t1.equals(t2)
    assert len(d1) >= 300
    assert d1["url"].is_unique
    assert set(t1["family"]) >= {"exact", "near_text", "sequential", "singleton"}


def test_text_sha256_invariant():
    # byte-identical extracted text per url (BASELINE.md correctness invariant)
    docs, truth = synth.gen_documents(200)
    merged = docs.merge(truth, on="url")
    for _, row in merged.iterrows():
        assert hashlib.sha256(row["text"].encode()).hexdigest() == row["text_sha256"]


def test_three_point_sample_math(spark):
    # whole content when below sample size; exact slice concatenation above
    import pandas as pd

    payload_small = b"x" * 100
    payload_big = bytes(range(256)) * 64  # 16384 bytes
    df = spark.createDataFrame(
        pd.DataFrame({"html": [payload_small, payload_big]})
    ).withColumn("s", three_point_sample(F.col("html"), 4096))
    rows = {len(r["html"]): bytes(r["s"]) for r in df.collect()}
    assert rows[100] == payload_small
    big = rows[16384]
    assert len(big) == 4096
    chunk = 4096 // 3
    assert big[:chunk] == payload_big[:chunk]
    mid_pos = 16384 // 2 - chunk // 2
    assert big[chunk : 2 * chunk] == payload_big[mid_pos : mid_pos + chunk]
    tail = 4096 - 2 * chunk
    assert big[2 * chunk :] == payload_big[16384 - tail :]


def test_exact_pass_finds_planted_exact_pairs(spark):
    docs, truth = synth.to_spark(spark, n_docs=400)
    groups = exact_dup_groups(docs).cache()
    found = {
        (r["size"], r["kind"], r["sample_hash"]): None for r in groups.collect()
    }
    assert len(found) > 0

    # every planted exact-family url must appear in an exact group
    exact_urls = {
        r["url"] for r in truth.filter(F.col("family") == "exact").collect()
    }
    grouped_urls = {r["url"] for r in groups.select("url").collect()}
    assert exact_urls <= grouped_urls

    # star edges: one rep per group, members connect to rep
    edges = exact_edges(docs)
    e = edges.collect()
    assert all(r["sim"] == 1.0 and r["pass_name"] == "exact" for r in e)
    assert all(r["src"] < r["dst"] or r["src"] != r["dst"] for r in e)
