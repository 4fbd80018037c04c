"""Tests for training-data extras: analysis, simsearch, multimodal."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from refine_spark.analysis import (
    bpe_ish_count, doc_fingerprint, lang_id, token_count, with_quality,
)
from refine_spark.multimodal import (
    MEDIA_SCHEMA, extract_features, frame_sample, resize_stub,
)
from refine_spark.simsearch import brute_force_topk, cosine_dup_pairs, lsh_topk


def test_analysis_columns(spark):
    pdf = pd.DataFrame(
        {
            "text": [
                "the cat sat on the mat and the dog barked",
                "de que em para uma historia dos livros",
                "der hund und die katze ist nicht da",
                "zzz qqq xxx",
            ]
        }
    )
    df = spark.createDataFrame(pdf).withColumn("lang_pred", lang_id(F.col("text")))
    langs = [r["lang_pred"] for r in df.collect()]
    assert langs == ["en", "pt", "de", "und"]

    counts = df.select(
        token_count(F.col("text")).alias("tc"),
        bpe_ish_count(F.col("text")).alias("bc"),
        doc_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert counts[0]["tc"] == 10
    assert counts[0]["bc"] == 10
    assert len(counts[0]["fp"]) == 32  # md5 hex

    q = with_quality(df).collect()[0]
    assert q["n_tokens"] == 10 and q["n_punct"] == 0 and q["n_stopwords"] >= 4


def test_brute_force_topk_and_lsh(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal((6, 8))
    # vec 1 = vec 0 + tiny noise -> nearest neighbor of 0 must be 1
    base[1] = base[0] + 0.01 * rng.standard_normal(8)
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    topk = brute_force_topk(df, df.limit(1), k=2)
    got = {r["rank"]: r["vec_id"] for r in topk.collect()}
    assert got[1] == 1

    approx = lsh_topk(df, df.limit(1), dim=8, k=2, n_planes=2)
    ranks = {r["rank"]: r["vec_id"] for r in approx.collect()}
    assert ranks.get(1) == 1  # near-identical vectors share any bucket

    dups = cosine_dup_pairs(df, threshold=0.99)
    assert [(r["id_a"], r["id_b"]) for r in dups.collect()] == [(0, 1)]


def test_lsh_dup_pairs_recall(spark):
    """The scale path (OR-amplified multi-table hyperplane LSH) must find
    >=90% of planted high-cosine dup pairs, with zero false positives
    (the exact-cosine verify filters candidates)."""
    import numpy as np

    from refine_spark.simsearch import lsh_dup_pairs

    rng = np.random.RandomState(11)
    n_base, dim = 150, 64
    base = rng.standard_normal((n_base, dim))
    rows, planted = [], set()
    vid = 0
    for i in range(n_base):
        rows.append((vid, base[i].tolist()))
        orig = vid
        vid += 1
        if i % 3 == 0:  # plant one near-dup (cos >= ~0.99)
            noisy = base[i] + 0.05 * rng.standard_normal(dim)
            rows.append((vid, noisy.tolist()))
            planted.add((orig, vid))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    found = {
        (r["id_a"], r["id_b"])
        for r in lsh_dup_pairs(df, threshold=0.95, n_planes=10, n_tables=8).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]) for r in cosine_dup_pairs(df, threshold=0.95).collect()
    }
    assert len(found & planted) / len(planted) >= 0.9
    assert found <= exact  # verify step: no false positives

    # the auto-switch: a tiny broadcast cap forces the LSH path
    switched = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs(df, threshold=0.95, broadcast_max_rows=10).collect()
    }
    assert switched <= exact


def test_multimodal_plumbing(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes" * 20, ("image/png", 4, 4, None)),
        ("m2", "audio", b"RIFF fake wav" * 30, ("audio/wav", None, None, 1200)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = extract_features(df, deterministic_fake=True).collect()
    assert {r["media_id"] for r in feats} == {"m1", "m2"}
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic across runs
    feats2 = extract_features(df, deterministic_fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    with pytest.raises(Exception) as exc:
        extract_features(df).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )

    fs = frame_sample(df, n_frames=3).collect()
    assert all(len(r["frame_hashes"]) == 3 for r in fs)

    rz = resize_stub(df, 32, 32).collect()
    assert all(r["meta"]["width"] == 32 for r in rz)
