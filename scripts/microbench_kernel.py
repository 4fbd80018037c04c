"""Spark-free microbench of the hottest Python kernels (VERDICT r5 item 6).

Times the fused signature kernel (tokenize -> translit -> shingle ->
md5 -> MinHash+SimHash) and its stages on a fixed deterministic synth
batch, single process, no Spark scheduling — so kernel regressions are
visible independently of cluster/box noise. One JSON line on stdout.

bench.py is the frozen graded harness and cannot carry this; the
per-round numbers are recorded in OPTIMIZATION_r*.md / BENCH/.

Usage: [taskset -c ...] python scripts/microbench_kernel.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    from refine_spark import synth
    from refine_spark.clean import _translit_str
    from refine_spark.config import DedupConfig
    from refine_spark.signatures import (
        _minhash_from_uniq,
        _perm_params,
        _shingle_hashes60,
        _simhash_from_uniq,
        normalize_for_shingles,
    )

    docs, _ = synth.gen_documents(n_docs)
    texts = pd.Series(docs["text"].head(n_docs))
    total_chars = int(texts.str.len().sum())
    out: dict[str, object] = {
        "n_docs": int(len(texts)),
        "total_chars": total_chars,
    }

    t0 = time.monotonic()
    for t in texts:
        _translit_str(t)
    out["translit_sec"] = round(time.monotonic() - t0, 4)

    t0 = time.monotonic()
    tokens = [normalize_for_shingles(t) for t in texts]
    out["normalize_sec"] = round(time.monotonic() - t0, 4)

    cfg = DedupConfig()
    t0 = time.monotonic()
    n_shingles = 0
    for tok in tokens:
        n_shingles += len(_shingle_hashes60(tok, cfg.shingle_k))
    out["shingle_md5_sec"] = round(time.monotonic() - t0, 4)
    out["n_shingles"] = n_shingles

    # full fused kernel, same per-doc body the Arrow stage runs
    # (make_signatures_udf's pandas_udf wrapper needs a live session, so
    # the loop is replicated here from signatures.make_signatures_udf)
    a, b = _perm_params(cfg)
    k, bits = cfg.shingle_k, cfg.simhash_bits
    t0 = time.monotonic()
    sims = np.zeros((), dtype=np.uint64)
    for text in texts:
        uniq, counts = np.unique(
            _shingle_hashes60(normalize_for_shingles(text), k),
            return_counts=True,
        )
        _minhash_from_uniq(uniq, a, b)
        sims ^= np.uint64(_simhash_from_uniq(uniq, counts, bits))
    full = time.monotonic() - t0
    out["full_kernel_sec"] = round(full, 4)
    out["docs_per_sec_1core"] = round(len(texts) / full, 1)
    out["checksum_simhash_xor"] = int(sims)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
