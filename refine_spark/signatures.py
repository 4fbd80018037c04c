"""MinHash + SimHash signature kernels (north-rule additions; SURVEY.md §2.9).

These have no reference analog (the reference's inverted-token-index blocking
at /root/reference/src/commands/dupes.rs:177-184 is the scalar ancestor);
they are the scale path for text near-dup candidate generation at 10^12 docs.

Both are vectorized pandas UDFs over Arrow batches (numpy inner loops, no
per-row Python in the hot path beyond stable shingle hashing).

MinHash: word k-shingles of normalized text, hashed to 64-bit ints; the
signature is min over `num_perm` universal-hash permutations
((a*x + b) mod p, p = 2^61-1).  LSH banding (bands x rows) happens
JVM-side in candidates.py via xxhash64 over signature slices.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

from .config import DedupConfig, DEFAULT
from .clean import _translit_str

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _perm_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(cfg.seed)
    a = rng.randint(1, _MERSENNE, size=cfg.num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=cfg.num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def normalize_for_shingles(text: str) -> list[str]:
    """Lowercased ASCII-transliterated word tokens (accent variants collapse,
    mirroring the reference's deunicode step before comparison)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(_translit_str(text).lower())


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Stable 64-bit hashes of word k-shingles (whole token list if < k)."""
    if not tokens:
        shingles = [""]
    elif len(tokens) < k:
        shingles = [" ".join(tokens)]
    else:
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out


def make_minhash_udf(cfg: DedupConfig = DEFAULT):
    a, b = _perm_params(cfg)
    k = cfg.shingle_k

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        results = []
        for text in texts:
            sh = _shingle_hashes(normalize_for_shingles(text), k)
            # (num_perm x n_shingles) universal hash, min over shingles
            vals = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            sig = vals.min(axis=1).astype(np.int64)
            results.append(sig.tolist())
        return pd.Series(results)

    return minhash_udf


def make_simhash_udf(cfg: DedupConfig = DEFAULT):
    bits = cfg.simhash_bits

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for idx, text in enumerate(texts):
            tokens = normalize_for_shingles(text)
            if not tokens:
                continue
            uniq, counts = np.unique(np.array(tokens, dtype=object), return_counts=True)
            hs = np.empty(len(uniq), dtype=np.uint64)
            for i, tok in enumerate(uniq):
                hs[i] = int.from_bytes(
                    hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
                )
            # unpack bits: (n_tokens x 64) of {0,1}
            bit_matrix = (hs[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & 1
            weights = counts.astype(np.int64)
            acc = ((bit_matrix.astype(np.int64) * 2 - 1) * weights[:, None]).sum(axis=0)
            sim = np.uint64(0)
            for bpos in range(bits):
                if acc[bpos] > 0:
                    sim |= np.uint64(1) << np.uint64(bpos)
            out[idx] = np.int64(sim)
        return pd.Series(out)

    return simhash_udf


def hamming_distance(col_a, col_b):
    """Builtin JVM-side Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def with_signatures(docs, cfg: DedupConfig = DEFAULT, text_col: str = "text"):
    """Attach `minhash` (array<long>) and `simhash` (long) columns."""
    mh = make_minhash_udf(cfg)
    sh = make_simhash_udf(cfg)
    return docs.withColumn("minhash", mh(F.col(text_col))).withColumn(
        "simhash", sh(F.col(text_col))
    )
