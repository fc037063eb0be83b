"""Deterministic hashing kernels shared by Spark plans, Pandas-UDF
batch code, and the DuckDB oracle SQL.

Contract (single source of truth for all three executions):
- ``base_hash32(s) = int(md5(s)[:8 hex], 16)`` — 32-bit content hash.
- MinHash family: ``h_i(x) = (A_i * base + B_i) mod P``, P = 2^61-1,
  fixed pseudorandom (A_i, B_i) with A_i, B_i < 2^28 (product stays
  inside int64).
- Tokens: ``re.split(r"\\s+", text.strip())`` ≡ Spark
  ``split(trim(text), '\\s+')`` ≡ DuckDB
  ``regexp_split_to_array(trim(text), '\\s+')``.
- Shingles: overlapping word-W windows, ``max(n_tokens - W, 0) + 1``
  of them (short docs yield one short shingle), de-duplicated.
"""

from __future__ import annotations

import hashlib
import random
import re

import numpy as np

MERSENNE_P = (1 << 61) - 1
SHINGLE_W = 5
N_MINHASH = 16
SIMHASH_BITS = 32

_rng = random.Random(1234)
MINHASH_AB: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 28), _rng.randrange(0, 1 << 28))
    for _ in range(N_MINHASH)
]
MINHASH_A = np.array([a for a, _ in MINHASH_AB], dtype=np.int64)
MINHASH_B = np.array([b for _, b in MINHASH_AB], dtype=np.int64)

_WS = re.compile(r"\s+")


def tokenize(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else [""]


def shingles(text: str, w: int = SHINGLE_W) -> set[str]:
    toks = tokenize(text)
    n = len(toks)
    return {" ".join(toks[i : i + w]) for i in range(max(n - w, 0) + 1)}


def base_hash32(s: str) -> int:
    # first 8 hex chars == first 4 digest bytes big-endian; bytes path
    # skips the hexdigest format + int parse (~2x faster, same value)
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")


def minhash_signature(text: str, _memo: dict[str, int] | None = None) -> np.ndarray:
    """(N_MINHASH,) int64 signature — min over shingles of the affine
    family applied to the 32-bit md5 base hash.

    ``_memo`` (optional) caches shingle→hash across calls: dedup
    corpora repeat boilerplate shingles heavily, and md5 is the hot
    loop, so batch-level memoization cuts most of the hashing cost.
    """
    if _memo is None:
        hs = np.fromiter((base_hash32(s) for s in shingles(text)), dtype=np.int64)
    else:
        vals = []
        for s in shingles(text):
            h = _memo.get(s)
            if h is None:
                h = base_hash32(s)
                _memo[s] = h
            vals.append(h)
        hs = np.array(vals, dtype=np.int64)
    # (n_shingles, n_seeds): A*h + B mod P; A,B < 2^28, h < 2^32 → < 2^61
    vals = (hs[:, None] * MINHASH_A[None, :] + MINHASH_B[None, :]) % MERSENNE_P
    return vals.min(axis=0)


def simhash32(text: str) -> int:
    """32-bit SimHash: per-bit majority vote of token md5 hashes
    weighted by token frequency (ties → 0)."""
    from collections import Counter

    counts = Counter(tokenize(text))
    hs = np.fromiter((base_hash32(t) for t in counts), dtype=np.int64)
    cnt = np.fromiter(counts.values(), dtype=np.int64)
    bits = (hs[:, None] >> np.arange(SIMHASH_BITS)[None, :]) & 1
    s = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
    return int(((s > 0).astype(np.int64) << np.arange(SIMHASH_BITS)).sum())
