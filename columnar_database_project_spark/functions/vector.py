"""Vector math kernels for embedding columns.

Spark's higher-order functions (``zip_with`` + ``aggregate``) are
interpreted, not codegen'd — measured ~30-200× slower than DuckDB's
native list kernels on 64-d float arrays. These Arrow-batched numpy
kernels (matmul per record batch) close that gap; this is the
documented exception where a vectorized Pandas UDF beats built-ins
(UDF guidance: Arrow batch + numpy ≫ per-element interpretation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stack_embeddings(series: pd.Series, dim: int | None = None) -> np.ndarray:
    """pd.Series of float arrays → (n, d) float64 matrix."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    # |v| below ~1.5e-154 squares into subnormal range and the norm
    # loses significand bits (unit-norm off by ~1e-6); |v| above
    # ~1e154 overflows the square to inf. Rescale ONLY those rows by
    # max-abs and recompute in normal range (hypot-style) — normal
    # rows keep the single-division result bit-for-bit, so rounded
    # oracle hashes are unaffected.
    bad = ~np.isfinite(norms) | ((norms > 0) & (norms < 1e-140))
    if np.any(bad):
        idx = np.nonzero(bad[:, 0])[0]
        sub = m[idx]
        scale = np.max(np.abs(sub), axis=1, keepdims=True)
        scale[scale == 0] = 1.0
        norms[idx] = np.linalg.norm(sub / scale, axis=1, keepdims=True) * scale
    norms[norms == 0] = 1.0
    return m / norms


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, d) × (m, d) → (n, m) cosine similarities (float64).

    Clipped to the mathematical range: rows whose squared norm
    underflows to a subnormal (|v| ≈ 1e-159) normalize with enough
    rounding error that the product can exceed 1 by ~1e-7, which
    breaks downstream invariants (arccos domains, ≥-threshold
    filters). O(n·m) clip next to the O(n·m·d) matmul."""
    return np.clip(normalize_rows(a) @ normalize_rows(b).T, -1.0, 1.0)
