"""Synthetic access-pattern generator for prefetch-model training.

Re-expresses the workload of reference model.py:19-78: mostly
sequential walks inside hot block ranges, with in-range noise and
occasional long jumps between ranges — the pattern an LSTM can learn.
"""

from __future__ import annotations

import random

DEFAULT_RANGES = [(0, 25), (50, 80), (100, 135)]  # reference model.py:19-31


def generate_mixed_logs(
    n_events: int = 2000,
    ranges: list[tuple[int, int]] | None = None,
    noise_prob: float = 0.10,
    jump_prob: float = 0.05,
    seed: int = 42,
) -> list[int]:
    """Block-id sequence: sequential scan within a range, ~10% in-range
    noise, ~5% jumps to another range (reference model.py:19-78)."""
    rng = random.Random(seed)
    ranges = ranges or DEFAULT_RANGES
    lo, hi = ranges[rng.randrange(len(ranges))]
    cur = rng.randint(lo, hi)
    out: list[int] = []
    for _ in range(n_events):
        r = rng.random()
        if r < jump_prob:
            lo, hi = ranges[rng.randrange(len(ranges))]
            cur = rng.randint(lo, hi)
        elif r < jump_prob + noise_prob:
            cur = rng.randint(lo, hi)
        else:
            cur = cur + 1 if cur < hi else lo
        out.append(cur)
    return out
