"""Prefetch-model quality metrics: top-K hit rate + MRR.

Re-expresses reference evaluate_model.py:6-101 (the reference
evaluates on its own training set; we support any (inputs, labels)
split — tests hold out a tail).
"""

from __future__ import annotations

import numpy as np

from columnar_database_project_spark.ml.lstm import PAD, LSTMPrefetcher


def evaluate(
    model: LSTMPrefetcher,
    inputs: list[list[int]],
    labels: list[int],
    ks: tuple[int, ...] = (1, 3, 5, 10),
    batch_size: int = 256,
) -> dict:
    """hit@k for each k plus mean reciprocal rank of the true label."""
    hits = {k: 0 for k in ks}
    rr_total = 0.0
    n = len(inputs)
    for s in range(0, n, batch_size):
        batch = inputs[s : s + batch_size]
        labs = labels[s : s + batch_size]
        logits = model.forward(batch)
        logits[:, PAD] = -1e9
        order = np.argsort(-logits, axis=1)
        for row, lab in enumerate(labs):
            rank = int(np.where(order[row] == lab)[0][0]) + 1
            rr_total += 1.0 / rank
            for k in ks:
                if rank <= k:
                    hits[k] += 1
    return {
        **{f"hit@{k}": hits[k] / max(n, 1) for k in ks},
        "mrr": rr_total / max(n, 1),
        "n": n,
    }
