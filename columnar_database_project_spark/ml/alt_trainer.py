"""Alternate trainer — reference C15 (model.py:203-343).

The reference ships two mutually inconsistent trainers: the runbook
one (C14, retrain_model.py:92-165 — sliding-window inputs, multi-hot
labels, BCEWithLogits; ours is ``LSTMPrefetcher.fit(loss_mode="bce")``
over ``training_set.build_from_sequence``) and this one (model.py):

- per-query PREFIX sequences (model.py:100-111): every proper prefix
  of a query's block-access list predicts the next block,
- softmax CrossEntropy over the single next block (model.py:212),
- 80/20 train/eval split with top-1 accuracy (model.py:203-343).

Both are now provided so either reference workflow can be reproduced;
they share the model, the vocab convention (0 = pad/UNK) and the Adam
step — only dataset shape and objective differ.
"""

from __future__ import annotations

from columnar_database_project_spark.ml.evaluate import evaluate
from columnar_database_project_spark.ml.lstm import LSTMPrefetcher
from columnar_database_project_spark.ml.training_set import build_vocab

MAX_PREFIX = 20   # cap prefix length; bounds the padded batch width


def build_prefix_dataset(
    query_blocks: list[list[int]], max_prefix: int = MAX_PREFIX
) -> tuple[list[list[int]], list[int], dict[int, int], dict[int, int]]:
    """(inputs, labels, id2idx, idx2id): every proper prefix of each
    query's block list predicts its next block (reference
    model.py:100-111), encoded into the shared 0=pad/UNK vocab."""
    flat = [b for q in query_blocks for b in q]
    id2idx, idx2id = build_vocab(flat)
    inputs: list[list[int]] = []
    labels: list[int] = []
    for q in query_blocks:
        enc = [id2idx.get(b, 0) for b in q]
        for i in range(1, len(enc)):
            inputs.append(enc[max(0, i - max_prefix) : i])
            labels.append(enc[i])
    return inputs, labels, id2idx, idx2id


def train_alt(
    query_blocks: list[list[int]],
    epochs: int = 10,
    lr: float = 1e-3,
    split: float = 0.8,
    embed_dim: int = 16,
    hidden_dim: int = 64,
    seed: int = 0,
) -> tuple[LSTMPrefetcher, dict]:
    """C15 pipeline: prefix dataset → chronological 80/20 split →
    CrossEntropy fit → held-out accuracy/MRR report.

    Returns (model, report) where report carries per-epoch train loss
    and the held-out ``hit@k`` / ``mrr`` metrics.

    Metrics contract: when there is no held-out sample — ``split >= 1.0``
    (train on everything, explicitly honored) or a single-sample
    dataset — ``accuracy``/``hit@k``/``mrr`` are ``None`` and
    ``n_eval`` is 0; consumers doing float arithmetic must check.
    """
    inputs, labels, id2idx, idx2id = build_prefix_dataset(query_blocks)
    if not inputs:
        raise ValueError(
            "train_alt: no prefix samples — every query block has fewer "
            "than 2 accesses, so there is nothing to train on"
        )
    # Keep at least one held-out sample whenever the dataset allows it
    # AND the caller actually asked for a holdout (split < 1.0); with a
    # single sample we train on it and report eval metrics as None
    # rather than fitting on an empty set or "evaluating" on zero
    # examples.
    n_train = max(1, int(len(inputs) * split))
    if split < 1.0 and n_train >= len(inputs) and len(inputs) > 1:
        n_train = len(inputs) - 1
    n_train = min(n_train, len(inputs))
    model = LSTMPrefetcher(
        num_tokens=len(id2idx) + 1,
        embed_dim=embed_dim,
        hidden_dim=hidden_dim,
        seed=seed,
    )
    losses = model.fit(
        inputs[:n_train],
        labels[:n_train],
        epochs=epochs,
        lr=lr,
        seed=seed,
        loss_mode="ce",
    )
    if n_train < len(inputs):
        metrics = evaluate(model, inputs[n_train:], labels[n_train:])
    else:
        metrics = {
            f"hit@{k}": None for k in (1, 3, 5, 10)
        } | {"mrr": None, "n": 0}
    report = {
        "train_loss": losses,
        "accuracy": metrics["hit@1"],     # reference's eval metric
        **metrics,
        "n_train": n_train,
        "n_eval": len(inputs) - n_train,
        "vocab_size": len(id2idx) + 1,
    }
    return model, report
