"""Training-set builder: access log → sliding-window dataset + vocab.

Re-expresses reference training_set_generator.py: flatten the access
log to the chronological block sequence, build a vocab with 0 reserved
for pad/UNK (reference :25-34), emit window-5 (inputs, next-block)
pairs (reference :36-46), persist mappings with ``vocab_size``
(reference :64-86).

Two builders:
- ``build_from_sequence`` — driver-side (the log is control-plane
  metadata; at any realistic scale it fits the driver).
- ``build_with_spark`` — the same windowing as a Spark job over the
  log table (``F.collect_list`` over a row-window), for when access
  logs are collected fleet-wide and genuinely big.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

WINDOW = 5  # reference training_set_generator.py:58


@dataclass
class TrainingSet:
    inputs: list[list[int]]       # encoded windows (vocab indices)
    labels: list[int]             # encoded next-block (vocab index)
    id2idx: dict[int, int]        # block_id → vocab index (1-based; 0 = pad/UNK)
    idx2id: dict[int, int]
    vocab_size: int               # distinct blocks + 1

    def save(self, dataset_path: str, mappings_path: str) -> None:
        for p in (dataset_path, mappings_path):
            os.makedirs(os.path.dirname(os.path.abspath(p)), exist_ok=True)
        with open(dataset_path, "w") as f:
            json.dump(
                {
                    "inputs": self.inputs,
                    "labels": self.labels,
                    "vocab_size": self.vocab_size,
                },
                f,
            )
        with open(mappings_path, "w") as f:
            json.dump(
                {
                    "id2idx": {str(k): v for k, v in self.id2idx.items()},
                    "idx2id": {str(k): v for k, v in self.idx2id.items()},
                    "vocab_size": self.vocab_size,
                },
                f,
            )

    @classmethod
    def load_mappings(cls, mappings_path: str) -> tuple[dict, dict, int]:
        with open(mappings_path) as f:
            m = json.load(f)
        id2idx = {int(k): v for k, v in m["id2idx"].items()}
        idx2id = {int(k): v for k, v in m["idx2id"].items()}
        return id2idx, idx2id, m["vocab_size"]


def build_vocab(sequence: list[int]) -> tuple[dict[int, int], dict[int, int]]:
    """Vocab over distinct block ids, 0 reserved (reference :25-34).
    Indices assigned in first-appearance order (deterministic)."""
    id2idx: dict[int, int] = {}
    for b in sequence:
        if b not in id2idx:
            id2idx[b] = len(id2idx) + 1
    idx2id = {v: k for k, v in id2idx.items()}
    return id2idx, idx2id


def build_from_sequence(sequence: list[int], window: int = WINDOW) -> TrainingSet:
    """Sliding-window pairs: input = w consecutive blocks, label = the
    next block (reference :36-46)."""
    id2idx, idx2id = build_vocab(sequence)
    enc = [id2idx[b] for b in sequence]
    inputs, labels = [], []
    for i in range(len(enc) - window):
        inputs.append(enc[i : i + window])
        labels.append(enc[i + window])
    return TrainingSet(
        inputs=inputs,
        labels=labels,
        id2idx=id2idx,
        idx2id=idx2id,
        vocab_size=len(id2idx) + 1,
    )


def build_with_spark(spark, log_df, window: int = WINDOW) -> TrainingSet:
    """Same windowing as a Spark job over a (ts, query_id, block) log
    table: order by ts, collect the trailing window per row. The heavy
    lifting (ordering + windowing over a potentially huge fleet log)
    runs cluster-side; only the encoded pairs come back to the driver.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = (
        W.orderBy("ts", "block")
        .rowsBetween(-(window), -1)
    )
    rows = (
        log_df.withColumn("ctx", F.collect_list("block").over(w))
        .filter(F.size("ctx") == window)
        .select("ctx", F.col("block").alias("label"))
        .collect()
    )
    # vocab must cover every block seen (contexts + labels), in
    # first-appearance order over the chronological sequence
    seq = [int(b) for b in log_df.orderBy("ts", "block").select("block").toPandas()["block"]]
    id2idx, idx2id = build_vocab(seq)
    inputs = [[id2idx[int(b)] for b in r["ctx"]] for r in rows]
    labels = [id2idx[int(r["label"])] for r in rows]
    return TrainingSet(
        inputs=inputs,
        labels=labels,
        id2idx=id2idx,
        idx2id=idx2id,
        vocab_size=len(id2idx) + 1,
    )
