"""Mergeable-sketch operators: bounded-memory heavy hitters.

Misra-Gries is THE deterministic frequent-items sketch (Misra & Gries
1982; the "mergeable summaries" formulation is Agarwal et al., PODS
2012): a capacity-K counter set whose decrement step guarantees every
item with true frequency > n/(K+1) survives. The operator here is the
standard two-phase exact heavy hitters at scale:

1. **Sketch phase** — each partition builds an MG summary of its token
   stream in O(K) memory (batch-vectorized: exact value_counts per
   Arrow batch, merged, then MG-reduced back to K entries — the merge
   + reduce preserves the guarantee). Emits candidate terms only.
2. **Verify phase** — exact counts for the candidate set alone
   (broadcast semi-join; at most K × partitions candidates), threshold
   ``cnt * (K+1) > n`` in integer arithmetic.

Phase-1's guarantee makes the union of partition candidates a superset
of every global heavy hitter (pigeonhole over the partition split), so
the verified output EQUALS the full GROUP BY ... HAVING answer — which
is what the DuckDB oracle runs. The sketch is not an approximation
here; it is the bounded-memory route to the exact answer: the full
per-term hash table never materializes on any single node.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.operators.text import tokens_col

MG_CAPACITY = 30     # K: guarantees survival of items with freq > n/(K+1)


def mg_reduce(counters: dict, k: int) -> dict:
    """Shrink a counter dict to <= k entries by the Misra-Gries
    decrement: subtract the (k+1)-th largest count from everything and
    drop the non-positive. Each surviving count is an underestimate by
    at most the total decrement, which the MG analysis bounds by
    n/(k+1) over the whole stream."""
    if len(counters) <= k:
        return counters
    delta = sorted(counters.values(), reverse=True)[k]
    return {t: c - delta for t, c in counters.items() if c > delta}


def _mg_partition_summary(
    batches: Iterator[pd.DataFrame], k: int = MG_CAPACITY
) -> dict:
    """Capacity-k MG summary of one partition's ``term`` stream:
    exact value_counts per Arrow batch (vectorized), merged, reduced."""
    counters: dict = {}
    for pdf in batches:
        # exact per-batch counts, vectorized; merging exact sub-stream
        # counts then reducing is the mergeable-summaries formulation
        for term, c in pdf["term"].value_counts().items():
            counters[term] = counters.get(term, 0) + int(c)
        counters = mg_reduce(counters, k)
    return counters


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    counters = _mg_partition_summary(batches)
    yield pd.DataFrame({"term": list(counters.keys())})


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Partition kernel emitting (term, cnt) MG entries — <= K rows per
    partition, the bounded payload a driver-side merge may collect."""
    counters = _mg_partition_summary(batches)
    yield pd.DataFrame(
        {"term": list(counters.keys()), "cnt": list(counters.values())}
    )


def q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (freq > n/(K+1)) via the two-phase
    MG sketch — see the module docstring for why the result is exact
    and the memory is bounded by K per task."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens_col()).alias("term"))
    candidates = terms.mapInPandas(_mg_candidates, schema="term string").distinct()
    total = terms.agg(F.count(F.lit(1)).alias("n"))
    return (
        terms.join(F.broadcast(candidates), "term")   # verify ONLY candidates
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (MG_CAPACITY + 1) > F.col("n"))
        .select("term", "cnt")
    )


QUERIES = {
    "sketch_heavy_hitters": q_sketch_heavy_hitters,
}

ORACLES = {
    "sketch_heavy_hitters": f"""
        WITH tf AS (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ), c AS (
            SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tf GROUP BY term
        ), n AS (
            SELECT count(*) AS n FROM tf
        )
        SELECT term, cnt FROM c, n WHERE cnt * {MG_CAPACITY + 1} > n
    """,
}
