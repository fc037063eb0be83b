"""Structured Streaming twins: file source → memory sink, compared
against the equivalent batch computation on the same data."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.streaming.events import (
    dedup_stream,
    high_value_alerts,
    read_event_stream,
    run_to_memory,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """Events table rewritten as a 3-file directory (arrival batches)."""
    out = str(tmp_path_factory.mktemp("stream") / "events")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(3).write.parquet(out)
    return out


class TestStreamingTwins:
    def test_tumbling_counts_matches_batch(self, spark, stream_dir):
        stream = read_event_stream(spark, stream_dir)
        q = run_to_memory(tumbling_counts(stream), "t_tumbling", "complete")
        try:
            got = {
                (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
                for r in spark.sql("SELECT * FROM t_tumbling").collect()
            }
            batch = {
                (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
                for r in tumbling_counts(spark.read.parquet(stream_dir)).collect()
            }
            assert got == batch
            assert len(got) > 5
        finally:
            q.stop()

    def test_dedup_stream(self, spark, stream_dir):
        # files arrive in random event-time order → use a watermark
        # wider than the data span so nothing is treated as late
        stream = read_event_stream(spark, stream_dir)
        q = run_to_memory(dedup_stream(stream, watermark="365 days"), "t_dedup", "append")
        try:
            n = spark.sql("SELECT count(*) AS c FROM t_dedup").collect()[0]["c"]
            total = spark.read.parquet(stream_dir).count()
            distinct = (
                spark.read.parquet(stream_dir).select("event_id").distinct().count()
            )
            assert n == distinct == total   # event_id is unique in testdata
        finally:
            q.stop()

    def test_alerts_filter(self, spark, stream_dir):
        stream = read_event_stream(spark, stream_dir)
        q = run_to_memory(high_value_alerts(stream, 180.0), "t_alerts", "append")
        try:
            n = spark.sql("SELECT count(*) AS c FROM t_alerts").collect()[0]["c"]
            expected = (
                spark.read.parquet(stream_dir).filter(F.col("value") >= 180.0).count()
            )
            assert n == expected
        finally:
            q.stop()
