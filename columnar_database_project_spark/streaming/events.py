"""Structured Streaming twins of the event-stream operators.

The reference has no data-plane streaming (SURVEY §2.3) — this module
is part of the beyond-reference surface: the batch shapes in
``operators/events.py`` re-expressed as streams, sharing the same
transformation logic, so one definition serves both execution modes.

Local tests drive these with a file source + memory sink; at scale the
source becomes Kafka/cloud storage and the sink a partitioned table —
the transformations are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_database_project_spark.functions.broadcast_policy import (
    bounded_broadcast,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream (parquet files dropped into ``path``)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window aggregation with a watermark for late data.

    Works on both a batch and a streaming DataFrame (same Catalyst
    plan shape; in streaming mode the watermark bounds state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on event_id within the watermark horizon —
    the streaming twin of keep-one-per-key dedup."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def high_value_alerts(events: DataFrame, threshold: float = 180.0) -> DataFrame:
    """Stateless filter stream (alerting shape)."""
    return events.filter(F.col("value") >= threshold).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation (overlapping windows): each event
    lands in window/slide windows; watermark bounds state. Same plan
    on batch and stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def anomaly_stream(
    events: DataFrame, stats: DataFrame, z: float = 3.0
) -> DataFrame:
    """Streaming z-score outlier flagging: a STREAM-STATIC join —
    the per-type moments are a static (batch) DataFrame, typically
    refreshed per deployment window from the batch sweep
    (``operators.events.q_events_anomaly`` computes the same flags
    batch-side). The static side is tiny and broadcast into every
    micro-batch; the stream never shuffles, so this is the append-mode
    map-only stage a 100 TB/day event feed needs.

    ``stats`` must carry (event_type, mu, sd)."""
    zcol = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        events.join(
        bounded_broadcast(stats, 1000, "per-event-type stats (type vocab is a small constant)"),
        "event_type",
    )
        .filter((F.col("sd") > 0) & (F.abs(zcol) >= z))
        .select(
            "event_id",
            "ts",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(zcol, 4).alias("z_score"),
        )
    )


def purchase_view_join(
    events: DataFrame,
    other: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each 'purchase' event joined to
    the same user's 'view' events in the preceding ``max_lag``
    (attribution shape). Both sides carry watermarks so Spark can
    discard buffered state once the interval can no longer match —
    the state-bounding contract that makes stream-stream joins viable
    at scale. Works identically on batch inputs."""
    views = (
        other.filter(F.col("event_type") == "view")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_event_id"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            "value",
        )
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_lag}")),
    ).select(
        "user_id",
        "purchase_event_id",
        "view_event_id",
        "purchase_ts",
        "view_ts",
        "value",
    )


SESSION_STATE_SCHEMA = "last_ts long, session_id long, n_events long, total double"
SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, session_value double"
)
SESSION_GAP_S = 1800


def _make_session_fn(emit_open: bool):
    """Build the applyInPandasWithState update function: per-user
    gap-based sessionization with incremental state (last_ts, session
    counter, running aggregates) — the custom-stateful-operator shape
    Spark exposes for semantics its built-in session windows can't
    cover.

    Emits a (user, session) row exactly once, when the session CLOSES
    (a later event arrives past the gap); the open session rides in
    state across micro-batches, so a multi-batch run never leaves
    partial duplicate rows in an update-mode sink. ``emit_open=True``
    additionally emits the current in-progress session each batch
    (dashboard-style running view — downstream must then key on
    (user_id, session_id) and keep the latest row).

    Session ids start at 1, matching the batch twin
    ``operators/events.q_events_sessionize`` (cumulative-sum ids).
    """

    def _session_fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, session_id, n_events, total = state.get
        else:
            last_ts, session_id, n_events, total = None, 1, 0, 0.0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                epoch = int(ts.timestamp())
                if last_ts is not None and epoch - last_ts > SESSION_GAP_S:
                    out_rows.append(
                        (user_id, session_id, n_events, round(total, 4))
                    )
                    session_id += 1
                    n_events, total = 0, 0.0
                last_ts = epoch
                n_events += 1
                total += float(value)
        state.update((last_ts, session_id, n_events, total))
        if emit_open and n_events:
            out_rows.append((user_id, session_id, n_events, round(total, 4)))
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_id", "n_events", "session_value"],
        )

    return _session_fn


def sessionize_stateful(
    events: DataFrame, watermark: str = "2 hours", emit_open: bool = False
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState —
    the streaming twin of operators/events.q_events_sessionize.
    Closed sessions only by default (see ``_make_session_fn``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(emit_open),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TRANSITION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cur", T.StringType()),
        T.StructField("nxt", T.StringType()),
    ]
)

TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_epoch", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _transition_fn(key, pdfs, state):
    """Per-user last-event state → emit one (cur, nxt) row per
    consecutive event pair, across micro-batch boundaries: the pair a
    batch lead() window would MISS at every batch seam is exactly
    what the carried (last_ts, last_type) state supplies. Events
    within a batch are sorted on the same unique (ts, event_id) key
    as the batch twin, so replaying the stream under any IN-ORDER
    batching (each user's events arrive in (ts, event_id) order
    across drops — the normal stream contract) yields the identical
    multiset of transitions (invariance is pytest-proven).

    The persisted (last_epoch, last_event_id) enforces that contract:
    an event sorting AT OR BEFORE the carried position is a
    cross-batch straggler — emitting it would fabricate a (cur, nxt)
    pair the true timeline never contained — so it is DROPPED, the
    streaming analog of the watermark discarding late rows (pytest
    covers the straggler drop)."""
    import pandas as pd

    (user_id,) = key
    if state.exists:
        last_epoch, last_eid, last_type = state.get
    else:
        last_epoch, last_eid, last_type = 0, 0, None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            epoch, eid = int(ts.timestamp()), int(eid)
            if last_type is not None and (epoch, eid) <= (last_epoch, last_eid):
                continue  # out-of-order across a batch seam: drop
            if last_type is not None:
                out.append((user_id, last_type, etype))
            last_type = etype
            last_epoch, last_eid = epoch, eid
    state.update((last_epoch, last_eid, last_type))
    yield pd.DataFrame(out, columns=["user_id", "cur", "nxt"])


def transitions_stateful(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``operators/events.q_events_markov_transitions``'
    pair extraction: continuous (cur → nxt) event-type transitions via
    applyInPandasWithState (a lead() window is not available over an
    unbounded stream — carrying the last event per user in state IS
    the streaming form of lead). Downstream, the transition counts /
    conditional probabilities are a plain streaming aggregation over
    this frame; state is one (long, long, string) per user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _transition_fn,
            outputStructType=TRANSITION_OUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> "object":
    """Drive a streaming DataFrame into an in-memory table and process
    everything currently available (test/demo harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    return q
