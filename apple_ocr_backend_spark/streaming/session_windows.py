"""Streaming sessionization with Spark's built-in ``session_window``.

The third streaming surface (after incremental extraction and ingestion
dedup): event-time gap sessions computed by Structured Streaming's native
session-window state store, with watermark-driven state eviction — the
streaming form of ``operators.temporal.sessionize``.

Semantics note (why this complements rather than replaces the batch
operators): the built-in emits one row per (user, merged session window)
with ``n_events``/bounds/value exactly like the batch form, but it cannot
produce the per-user running ``session_ord`` (that is a cross-session
order statistic — cheap in batch, unbounded state in a stream).  Append
mode emits a session only once the watermark passes ``session end + gap``,
so results are final (no retractions); state for closed sessions is
evicted by the watermark — bounded state at any corpus rate, which is the
100 TB property that matters.

Reference analog: the client's processing-time scan window
(``SerialScannerViewModel.swift:34-38,197-206``) generalized to event-time
with late-data handling the reference never had.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def session_agg(events, gap_minutes: int = 30, user_col: str = "user_id",
                ts_col: str = "ts", val_col: str = "value"):
    """The shared aggregation: one row per (user, session window).  Works
    on a static OR streaming frame — the batch form is the oracle for the
    streaming test."""
    return (events
            .groupBy(F.session_window(F.col(ts_col),
                                      f"{gap_minutes} minutes").alias("w"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss")
                 .alias("session_start"),
                 F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss")
                 .alias("session_end"),
                 F.sum(F.floor(F.col(val_col) * 100).cast("long"))
                 .alias("value_cents"))
            .select(user_col, "session_start", "session_end", "n_events",
                    "value_cents"))


def stream_sessionize(spark: SparkSession, input_dir: str, schema_ddl: str,
                      checkpoint_dir: str, gap_minutes: int = 30,
                      watermark: str = "0 seconds",
                      user_col: str = "user_id", ts_col: str = "ts",
                      val_col: str = "value",
                      query_name: str = "stream_sessions",
                      max_files_per_trigger: int | None = None):
    """Drain event parquet files from ``input_dir`` into finalized sessions
    (AvailableNow).  Append mode: a session row is emitted exactly once,
    when the event-time watermark passes its close; session state is then
    evicted.  Results land in the in-memory table ``query_name`` (swap the
    memory sink for parquet/icelite in production — the contract is
    identical)."""
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir).withWatermark(ts_col, watermark)
    sessions = session_agg(events, gap_minutes, user_col, ts_col, val_col)
    return (sessions.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
