"""Orchestrated real-time pipeline — the streaming twin of
``pipelines.run_daily_etl``, covering the reference's full Lambda path
(``scripts/07_lambda_functions.py``) as one job family over an event
source.

Lands, under ``warehouse/``:
- ``alerts/``         threshold alerts, append-only history (ST4's
                      alerts_history + SNS publish)
- ``latest_status/``  keyed last-event state via the upsert sink (ST2's
                      DynamoDB deliveries_status)
- ``hourly_counts/``  watermarked tumbling aggregates, append-on-close
                      (the event-time rollup the reference lacks, ST6)

All three queries share one source definition and one checkpoint root;
``run_until_drained`` drives them to completion over the currently
available files (tests/backfills — production drops the drain and lets
the triggers run).

Scale notes: alerts are stateless map-side work; latest-status keeps one
row per key in the state store; the windowed agg's state is bounded by the
watermark.  Each sink is idempotent (append with exactly-once file-sink
semantics, or keyed merge), so checkpoint recovery never duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.upsert import foreach_batch_upsert
from .jobs import alert_stream, read_event_stream, windowed_counts


def start_streaming_pipeline(
    spark: SparkSession,
    source_dir: str,
    warehouse: str,
    alert_threshold: float = 35.0,
    watermark: str = "10 hours",
):
    """Start the three streaming queries; returns them (caller stops)."""
    events = read_event_stream(spark, source_dir)

    alerts_q = (
        alert_stream(events, threshold=alert_threshold)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(warehouse, "alerts"))
        .option("checkpointLocation", os.path.join(warehouse, "_ckpt", "alerts"))
        .start()
    )

    status_q = (
        events.writeStream.foreachBatch(
            foreach_batch_upsert(
                os.path.join(warehouse, "latest_status"),
                keys=["user_id"],
                version_col="event_id",
            )
        )
        .option("checkpointLocation", os.path.join(warehouse, "_ckpt", "status"))
        .start()
    )

    counts_q = (
        windowed_counts(events, watermark=watermark, window="1 hour")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(warehouse, "hourly_counts"))
        .option("checkpointLocation", os.path.join(warehouse, "_ckpt", "counts"))
        .start()
    )
    return [alerts_q, status_q, counts_q]


def run_until_drained(queries) -> None:
    """Drive every query over all currently-available input, then stop —
    the AvailableNow-style batch-over-stream used by tests and backfills."""
    for q in queries:
        q.processAllAvailable()
    for q in queries:
        q.stop()
