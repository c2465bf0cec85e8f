"""Stream-stream and stream-static joins (Structured Streaming surface
beyond the reference, which is batch-only — SURVEY §2.9).

Stream-stream inner joins require event-time bounds so Spark can evict
buffered state: both sides carry watermarks and the join condition
includes a time range. This module's ``clicks_to_purchases_stream`` is
the streaming twin of the batch banded range join
(``rel_range_join_purchases``) and is tested for equality against it on
a replayed stream.

State size: each side buffers only rows within its watermark horizon —
bounded by (arrival rate × horizon), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Stream-static broadcast enrichment: the static side re-resolves per
    micro-batch (so a refreshed dim table takes effect without restart)."""
    return stream.join(F.broadcast(dim), on)


def clicks_to_purchases_stream(
    events_stream: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each click paired with the same user's
    purchases in the following ``window_seconds``. Returns
    (click_id, user_id, click_ts, purchase_ts).

    Both sides are the same input stream filtered by type (Spark plans
    two stateful scans); watermarks bound the buffered state and the
    range condition lets late rows on either side be evicted once the
    other side's watermark passes the join window.
    """
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events_stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
        "inner",
    ).select("click_id", "user_id", "click_ts", "purchase_ts")
