"""Streaming session windows — the watermarked twin of the batch
sessionization query (plans/domain.py q_sessionization).

``F.session_window(ts, gap)`` keeps per-key session state that closes
when no event arrives within the gap; the watermark bounds how long an
open session can wait for late data before it is finalized. State per
key is one open window — bounded by active-key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_metrics_stream(
    spark,
    source_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """File stream → per-(user, session-window) aggregates."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
