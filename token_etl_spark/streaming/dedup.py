"""Streaming deduplication — the streaming twin of the batch exact-dedup
operator (operators/dedup.py), for ingest-time duplicate suppression in a
training-data pipeline (re-crawled pages, redelivered queue messages).

Two forms, both built on Structured Streaming's keyed dedup state:

- ``streaming_dedup_exact``: ``dropDuplicates`` on the key columns —
  state grows with distinct keys forever (exact across the whole stream).
- ``streaming_dedup_within_watermark``: ``dropDuplicatesWithinWatermark``
  — duplicates are only suppressed when they arrive within the watermark
  horizon of the first occurrence, and state is evicted past it. This is
  the 100 TB-safe form: bounded state, at the cost of readmitting a
  duplicate that recurs later than the horizon (downstream batch dedup
  catches those).

No counterpart exists in the reference (SURVEY §2.9 — batch only); this
is a capability extension over the driver's ``events`` stream shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_file_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File-source stream over a staged parquet directory (test harness
    shape — production would read Kafka or cloud-storage notifications)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_dedup_exact(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Whole-stream exact dedup on ``keys``. Unbounded state: one state
    row per distinct key, forever. Use only when the key space is bounded
    (e.g. bounded backfill replays)."""
    return stream.dropDuplicates(keys)


def streaming_dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermark-bounded dedup: suppress duplicates arriving within
    ``watermark`` of the first occurrence; evict state beyond it.

    The event-time column must NOT be part of ``keys`` (redelivered
    events typically carry the same payload key but a fresh arrival
    time — dropDuplicatesWithinWatermark matches on keys only).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
