from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.streaming.dedup import (
    read_file_stream,
    streaming_dedup_exact,
    streaming_dedup_within_watermark,
)
from token_etl_spark.streaming.hourly import run_to_memory


def _staged_with_dups(spark, sf_dir, tmp_path, name):
    """events ∪ events (every row duplicated) staged for a file stream."""
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / name)
    events.union(events).write.parquet(staged)
    return events, staged


def test_streaming_exact_dedup_drops_replayed_rows(spark, sf_dir, tmp_path):
    events, staged = _staged_with_dups(spark, sf_dir, tmp_path, "sd_exact")
    stream = read_file_stream(spark, staged, events.schema)
    deduped = streaming_dedup_exact(stream, ["event_id"])
    run_to_memory(deduped, "sd_exact_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM sd_exact_out").collect()[0]
    n_distinct = events.select("event_id").distinct().count()
    assert got.n == got.d == n_distinct


def test_streaming_watermark_dedup_drops_replayed_rows(spark, sf_dir, tmp_path):
    events, staged = _staged_with_dups(spark, sf_dir, tmp_path, "sd_wm")
    stream = read_file_stream(spark, staged, events.schema)
    deduped = streaming_dedup_within_watermark(
        stream, ["event_id"], ts_col="ts", watermark="10 seconds"
    )
    run_to_memory(deduped, "sd_wm_out", output_mode="append")
    # Replays arrive in the same micro-batch (well inside the watermark),
    # so every duplicate is suppressed.
    got = spark.sql("SELECT count(*) AS n FROM sd_wm_out").collect()[0]
    assert got.n == events.select("event_id").distinct().count()


def test_streaming_dedup_keeps_payload_columns(spark, sf_dir, tmp_path):
    events, staged = _staged_with_dups(spark, sf_dir, tmp_path, "sd_cols")
    stream = read_file_stream(spark, staged, events.schema)
    deduped = streaming_dedup_exact(stream, ["event_id"])
    run_to_memory(deduped, "sd_cols_out", output_mode="append")
    batch = spark.sql("SELECT * FROM sd_cols_out")
    assert set(batch.columns) == set(events.columns)
    # spot-check one payload value survives intact
    eid = events.select("event_id").limit(1).collect()[0][0]
    exp = events.filter(F.col("event_id") == eid).select("value").collect()[0][0]
    got = batch.filter(F.col("event_id") == eid).select("value").collect()[0][0]
    assert got == exp
