from __future__ import annotations

import shutil

import pytest

from token_etl_spark.io.sources import load_table
from token_etl_spark.plans.domain import q_tumbling_hourly
from token_etl_spark.streaming.hourly import (
    hourly_metrics_stream,
    run_foreach_batch_upsert,
    run_to_memory,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    # Stage the events table as normal-microsecond parquet (file stream
    # source can't use the nanos conversion path), then assert the
    # watermarked streaming aggregation equals the batch tumbling query.
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_stream")
    events.write.parquet(staged)

    stream_df = hourly_metrics_stream(spark, staged, events.schema)
    run_to_memory(stream_df, "hourly_test")
    got = spark.sql("SELECT * FROM hourly_test").collect()

    exp = q_tumbling_hourly(spark, sf_dir).collect()
    key = lambda r: (r["hour_ts"], r["event_type"])  # noqa: E731
    got_map = {key(r): (r["n_events"], round(r["volume"], 6)) for r in got}
    exp_map = {key(r): (r["n_events"], round(r["volume"], 6)) for r in exp}
    assert got_map == exp_map


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_fb")
    out = str(tmp_path / "metrics_out")
    events.write.parquet(staged)

    # run the stream twice over the same input: the keyed upsert must
    # converge, not duplicate
    for _ in range(2):
        stream_df = hourly_metrics_stream(spark, staged, events.schema)
        run_foreach_batch_upsert(stream_df, out)

    sunk = spark.read.parquet(out)
    exp = q_tumbling_hourly(spark, sf_dir)
    assert sunk.count() == exp.count()
    got_map = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], round(r["volume"], 6))
        for r in sunk.collect()
    }
    exp_map = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], round(r["volume"], 6))
        for r in exp.collect()
    }
    assert got_map == exp_map
