from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.streaming.hourly import run_to_memory
from token_etl_spark.streaming.joins import (
    clicks_to_purchases_stream,
    stream_static_enrich,
)


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_ssj")
    events.write.parquet(staged)

    stream = spark.readStream.schema(events.schema).parquet(staged)
    joined = clicks_to_purchases_stream(stream, window_seconds=3600)
    run_to_memory(joined, "ssj_out", output_mode="append")
    got = {
        (r.click_id, r.purchase_ts)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    # batch twin: the banded range join over the same data
    from token_etl_spark.operators.asof import range_join

    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    exp_df = range_join(
        clicks, purchases, ["user_id"], "click_ts", "purchase_ts", 0, 3600
    )
    exp = {(r.click_id, r.purchase_ts) for r in exp_df.collect()}
    # unix_timestamp truncation in the batch form vs native timestamp
    # comparison in the stream form can differ at sub-second boundaries;
    # compare on the common (second-truncated) semantics
    assert len(got) > 0
    sym = got.symmetric_difference(exp)
    # allow only boundary rows (delay within 1s of the window edge)
    for click_id, pts in sym:
        raise AssertionError(f"mismatch: {click_id} {pts}")


def test_stream_static_enrich_broadcasts_dim(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_sse")
    events.write.parquet(staged)
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0)], "event_type string, weight double"
    )
    stream = spark.readStream.schema(events.schema).parquet(staged)
    out = stream_static_enrich(stream, dim, ["event_type"])
    run_to_memory(out, "sse_out", output_mode="append")
    rows = spark.sql("SELECT * FROM sse_out").collect()
    n_exp = events.filter(F.col("event_type").isin("click", "purchase")).count()
    assert len(rows) == n_exp
    assert all(r.weight in (1.0, 5.0) for r in rows)
