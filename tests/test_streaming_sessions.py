from __future__ import annotations

from token_etl_spark.io.sources import load_table
from token_etl_spark.plans.domain import q_sessionization
from token_etl_spark.streaming.sessions import session_metrics_stream


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_sess")
    events.write.parquet(staged)

    stream_df = session_metrics_stream(spark, staged, events.schema)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sessions_test").collect()
    got_map = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["session_value"], 6))
        for r in got
    }

    exp = q_sessionization(spark, sf_dir).collect()
    exp_map = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["session_value"], 6))
        for r in exp
    }
    assert got_map == exp_map
