from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.streaming.stateful import streaming_running_balance


def test_stateful_stream_final_balances_match_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_state")
    events.write.parquet(staged)

    stream = spark.readStream.schema(events.schema).parquet(staged)
    out = streaming_running_balance(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_bal")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.sql(
        "SELECT user_id, balance FROM (SELECT user_id, balance, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts_sec DESC) rn FROM running_bal) WHERE rn = 1"
    ).collect()
    got_final = {r["user_id"]: round(r["balance"], 6) for r in got}

    exp = (
        events.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", -F.col("value")).otherwise(F.col("value"))
            ).alias("balance")
        )
        .collect()
    )
    exp_final = {r["user_id"]: round(r["balance"], 6) for r in exp}
    assert got_final == exp_final


def test_streaming_ewma_matches_batch_recurrence(spark, sf_dir, tmp_path):
    from token_etl_spark.operators.timeseries import grouped_ewma
    from token_etl_spark.streaming.stateful import streaming_ewma

    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_ewma")
    events.write.parquet(staged)

    stream = spark.readStream.schema(events.schema).parquet(staged)
    out = streaming_ewma(stream, alpha=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.ts_sec): round(r.ewma, 9)
        for r in spark.sql("SELECT * FROM ewma_stream").collect()
    }

    batch = grouped_ewma(
        events.select(
            "user_id",
            F.unix_timestamp("ts").cast("long").alias("ts_sec"),
            F.col("value").cast("double").alias("value"),
        ),
        ["user_id"],
        "ts_sec",
        "value",
        alpha=0.3,
    )
    exp = {(r.user_id, r.ts_sec): round(r.ewma, 9) for r in batch.collect()}
    assert got == exp and len(got) > 0
