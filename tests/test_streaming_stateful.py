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
