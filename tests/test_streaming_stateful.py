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


def test_streaming_funnel_matches_batch_on_inorder_replay(spark, sf_dir, tmp_path):
    """streaming_funnel_reach over a time-split in-order replay (one file
    per event-time range, file order pinned via mtimes) lands every user
    on exactly the batch funnel_reach tuple — the anchored-first fold
    carried across micro-batch boundaries in bounded per-user state."""
    import os

    from token_etl_spark.operators.funnel import funnel_reach
    from token_etl_spark.streaming.stateful import streaming_funnel_reach

    steps = ["view", "click", "purchase"]
    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))
    ).first()
    cuts = [lo + (hi - lo) * i // 3 for i in range(1, 3)] + [hi + 1]
    staged = tmp_path / "funnel_stream"
    staged.mkdir()
    prev = lo - 1
    for g, cut in enumerate(cuts):
        part_dir = tmp_path / f"fg{g}"
        (
            events.where(
                (F.unix_micros("ts") > prev) & (F.unix_micros("ts") <= cut)
            )
            .coalesce(1)
            .write.parquet(str(part_dir))
        )
        prev = cut
        part = next(p for p in part_dir.iterdir() if p.name.endswith(".parquet"))
        dst = staged / f"fg{g}.parquet"
        part.rename(dst)
        os.utime(dst, (1_700_000_000 + g, 1_700_000_000 + g))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
    )
    out = streaming_funnel_reach(stream, steps, window_s=7 * 86_400)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["user"]: (r["t1"], r["t2"], r["t3"])
        for r in spark.sql(
            "SELECT user, t1, t2, t3 FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user ORDER BY n_events DESC) rn FROM funnel_state) WHERE rn = 1"
        ).collect()
    }
    exp = {
        r["user"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_reach(events, steps, window_s=7 * 86_400).collect()
    }
    assert got == exp and got
    # the fixture exercises real conversions AND real nulls
    assert any(v[2] is not None for v in exp.values())


def test_streaming_funnel_state_is_bounded_and_monotone(spark, tmp_path):
    """Replaying the SAME events again changes nothing (t-slots are
    write-once), and a late step-1 event does not re-anchor — the
    declared streaming divergence."""
    import datetime as dt

    from token_etl_spark.streaming.stateful import streaming_funnel_reach

    def ev(u, typ, sec):
        return (u, typ, dt.datetime(2024, 1, 1, 0, 0, sec), 1.0)

    rows = [ev(1, "view", 10), ev(1, "click", 20), ev(1, "view", 5)]
    batch1 = spark.createDataFrame(rows[:2], ["user_id", "event_type", "ts", "value"])
    batch2 = spark.createDataFrame(rows[2:], ["user_id", "event_type", "ts", "value"])
    staged = tmp_path / "funnel_mono"
    staged.mkdir()
    import os
    for g, b in enumerate((batch1, batch2)):
        d = tmp_path / f"fm{g}"
        b.coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        dst = staged / f"fm{g}.parquet"
        part.rename(dst)
        os.utime(dst, (1_700_000_000 + g, 1_700_000_000 + g))
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
    )
    out = streaming_funnel_reach(stream, ["view", "click"], window_s=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_mono")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.sql(
        "SELECT t1, t2 FROM (SELECT *, row_number() OVER "
        "(PARTITION BY user ORDER BY n_events DESC) rn FROM funnel_mono) WHERE rn = 1"
    ).collect()[0]
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    # anchored at the FIRST-ARRIVED view (sec 10), not the late sec-5 one
    assert final["t1"] == int((base + 10) * 1_000_000)
    assert final["t2"] == int((base + 20) * 1_000_000)


def test_streaming_retention_matches_batch_triangle(spark, sf_dir, tmp_path):
    """run_streaming_retention over shuffled micro-batches (arrival order
    deliberately NOT event-time order) lands on exactly the batch
    retention_cohorts triangle — set-union state is order-insensitive."""
    from token_etl_spark.operators.funnel import retention_cohorts
    from token_etl_spark.streaming.stateful import (
        retention_from_state,
        run_streaming_retention,
    )

    events = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "retention_stream")
    # repartition by hash => files mix event times across batches
    events.repartition(4).write.parquet(staged)
    state = str(tmp_path / "retention_state")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    run_streaming_retention(stream, state)

    got = {
        (r["cohort"], r["period_offset"], r["n_users"])
        for r in retention_from_state(spark, state).collect()
    }
    exp = {
        (r["cohort"], r["period_offset"], r["n_users"])
        for r in retention_cohorts(events).collect()
    }
    assert got == exp and got


def test_streaming_funnel_out_of_order_boundary_is_pinned(spark, tmp_path):
    """r6 verdict item 7: the arrival-order caveat as a CONTRACT. Late
    (out-of-order) events arriving in a later micro-batch do NOT rewind
    the fold: an earlier step-1 event cannot re-anchor a funnel that
    already anchored, and an earlier qualifying step-i event cannot
    replace a taken slot — while later-step progress from the late batch
    still applies. The test replays exactly that and pins the declared
    final state, which intentionally DIFFERS from the batch operator's
    full-history answer (asserted too, so a silent semantics change in
    either direction fails here)."""
    import datetime as dt
    import os

    from token_etl_spark.operators.funnel import funnel_reach
    from token_etl_spark.streaming.stateful import streaming_funnel_reach

    steps = ["view", "click", "purchase"]
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    base_us = int(base.timestamp()) * 1_000_000

    def _frame(rows):
        return spark.createDataFrame(
            [
                (u, t, base + dt.timedelta(seconds=s))
                for (u, t, s) in rows
            ],
            "user_id long, event_type string, ts timestamp",
        )

    # batch A (arrives first): u1 anchors late-ish, u2 anchors + clicks
    batch_a = [(1, "view", 100), (1, "click", 110), (2, "view", 0), (2, "click", 50)]
    # batch B (arrives second, carries OUT-OF-ORDER event times):
    #   u1: a step-1 view EARLIER than the anchor + an in-order purchase
    #   u2: a click EARLIER than the taken t2
    batch_b = [(1, "view", 0), (1, "purchase", 120), (2, "click", 10)]

    staged = tmp_path / "ooo_funnel"
    staged.mkdir()
    for g, rows in enumerate([batch_a, batch_b]):
        part_dir = tmp_path / f"ooo_g{g}"
        _frame(rows).coalesce(1).write.parquet(str(part_dir))
        part = next(p for p in part_dir.iterdir() if p.name.endswith(".parquet"))
        dst = staged / f"g{g}.parquet"
        part.rename(dst)
        os.utime(dst, (1_700_000_000 + g, 1_700_000_000 + g))

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
    )
    out = streaming_funnel_reach(stream, steps, window_s=86_400)
    q = (
        out.writeStream.format("memory")
        .queryName("ooo_funnel_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user"]: (r["t1"], r["t2"], r["t3"])
        for r in spark.sql(
            "SELECT user, t1, t2, t3 FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user ORDER BY n_events DESC) rn FROM ooo_funnel_state)"
            " WHERE rn = 1"
        ).collect()
    }
    s = lambda sec: base_us + sec * 1_000_000  # noqa: E731
    # declared: no re-anchor (u1 keeps t1=100), no slot replacement
    # (u2 keeps t2=50), late batch still advances later steps (u1 t3)
    assert got == {
        1: (s(100), s(110), s(120)),
        2: (s(0), s(50), None),
    }
    # and that is a DIFFERENT answer than the batch fold over the full
    # history (which re-anchors u1 at 0 and takes u2's earlier click)
    batch = {
        r["user"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_reach(
            _frame(batch_a + batch_b), steps, window_s=86_400
        ).collect()
    }
    assert batch == {
        1: (s(0), s(110), s(120)),
        2: (s(0), s(10), None),
    }
