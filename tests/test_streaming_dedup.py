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


def test_streaming_neardup_matches_sequential_batch(spark, sf_dir, tmp_path):
    """run_streaming_neardup over micro-batches (one file per trigger,
    file order pinned via mtimes) admits exactly the documents a
    sequential batch replay of minhash_match_index admits, appends the
    same verified match pairs, and leaves an index the batch pipeline
    can read directly."""
    import os
    import time as _time

    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.dedup import (
        minhash_index_frame,
        minhash_match_index,
    )
    from token_etl_spark.streaming.dedup import run_streaming_neardup

    docs = load_table(spark, sf_dir, "documents").limit(120).localCheckpoint()
    gens = [docs.where(F.col("doc_id") % 3 == g) for g in range(3)]
    # guarantee cross-generation near-dups: generation 1 re-crawls ten
    # generation-0 documents under fresh ids (exact text => jaccard 1.0)
    recrawl = (
        gens[0]
        .orderBy("doc_id")
        .limit(10)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    gens[1] = gens[1].unionByName(recrawl)

    staged = tmp_path / "neardup_stream"
    staged.mkdir()
    for g, frame in enumerate(gens):
        sub = tmp_path / f"gen{g}"
        frame.coalesce(1).write.parquet(str(sub))
        part = next(p for p in sub.iterdir() if p.name.endswith(".parquet"))
        dst = staged / f"gen{g}.parquet"
        part.rename(dst)
        # FileStreamSource orders by modification time: pin generation order
        os.utime(dst, (1_700_000_000 + g, 1_700_000_000 + g))

    index_path = str(tmp_path / "neardup_index")
    matches_path = str(tmp_path / "neardup_matches")
    checkpoint_path = str(tmp_path / "neardup_ckpt")

    def _run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(staged))
        )
        run_streaming_neardup(
            stream,
            index_path,
            threshold=0.5,
            matches_path=matches_path,
            checkpoint_path=checkpoint_path,
        )

    _run()

    # sequential batch replay with the same operators, same order
    exp_index_ids: set = set()
    exp_matches: set = set()
    index = None
    for frame in gens:
        new_idx = minhash_index_frame(frame)
        if index is not None:
            m = minhash_match_index(frame, index, threshold=0.5)
            rows = m.collect()
            exp_matches |= {
                (r["id_new"], r["id_ref"], round(r["jaccard"], 6)) for r in rows
            }
            dup = {r["id_new"] for r in rows}
        else:
            dup = set()
        admitted = new_idx.where(~F.col("id").isin(dup))
        exp_index_ids |= {r["id"] for r in admitted.select("id").collect()}
        index = (
            admitted
            if index is None
            else index.unionByName(admitted)
        ).localCheckpoint()

    from token_etl_spark.streaming.dedup import (
        read_neardup_index,
        read_neardup_matches,
    )

    def _observed():
        ids = {
            r["id"]
            for r in read_neardup_index(spark, index_path).select("id").collect()
        }
        pairs = {
            (r["id_new"], r["id_ref"], round(r["jaccard"], 6))
            for r in read_neardup_matches(spark, matches_path).collect()
        }
        return ids, pairs

    got_ids, got_matches = _observed()
    assert got_ids == exp_index_ids and got_ids
    assert exp_matches  # the recrawl fixture guarantees match pairs
    assert got_matches == exp_matches
    # the ten recrawled copies were matched to the index, not admitted
    assert not any(i >= 1_000_000 for i in got_ids)
    # the persisted index is directly usable by the batch matcher
    post = minhash_match_index(
        docs.where(F.col("doc_id") % 3 == 0), read_neardup_index(spark, index_path)
    )
    assert post.count() > 0  # re-presented admitted docs self-match

    # IDEMPOTENCY: re-running over the same source with the same
    # checkpoint replays no batch (offsets are committed), and the
    # batch_id-keyed overwrite writes mean even a replayed batch would
    # rewrite its own partition, not append duplicates — state unchanged.
    _run()
    assert _observed() == (got_ids, got_matches)
