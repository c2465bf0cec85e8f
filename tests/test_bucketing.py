"""Bucketed-table co-located joins: the write-once/shuffle-never layout
primitive (operators/layout.py write_bucketed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from token_etl_spark.operators.layout import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the Exchange (or its absence) is visible."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_cobucketed_join_has_no_shuffle(spark, no_broadcast):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(left, "bkt_left", "k", n_buckets=8)
    write_bucketed(right, "bkt_right", "k", n_buckets=8)
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # bucket-sorted files also kill the per-task sort
        assert joined.count() == 3334
        # same join on plain (non-bucketed) frames shuffles both sides
        shuffled = left.join(right, "k")
        plan2 = shuffled._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange") >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_groupby_has_no_shuffle(spark, no_broadcast):
    df = spark.range(0, 5_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "bkt_agg", "k", n_buckets=4)
    try:
        agg = spark.table("bkt_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_agg")
