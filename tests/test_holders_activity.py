from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators.activity import (
    avg_tx_per_day,
    tx_count,
    unique_active_wallets,
    wallet_cluster,
    wallet_cluster_pivot,
)
from token_etl_spark.operators.holders import holder_count, holder_flag


def test_holder_flag_reference_semantics(spark):
    # P7: holder when balance > t OR (pre_balance > t AND balance IS NULL)
    df = spark.createDataFrame(
        [(1.0, None), (0.0, None), (None, 5.0), (None, 0.0)],
        "balance double, pre_balance double",
    )
    out = df.select(
        holder_flag(F.col("balance"), F.col("pre_balance"), 0.0).alias("h")
    ).collect()
    assert [r["h"] for r in out] == [True, False, True, False]


def test_holder_count_sums_booleans(spark):
    df = spark.createDataFrame(
        [(3600, True), (3600, True), (3600, False), (7200, True)],
        "timestamp long, isHolder boolean",
    )
    got = {r["timestamp"]: r["holder_count"] for r in holder_count(df).collect()}
    assert got == {3600: 2, 7200: 1}


def test_avg_tx_per_day_is_count_div_24(spark):
    # A4 quirk (BaseEnricher.scala:213-220): per-day count / 24, not a mean.
    df = spark.createDataFrame([(i,) for i in range(48)], ["ts"]).withColumn(
        "ts", F.col("ts") * 1800
    )  # 48 events in day 0
    out = avg_tx_per_day(df, "ts").collect()
    assert len(out) == 1
    assert out[0]["avg_tx_per_day"] == 48 / 24.0


def test_unique_active_wallets_counts_both_endpoints(spark):
    df = spark.createDataFrame(
        [("wallets/a", "wallets/b", "3600"), ("wallets/b", "wallets/c", "3800")],
        ["_from", "_to", "transact_at"],
    ).withColumn("ts", F.col("transact_at").cast("long"))
    out = unique_active_wallets(df, "ts").collect()
    assert out[0]["unique_wallets"] == 3


def test_wallet_cluster_pivot_deterministic(spark):
    df = spark.createDataFrame(
        [(3600, "x", 10.0), (3600, "y", 5000.0), (3600, "z", 500000.0), (3600, "w", 20.0)],
        "timestamp long, address string, balance double",
    ).withColumn("walletCluster", wallet_cluster())
    row = wallet_cluster_pivot(df).collect()[0]
    # min(address) per cluster cell: LOW gets min('x','w')='w'
    assert (row["LOW"], row["MEDIUM"], row["HIGH"]) == ("w", "y", "z")


def test_tx_count_day_bucket(spark):
    df = spark.createDataFrame([(10,), (86410,), (86420,)], ["ts"])
    got = {r["timestamp"]: r["tx_count"] for r in tx_count(df, "ts", width=86400).collect()}
    assert got == {0: 1, 86400: 2}
