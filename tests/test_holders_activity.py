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


def test_whale_flag_expression(spark):
    from token_etl_spark.operators.holders import whale_flag

    df = spark.createDataFrame([(499.9,), (500.0,), (500.1,)], "balance double")
    out = [r["w"] for r in df.select(whale_flag("balance", 1_000_000.0, 0.0005).alias("w")).collect()]
    assert out == [False, True, True]


def test_with_whale_flag_broadcast_dim(spark):
    from token_etl_spark import fixtures
    from token_etl_spark.operators.holders import with_whale_flag

    balances = spark.createDataFrame(
        [(fixtures.TOKENS[0][0], "a", 600.0), (fixtures.TOKENS[0][0], "b", 400.0),
         ("0xunknown", "c", 1e12)],
        "contract_address string, address string, balance double",
    )
    out = {r["address"]: r["isWhale"] for r in
           with_whale_flag(balances, fixtures.token_metadata_df(spark)).collect()}
    # VALAS threshold = 0.0005 × 1,000,000 = 500
    assert out == {"a": True, "b": False, "c": False}  # unknown token → False


def test_dapp_changelog_hourly(spark):
    from token_etl_spark.operators.dapps import dapp_changelog

    matched = spark.createDataFrame(
        [("d1", "3600"), ("d2", "3700"), ("d1", "3800"), ("d1", "7300")],
        "idCMC string, transact_at string",
    ).withColumn("ts", F.col("transact_at").cast("long"))
    got = {r["timestamp"]: (r["dapp_count"], r["dapp_ids"]) for r in dapp_changelog(matched, "ts").collect()}
    assert got == {3600: (2, ["d1", "d1", "d2"]), 7200: (1, ["d1"])}


def test_address_rollup_sorted(spark):
    from token_etl_spark.operators.activity import address_rollup

    df = spark.createDataFrame(
        [(1, "z"), (1, "a"), (2, "m")], "g int, address string"
    )
    got = {r["g"]: r["addresses"] for r in address_rollup(df, ["g"]).collect()}
    assert got == {1: ["a", "z"], 2: ["m"]}


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
