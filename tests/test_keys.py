from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.functions.keys import (
    add_collection_prefix,
    composite_key,
    strip_collection_prefix,
    transfer_key,
)


def test_prefix_roundtrip(spark):
    df = spark.createDataFrame([("0xabc",), ("wallets/0xdef",)], ["a"])
    out = df.select(
        add_collection_prefix("a").alias("p"),
        strip_collection_prefix("a").alias("s"),
    ).collect()
    assert out[0]["p"] == "wallets/0xabc"
    assert out[0]["s"] == "0xabc"  # identity when unprefixed (F2 semantics)
    assert out[1]["s"] == "0xdef"


def test_transfer_key_deterministic(spark):
    df = spark.createDataFrame(
        [(3, 100, "wallets/a", "wallets/b", "0xhash")],
        ["log_index", "block_number", "_from", "_to", "transaction_hash"],
    )
    key = df.select(transfer_key().alias("k")).collect()[0]["k"]
    assert key == "3_100_wallets/a_wallets/b_0xhash"


def test_composite_key(spark):
    df = spark.createDataFrame([("tok", "w1")], ["t", "w"])
    assert df.select(composite_key("t", "w").alias("k")).collect()[0]["k"] == "tok_w1"
