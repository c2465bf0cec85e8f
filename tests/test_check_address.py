from __future__ import annotations

import pytest

from token_etl_spark import fixtures
from token_etl_spark.pipelines.wallets import wallet_balance_changelogs
from token_etl_spark.utils.check_address import is_dapp_address, is_whale_address


def test_is_dapp_address(spark):
    dapps = spark.createDataFrame(
        [("k1", "d1", "Swap", None, [fixtures.DAPP_OVERLAP_ADDRESS, "0xother"])],
        "_key string, idCMC string, name string, image string, address array<string>",
    )
    assert is_dapp_address(dapps, fixtures.DAPP_OVERLAP_ADDRESS)
    assert not is_dapp_address(dapps, "0xnotthere")


def test_reparse_map_retypes_document_column(spark):
    from pyspark.sql import types as T

    from token_etl_spark.utils.check_address import reparse_map

    df = spark.createDataFrame(
        [(1, {"3600": {"isWhale": True, "balance": 5.0}})],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "logs",
                    T.MapType(
                        T.StringType(),
                        T.StructType(
                            [
                                T.StructField("isWhale", T.BooleanType()),
                                T.StructField("balance", T.DoubleType()),
                            ]
                        ),
                    ),
                ),
            ]
        ),
    )
    target = T.MapType(
        T.LongType(),
        T.StructType(
            [T.StructField("isWhale", T.BooleanType()), T.StructField("balance", T.DoubleType())]
        ),
    )
    out = reparse_map(df, "logs", target)
    assert out.schema["logs"].dataType == target  # string keys → long keys
    row = out.collect()[0]
    assert row["logs"][3600]["balance"] == 5.0


def test_is_whale_address(spark):
    transfers = fixtures.transfers_df(spark, n_rows=2000, n_wallets=10)
    meta = fixtures.token_metadata_df(spark)
    tw = wallet_balance_changelogs(transfers, meta, densify=False)
    tw.persist()
    # find a known whale entry to query
    probe = None
    for r in tw.collect():
        for ts, entry in r["balanceChangeLogs"].items():
            if entry["isWhale"]:
                token, wallet = r["_key"].rsplit("_", 1)
                probe = (token, wallet, ts)
                break
        if probe:
            break
    assert probe is not None, "fixture should contain at least one whale"
    token, wallet, ts = probe
    assert is_whale_address(tw, token, wallet, ts - 10, ts + 10)
    assert not is_whale_address(tw, token, "0x" + "f" * 40, 0, 10**12)
