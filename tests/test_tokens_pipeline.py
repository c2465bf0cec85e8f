from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from token_etl_spark import fixtures
from token_etl_spark.pipelines.tokens import enhance_tokens


@pytest.fixture(scope="module")
def token_docs(spark):
    transfers = fixtures.transfers_df(spark, n_rows=1500, n_wallets=15)
    meta = fixtures.token_metadata_df(spark)
    registry = fixtures.dapp_registry_df(spark)
    out = enhance_tokens(transfers, meta, registry).collect()
    return {r["contract_address"]: r for r in out}


def test_one_document_per_token(token_docs):
    assert set(token_docs) == {t[0] for t in fixtures.TOKENS}


def test_changelog_consistency(token_docs):
    for addr, row in token_docs.items():
        tx = row["txChanges"]
        vol = row["tradingVolumeChanges"]
        uniq = row["uniqueAddressChanges"]
        assert set(tx) == set(vol) == set(uniq)  # same hourly buckets
        assert all(v >= 1 for v in tx.values())
        # unique wallets per hour can't exceed 2× transfer count
        assert all(uniq[ts] <= 2 * tx[ts] for ts in tx)


def test_avg_tx_per_day_quirk(token_docs):
    for row in token_docs.values():
        avg = row["avgTransactionPerDayChanges"]
        # every value is day_count/24 → value*24 is a whole number
        assert all(abs(v * 24 - round(v * 24)) < 1e-9 for v in avg.values())


def test_metadata_joined(token_docs):
    syms = {r["symbol"] for r in token_docs.values()}
    assert syms == {"VALAS", "VENUS", "CAKE"}


def test_holder_counts_bounded_by_wallets(token_docs):
    for row in token_docs.values():
        assert all(0 <= v <= 16 for v in row["holderChanges"].values())
        assert all(v >= 0 for v in row["whaleChanges"].values())
