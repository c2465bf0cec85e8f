"""Deterministic domain fixtures (FIXTURES.md §A).

Synthetic token-transfer data matching the reference's declared schemas
(Arango.scala:16-54), with every edge case FIXTURES.md requires:
duplicate (block, log_index) across transactions, self-transfers, zero
values, sender-only / receiver-only addresses, duplicate ``transact_at``
per address (map-key collision), empty hour gaps, whale outliers, and a
dapp-contract overlap address. Seeded numpy → reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from token_etl_spark import schemas
from token_etl_spark.functions.keys import WALLET_PREFIX

START_TS = 1_681_931_734  # unix 2023-04-19 (Time.scala:14-18)
TOKENS = [
    ("0x" + "aa" * 20, "VALAS", 0.0005, 1_000_000.0),
    ("0x" + "bb" * 20, "VENUS", 0.005, 500_000.0),
    ("0x" + "cc" * 20, "CAKE", 0.003, 2_000_000.0),
]
DAPP_OVERLAP_ADDRESS = "0x" + "dd" * 20


def _addr(i: int) -> str:
    return "0x" + f"{i:040x}"


def make_transfers_pdf(n_rows: int = 10_000, n_wallets: int = 40, seed: int = 42) -> pd.DataFrame:
    """A2 ``transfers`` edge rows over a 14-day window."""
    rng = np.random.RandomState(seed)
    wallets = [_addr(i + 1) for i in range(n_wallets)] + [DAPP_OVERLAP_ADDRESS]
    rows = []
    block0 = 27_479_303
    for i in range(n_rows):
        contract = TOKENS[int(rng.randint(0, len(TOKENS)))][0]
        src = wallets[int(rng.randint(0, len(wallets)))]
        # receiver-only address: wallet 0 never sends; sender-only: wallet 1 never receives
        dst = wallets[int(rng.randint(0, len(wallets)))]
        if src == _addr(1 + 0):
            src = wallets[2 + int(rng.randint(0, len(wallets) - 2))]
        if dst == _addr(1 + 1):
            dst = wallets[2 + int(rng.randint(0, len(wallets) - 2))]
        if i % 997 == 0:
            dst = src  # self-transfer
        value = float(np.round(rng.exponential(100.0), 6))
        if i % 503 == 0:
            value = 0.0
        if i % 2111 == 0:
            value = 5_000.0  # whale-scale outlier (≥ threshold × supply for VALAS)
        # hour gap: skip hour 5 of each day
        ts = START_TS + int(rng.randint(0, 14 * 86400))
        if (ts % 86400) // 3600 == 5:
            ts += 3600
        if i % 701 == 0 and rows:
            ts = int(rows[-1]["transact_at"])  # duplicate timestamp collision
        block = block0 + (ts - START_TS) // 3
        log_index = int(rng.randint(0, 300))
        tx_hash = "0x" + f"{rng.randint(0, 2**31):062x}"
        rows.append(
            {
                "_key": f"{log_index}_{block}_{WALLET_PREFIX}{src}_{WALLET_PREFIX}{dst}_{tx_hash}",
                "_from": WALLET_PREFIX + src,
                "_to": WALLET_PREFIX + dst,
                "contract_address": contract,
                "transaction_hash": tx_hash,
                "log_index": log_index,
                "block_number": int(block),
                "value": value,
                "transact_at": str(ts),
            }
        )
    return pd.DataFrame(rows)


def make_raw_transfer_events_pdf(n_rows: int = 5_000, seed: int = 43) -> pd.DataFrame:
    """A1 Postgres-source shape (pre-enrichment)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        block = 27_479_303 + int(rng.randint(0, 20_000))
        if block % 13 == 0:  # gaps: some blocks never appear
            block += 1
        rows.append(
            {
                "contract_address": TOKENS[int(rng.randint(0, len(TOKENS)))][0],
                "transaction_hash": "0x" + f"{rng.randint(0, 2**31):062x}",
                "log_index": int(rng.randint(0, 300)),
                "block_number": block,
                "from_address": _addr(1 + int(rng.randint(0, 40))),
                "to_address": _addr(1 + int(rng.randint(0, 40))),
                "value": float(np.round(rng.exponential(100.0), 6)),
            }
        )
    # duplicate (block_number, log_index) across different transactions
    if len(rows) >= 2:
        rows[1]["block_number"] = rows[0]["block_number"]
        rows[1]["log_index"] = rows[0]["log_index"]
    return pd.DataFrame(rows)


def make_block_timestamps_pdf(raw: pd.DataFrame) -> pd.DataFrame:
    """A3 dimension: one row per block (minus one absent block → null path)."""
    blocks = sorted(raw["block_number"].unique())
    pdf = pd.DataFrame(
        {
            "block_number": blocks,
            "timestamp": [START_TS + (b - 27_479_303) * 3 for b in blocks],
        }
    )
    return pdf.iloc[1:]  # drop one block → tests the null-timestamp path


def make_token_metadata_pdf() -> pd.DataFrame:
    """A5 dimension replacing Coingecko REST (Coingecko.scala:8-55)."""
    return pd.DataFrame(
        [
            {
                "contract_address": addr,
                "name": sym.title(),
                "symbol": sym,
                "decimals": "18",
                "logo": f"https://img.example/{sym}.png",
                "total_supply": 1_000_000,
                "max_supply": 2_000_000,
                "circulating_supply": supply,
                "whale_threshold": thr,
            }
            for addr, sym, thr, supply in TOKENS
        ]
    )


def make_dapp_registry_pdf() -> pd.DataFrame:
    """A4 dapp registry: ≥1 multi-address dapp, ≥1 null image, ≥1 miss."""
    return pd.DataFrame(
        [
            {"_id": "dapp-swap", "name": "SwapX", "image": "swap.png",
             "contract_addresses": [DAPP_OVERLAP_ADDRESS, _addr(2)]},
            {"_id": "dapp-lend", "name": "LendY", "image": None,
             "contract_addresses": [_addr(3)]},
            {"_id": "dapp-miss", "name": "NeverSeen", "image": "x.png",
             "contract_addresses": ["0x" + "ee" * 20]},
        ]
    )


def transfers_df(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(make_transfers_pdf(**kw), schema=schemas.TRANSFERS)


def raw_transfer_events_df(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(make_raw_transfer_events_pdf(**kw), schema=schemas.RAW_TRANSFER_EVENT)


def block_timestamps_df(spark: SparkSession, raw: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(make_block_timestamps_pdf(raw), schema=schemas.BLOCK_TIMESTAMPS)


def token_metadata_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(make_token_metadata_pdf(), schema=schemas.TOKEN_METADATA)


def dapp_registry_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(make_dapp_registry_pdf(), schema=schemas.DAPP_REGISTRY)
