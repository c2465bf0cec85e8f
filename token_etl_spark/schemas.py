"""Central schema registry.

Direct analog of the reference's StructType literals for its four ArangoDB
collections (reference: src/main/scala/databases/Arango.scala:16-54), plus
the driver's TPC-H-ish test tables (TESTDATA.md / FIXTURES.md §B) and the
dimension tables that replace the reference's per-row REST/RPC lookups
(Coingecko.scala:8-55, Web3.scala:39-76).

All domain time is unix **seconds**. The reference stores ``transact_at``
as a *string* (Arango.scala:37, cast at use sites BaseEnricher.scala:34-36);
we keep that string-typed edge column for fidelity and cast once on read.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Domain collections (reference parity)
# ---------------------------------------------------------------------------

#: tokens collection — Arango.scala:16-25 (metadata from Coingecko).
TOKENS = T.StructType(
    [
        T.StructField("_key", T.StringType(), False),  # contract_address
        T.StructField("name", T.StringType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("decimals", T.StringType(), True),
        T.StructField("logo", T.StringType(), True),
        T.StructField("total_supply", T.IntegerType(), True),
        T.StructField("max_supply", T.IntegerType(), True),
        T.StructField("circulating_supply", T.DoubleType(), True),
    ]
)

#: transfers edge collection — Arango.scala:27-39. `_from`/`_to` carry the
#: "wallets/" vertex prefix (Spark.scala:33-35).
TRANSFERS = T.StructType(
    [
        T.StructField("_key", T.StringType(), False),
        T.StructField("_from", T.StringType(), False),
        T.StructField("_to", T.StringType(), False),
        T.StructField("contract_address", T.StringType(), False),
        T.StructField("transaction_hash", T.StringType(), False),
        T.StructField("log_index", T.IntegerType(), False),
        T.StructField("block_number", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("transact_at", T.StringType(), False),  # stringified unix secs
    ]
)

#: wallets vertex collection — Arango.scala:41-46.
WALLETS = T.StructType(
    [
        T.StructField("_key", T.StringType(), False),  # address
        T.StructField("address", T.StringType(), False),
    ]
)

#: dapps collection — Arango.scala:48-54.
DAPPS = T.StructType(
    [
        T.StructField("_key", T.StringType(), False),  # "{token}_{idCMC}"
        T.StructField("idCMC", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("image", T.StringType(), True),
        T.StructField("address", T.ArrayType(T.StringType()), False),
    ]
)

#: token_wallets balance-changelog documents — WalletEnricher.scala:74-79,
#: value shape from CheckAddress.scala:38-46.
TOKEN_WALLETS = T.StructType(
    [
        T.StructField("_key", T.StringType(), False),  # "{token}_{wallet}"
        T.StructField("address", T.StringType(), False),
        T.StructField(
            "balanceChangeLogs",
            T.MapType(
                T.LongType(),
                T.StructType(
                    [
                        T.StructField("isWhale", T.BooleanType(), True),
                        T.StructField("balance", T.DoubleType(), True),
                    ]
                ),
            ),
            False,
        ),
    ]
)

# ---------------------------------------------------------------------------
# Source-shape / dimension tables (replacing JDBC source + REST/RPC lookups)
# ---------------------------------------------------------------------------

#: Postgres-source shape consumed at TransferEnricher.scala:53-79.
RAW_TRANSFER_EVENT = T.StructType(
    [
        T.StructField("contract_address", T.StringType(), False),
        T.StructField("transaction_hash", T.StringType(), False),
        T.StructField("log_index", T.IntegerType(), False),
        T.StructField("block_number", T.IntegerType(), False),
        T.StructField("from_address", T.StringType(), False),
        T.StructField("to_address", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

#: block_number → timestamp dimension replacing the Web3 RPC UDF
#: (Web3.scala:54-76 with its per-JVM memo cache ≡ dedup on block_number).
BLOCK_TIMESTAMPS = T.StructType(
    [
        T.StructField("block_number", T.IntegerType(), False),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

#: token metadata dimension replacing the Coingecko REST getters
#: (Coingecko.scala:8-55) + per-token whale thresholds (Common.scala:4-10).
TOKEN_METADATA = T.StructType(
    [
        T.StructField("contract_address", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("decimals", T.StringType(), False),
        T.StructField("logo", T.StringType(), False),
        T.StructField("total_supply", T.IntegerType(), True),
        T.StructField("max_supply", T.IntegerType(), True),
        T.StructField("circulating_supply", T.DoubleType(), False),
        T.StructField("whale_threshold", T.DoubleType(), False),
    ]
)

#: dapp registry JSON side-file shape (DappEnricher.scala:29-31,
#: Extract0x38Dapp.scala:28-34).
DAPP_REGISTRY = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("image", T.StringType(), True),
        T.StructField("contract_addresses", T.ArrayType(T.StringType()), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver test tables (TESTDATA.md; schema reference only — parquet is
# self-describing, these exist for validation & documentation)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
