"""Key-building and vertex-prefix functions (SURVEY §2.10 F1-F3).

The reference implements these as Scala closures registered as UDFs
(Spark.scala:33-54); every one has a native-function replacement, which
keeps the whole expression inside whole-stage codegen (no serde, no
Python boundary):

- F1 ``addCollectionNameToAddress`` (Spark.scala:33-35) → ``concat``.
- F2 ``removeCollectionName`` (Spark.scala:37-44) → ``when`` + ``split``.
- F3 ``createKeyForTransfersCollection`` (Spark.scala:46-54) embeds
  ``System.currentTimeMillis()`` — a wall-clock, non-deterministic key.
  We deliberately deviate: the deterministic form includes the
  transaction hash instead, which is unique per (tx, log_index) and
  reproducible (documented deviation; wall-clock keys are untestable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WALLET_PREFIX = "wallets/"


def add_collection_prefix(col: Column | str, prefix: str = WALLET_PREFIX) -> Column:
    """F1: ``address`` → ``wallets/address`` (native concat)."""
    return F.concat(F.lit(prefix), F.col(col) if isinstance(col, str) else col)


def strip_collection_prefix(col: Column | str) -> Column:
    """F2: ``wallets/address`` → ``address``; identity when unprefixed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.contains("/"), F.element_at(F.split(c, "/"), 2)).otherwise(c)


def transfer_key(
    log_index: Column | str = "log_index",
    block_number: Column | str = "block_number",
    from_addr: Column | str = "_from",
    to_addr: Column | str = "_to",
    tx_hash: Column | str = "transaction_hash",
) -> Column:
    """F3 (deterministic form): ``{log_index}_{block}_{from}_{to}_{txhash}``."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (log_index, block_number, from_addr, to_addr, tx_hash)]
    return F.concat_ws("_", *cols)


def composite_key(*cols: Column | str, sep: str = "_") -> Column:
    """Generic ``{a}_{b}`` key builder (e.g. token_wallets ``_key`` =
    ``{token}_{wallet}``, WalletEnricher.scala:74-77; dapps ``_key`` =
    ``{token}_{idCMC}``, DappEnricher.scala:40)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])
