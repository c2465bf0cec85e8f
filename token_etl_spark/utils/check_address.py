"""Driver-level predicate helpers (SURVEY §2.10 F6).

The reference wraps full DataFrame reads + filters inside functions that
are ALSO registered as UDFs (CheckAddress.scala:15-60,62-73,
BaseEnricher.scala:24-25) — invoking them on executors would deadlock
(nested Spark actions). Here they are plain driver-side helpers built on
joins/filters, never registered as UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reparse_map(df: DataFrame, col: str, schema) -> DataFrame:
    """Dynamic map re-parse: ``from_json(to_json(col), schema)`` — the
    reference's trick for re-typing a loosely-typed document column at
    read time (CheckAddress.scala:38-46, which uses STRING map keys —
    JSON object keys are always strings). When the target key type is
    non-string, the keys are cast natively after the parse
    (``transform_keys``), since from_json itself only accepts string
    keys.
    """
    from pyspark.sql import types as T

    if isinstance(schema, T.MapType) and not isinstance(schema.keyType, T.StringType):
        parse_schema = T.MapType(T.StringType(), schema.valueType, schema.valueContainsNull)
        parsed = F.from_json(F.to_json(F.col(col)), parse_schema)
        key_type = schema.keyType.simpleString()
        retyped = F.transform_keys(parsed, lambda k, _: k.cast(key_type))
        return df.withColumn(col, retyped)
    return df.withColumn(col, F.from_json(F.to_json(F.col(col)), schema))


def is_dapp_address(dapps: DataFrame, address: str) -> bool:
    """True when ``address`` appears in any dapp's address array
    (CheckAddress.scala:15-31 semantics: array_contains filter)."""
    return (
        dapps.filter(F.array_contains(F.col("address"), address)).limit(1).count() > 0
    )


def is_whale_address(
    token_wallets: DataFrame,
    token: str,
    wallet: str,
    start_ts: int,
    end_ts: int,
) -> bool:
    """True when the wallet's balance changelog shows a whale flag inside
    [start_ts, end_ts] (CheckAddress.scala:33-60: key lookup → explode
    changelog map → range filter → any isWhale)."""
    key = f"{token}_{wallet}"
    hits = (
        token_wallets.filter(F.col("_key") == key)
        .select(F.explode("balanceChangeLogs").alias("ts", "entry"))
        .filter(F.col("ts").cast("long").between(start_ts, end_ts))
        .filter(F.col("entry.isWhale"))
        .limit(1)
        .count()
    )
    return hits > 0
