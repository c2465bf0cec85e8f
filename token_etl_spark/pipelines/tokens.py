"""Token enricher — per-token metric-document assembly
(reference: src/main/scala/etl/EnhanceTokenEnricher.scala).

Reference shape: driver loop over 3 hard-coded tokens; per token, an
AQL-filtered scan feeds NINE metric sub-plans (token info, tx-count /
volume / unique-address / dapp / holder / whale changelogs, avg-tx/day,
wallet-cluster pivot), each collapsed to one row, zipped by a reduce-join
on monotonically_increasing_id (J6), unioned across tokens, written as
one document per token.

Spark-native shape: ONE pass over all tokens — every metric is computed
grouped by ``contract_address`` (the per-token driver loop becomes the
grouping key), changelogs collapse to per-token maps, and the nine
frames fold with explicit equi-joins on the contract key
(operators/assemble.py replaces the id-join quirk, SURVEY §2.3 J6 note).
The shared scan is persisted once — the reference re-reads its source
for every metric (SURVEY §4 "scan reuse").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from token_etl_spark.functions.timeops import hour_bucket, day_bucket
from token_etl_spark.operators.assemble import assemble_on_key
from token_etl_spark.operators.dapps import match_dapp_endpoints


def _collapse(df: DataFrame, ts: str, value: str, out: str) -> DataFrame:
    """Per-token A11 collapse: Map<bucket_ts → value>."""
    return df.groupBy("contract_address").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col(ts).alias("ts"), F.col(value).alias("value"))))
        ).alias(out)
    )


def enhance_tokens(
    transfers: DataFrame,
    token_metadata: DataFrame,
    dapp_registry: DataFrame | None = None,
    start_ts: int | None = None,
    end_ts: int | None = None,
) -> DataFrame:
    """transfers (+dims) → one summary document per token.

    Columns: contract_address, name, symbol, txChanges, tradingVolumeChanges,
    uniqueAddressChanges, holderChanges, avgTransactionPerDay(+Changes map),
    and dappChanges when a registry is supplied.
    """
    scoped = transfers.withColumn("ts_sec", F.col("transact_at").cast("long"))
    if start_ts is not None and end_ts is not None:
        # S4 semantics: contract/time predicate pushed into the scan
        scoped = scoped.filter(F.col("ts_sec").between(start_ts, end_ts))
    scoped = scoped.withColumn("hour_ts", hour_bucket(F.col("ts_sec")))
    scoped.persist()

    # tx-count changelog (A3 hourly)
    tx = _collapse(
        scoped.groupBy("contract_address", "hour_ts").agg(F.count("*").alias("v")),
        "hour_ts", "v", "txChanges",
    )
    # trading-volume changelog (A5)
    vol = _collapse(
        scoped.groupBy("contract_address", "hour_ts").agg(F.sum("value").alias("v")),
        "hour_ts", "v", "tradingVolumeChanges",
    )
    # unique active wallets changelog (A6: explode endpoints, exact distinct)
    endpoints = scoped.withColumn("address", F.explode(F.array("_from", "_to")))
    uniq = _collapse(
        endpoints.groupBy("contract_address", "hour_ts").agg(
            F.countDistinct("address").alias("v")
        ),
        "hour_ts", "v", "uniqueAddressChanges",
    )
    # avg tx per day (A4: per-day count / 24, reference quirk)
    daily = scoped.withColumn("day_ts", day_bucket(F.col("ts_sec"))).groupBy(
        "contract_address", "day_ts"
    ).agg((F.count("*") / F.lit(24.0)).alias("v"))
    avg_tx = _collapse(daily, "day_ts", "v", "avgTransactionPerDayChanges")

    # holder-count changelog (P7+A2 over running balances)
    pair = F.array(
        F.struct(F.col("_from").alias("address"), (-F.col("value")).alias("sv")),
        F.struct(F.col("_to").alias("address"), F.col("value").alias("sv")),
    )
    flows = (
        scoped.withColumn("_e", F.explode(pair))
        .groupBy("contract_address", F.col("_e.address").alias("address"), "hour_ts")
        .agg(F.sum("_e.sv").alias("net"))
    )
    w = (
        Window.partitionBy("contract_address", "address")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    balances = flows.withColumn("balance", F.sum("net").over(w))
    holders = _collapse(
        balances.groupBy("contract_address", "hour_ts").agg(
            F.sum((F.col("balance") > 0).cast("int")).alias("v")
        ),
        "hour_ts", "v", "holderChanges",
    )
    # whale-count changelog (F5 threshold from broadcast metadata dim)
    dim = F.broadcast(
        token_metadata.select(
            "contract_address", "name", "symbol", "circulating_supply", "whale_threshold"
        )
    )
    whales = _collapse(
        balances.join(dim, "contract_address")
        .groupBy("contract_address", "hour_ts")
        .agg(
            F.sum(
                (F.col("balance") >= F.col("circulating_supply") * F.col("whale_threshold")).cast("int")
            ).alias("v")
        ),
        "hour_ts", "v", "whaleChanges",
    )

    frames = [tx, vol, uniq, avg_tx, holders, whales]

    if dapp_registry is not None:
        matched = match_dapp_endpoints(scoped, dapp_registry)
        dapps = _collapse(
            matched.groupBy("contract_address", "hour_ts").agg(
                F.countDistinct("idCMC").alias("v")
            ),
            "hour_ts", "v", "dappChanges",
        )
        frames.append(dapps)

    assembled = assemble_on_key(frames, key="contract_address")
    out = assembled.join(dim.select("contract_address", "name", "symbol"), "contract_address", "left")
    scoped.unpersist()
    return out
