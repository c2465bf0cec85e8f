"""Dapp enricher — per-dapp interacting-wallet rollup
(reference: src/main/scala/etl/DappEnricher.scala:17-61).

Reference shape: per-token driver loop (AQL scan → endpoint dedup →
registry join → group to dapp rows) folded with reduce(union). Spark-
native: one pass, registry broadcast, union-of-loops replaced by keeping
``contract_address`` as a grouping column (SURVEY §2.7 U2 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from token_etl_spark.functions.keys import composite_key
from token_etl_spark.operators.dapps import match_dapp_endpoints


def enrich_dapps(transfers: DataFrame, dapp_registry: DataFrame) -> DataFrame:
    """transfers + registry → one row per (token, dapp) with the sorted
    interacting-address list, ``_key`` = "{token}_{idCMC}"
    (DappEnricher.scala:40), default image back-fill (:47-48)."""
    matched = match_dapp_endpoints(transfers, dapp_registry)
    rolled = (
        matched.groupBy("contract_address", "idCMC", "name", "image")
        .agg(F.sort_array(F.collect_set("address")).alias("addresses"))
        .withColumn("image", F.coalesce(F.col("image"), F.lit("default.png")))
        .withColumn("_key", composite_key("contract_address", "idCMC"))
    )
    return rolled.select("_key", "idCMC", "name", "image", "addresses", "contract_address")
