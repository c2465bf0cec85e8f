"""Shared plumbing for the declared query set.

Each query exists twice: a PySpark plan (the engine) and an ANSI-SQL
string DuckDB runs over the same parquet (the oracle). The driver
compares row-count + schema + order-insensitive value-hash, so every
computed column is aliased identically on both sides, aggregate integer
types are pinned to BIGINT, and all time bucketing uses the canonical
truncating form (FIXTURES.md "Canonicalization rules"):

    spark : ((unix_timestamp(ts) div W) * W)           → LongType
    duckdb: CAST(floor(epoch(ts)/W)*W AS BIGINT)

(unix_timestamp truncates sub-seconds; floor(epoch) does the same for
positive times — and all test times are positive.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from token_etl_spark.io.sources import load_table

#: DuckDB SQL fragment: hour-bucket start in unix seconds.
SQL_HOUR = "CAST(floor(epoch({ts})/3600)*3600 AS BIGINT)"
#: DuckDB SQL fragment: day-bucket start in unix seconds.
SQL_DAY = "CAST(floor(epoch({ts})/86400)*86400 AS BIGINT)"


@dataclass
class QuerySpec:
    """One declared query: Spark plan + optional DuckDB oracle."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py's headline set


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
