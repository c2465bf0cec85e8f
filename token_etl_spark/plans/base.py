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


def fan_narrow(df: DataFrame, key: str | None = None) -> DataFrame:
    """Scale-adaptive fan-out of a narrow-split source (guide §2.2): hash-
    repartition to the session's default parallelism when — and only
    when — the input carries fewer splits. A 100 TB read arrives with
    thousands of splits and this is a NO-OP (no exchange in the plan);
    the local testdata tables are single-row-group parquet files whose
    scan cannot split, so without this every per-row tier (regex chains,
    shingling, hashing, vector folds) of a query runs single-task while
    31 cores idle. Partitioning is by ``key`` (default: first column),
    so results are invariant — every consumer aggregates, joins, or
    windows on explicit keys.

    PRECONDITION (job-free plan build): the input must be shuffle-free
    above its scan — a bare ``load_table`` read plus narrow
    projections/filters. The split probe ``df.rdd.getNumPartitions()``
    launches no job only for such frames; under AQE, calling it on a
    frame with a pending upstream shuffle (including an earlier
    ``fan_narrow``'s own exchange) MATERIALIZES that shuffle's map
    stage — a job at plan-build time, breaking the no-jobs-at-build
    gate. Callers on already-eager paths (e.g. ``prepare_corpus``,
    which runs jobs at build regardless) may ignore this; declared
    job-free plans must not (pinned for the scan case by
    tests/test_plan_hygiene.py)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key or df.columns[0])
