"""SparkSession factory.

Replaces the reference's hand-rolled session builder
(reference: src/main/scala/common/Spark.scala:13-19 — local[8], fixed
executor conf) with a factory tuned for correctness-reproducibility
(UTC, ANSI off) and scale (AQE, skew-join handling, Arrow).

On a real cluster the same conf applies; only ``master`` changes. The
shuffle-partition count is sized for the local test box via env var and
would be raised (or left to AQE coalescing) at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "token_etl_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession with engine-canonical settings.

    Canonical settings that affect query *semantics* (and therefore the
    DuckDB-oracle hash match):
      - session time zone pinned to UTC (all time bucketing is integer
        arithmetic on unix seconds; see functions/timeops.py),
      - ANSI mode left at Spark default so double arithmetic matches the
        reference's permissive casts.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The driver's testdata parquet stores timestamps as INT64
        # TIMESTAMP(NANOS) which vanilla Spark rejects; read them as long
        # nanos and convert in io.sources.load_table (exact integer math).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Testdata timestamps are TIMESTAMP(MICROS) without UTC adjustment;
        # read them as TIMESTAMP (LTZ, session tz = UTC) rather than NTZ so
        # event-time streaming ops accept them (values identical under UTC).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Changelog maps resolve duplicate timestamp keys by last writer
        # (reference behavior on Spark 3.4; entries are pre-sorted so the
        # winner is deterministic — functions/timeops.py).
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
