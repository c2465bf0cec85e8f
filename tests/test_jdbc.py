"""Live JDBC round-trip (S1/S2) against embedded Derby — the JDBC-able
store that ships inside Spark's own jar directory, so the partitioned
range scan (reference: s/etl/TransferEnricher.scala:36-51 hand-splits
``BETWEEN lo AND hi`` into 8 ranges) executes against a real database
rather than only mirroring the option set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from token_etl_spark.io.sources import read_jdbc_ranged

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo root
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(base))
    url = f"jdbc:derby:{base}/jdbcdb;create=true"
    src = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "T")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_ranged_scan_partitions_and_values(spark, derby_url):
    back = read_jdbc_ranged(
        spark, derby_url, "T", "k", 0, 1000, num_partitions=8,
        properties={"driver": DRIVER},
    )
    # the range split must actually produce 8 JDBC partitions
    assert back.rdd.getNumPartitions() == 8
    got = {r.k: r.v for r in back.collect()}
    assert got == {i: 2 * i for i in range(1000)}


def test_jdbc_filter_pushes_into_source(spark, derby_url):
    back = read_jdbc_ranged(
        spark, derby_url, "T", "k", 0, 1000, num_partitions=8,
        properties={"driver": DRIVER},
    )
    filtered = back.filter(F.col("k") >= 900)
    assert filtered.count() == 100
    # predicate must reach the JDBC scan, not run as a Spark Filter
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:120]
