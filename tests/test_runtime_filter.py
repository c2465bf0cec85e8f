"""Runtime bloom-filter join pruning: when one join side is selectively
filtered, Catalyst injects a bloom filter built from the filtered side
and applies it to the big side's scan — rows that cannot match are
dropped BEFORE the shuffle. At 100 TB this is the difference between
shuffling the whole fact table and shuffling the ~matching sliver, with
zero query changes.

Local data sits far under the production application-side threshold
(10 GB), so the test lowers the thresholds to make the rewrite visible;
production keeps the defaults (session.py note).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bloom_confs(spark):
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # make the SMJ real
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }
    old = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def test_selective_dim_join_injects_bloom_filter(spark, tmp_path, bloom_confs):
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    spark.range(200_000).selectExpr("id % 10000 AS k", "id AS v").write.parquet(fact_path)
    spark.range(10_000).selectExpr("id AS k", "id % 50 AS grp").write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("grp") == 7)  # 2% of keys
    joined = fact.join(dim, "k")

    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan

    # the rewrite is a pure optimization: results identical with it off
    n_with = joined.count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        n_without = fact.join(dim, "k").count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert n_with == n_without == 4_000  # 200 dim keys × 20 fact rows each
