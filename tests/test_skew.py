from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark, n=5000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_salted_aggregate_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"],): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"],): (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df, ["k"],
            {"s": ("sum", "v"), "n": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    big = _skewed(spark, 2000)
    small = spark.createDataFrame([("hot", 1.5), ("cold", 2.0)], ["k", "w"])
    plain = sorted(map(tuple, big.join(small, "k").select("k", "v", "w").collect()))
    salted = sorted(map(tuple, salted_join(big, small, "k").select("k", "v", "w").collect()))
    assert plain == salted


def test_salted_aggregate_rejects_nonmergeable(spark):
    df = _skewed(spark, 10)
    try:
        salted_aggregate(df, ["k"], {"a": ("avg", "v")})
        raise AssertionError("should have raised")
    except ValueError as e:
        assert "avg" in str(e)
