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


def test_hot_key_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from token_etl_spark.operators.skew import hot_key_join

    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 8, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3.0).alias("w")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    hybrid = hot_key_join(big, small, "k", n_hot=4).groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    p = {(r.k): (r.n, round(r.s, 6)) for r in plain.collect()}
    h = {(r.k): (r.n, round(r.s, 6)) for r in hybrid.collect()}
    assert p == h


def test_hot_key_join_left_keeps_unmatched(spark):
    from pyspark.sql import functions as F

    from token_etl_spark.operators.skew import hot_key_join

    big = spark.range(1000).select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "zero"), (1, "one")], "k long, name string")
    out = hot_key_join(big, small, "k", n_hot=2, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("name").isNull()).count() == big.filter(~F.col("k").isin([0, 1])).count()


def test_hot_key_join_left_keeps_null_keys(spark):
    """NULL big-side keys must survive a left hybrid join: `isin(hot)`
    evaluates to NULL for them, so a naive hot/tail split drops the row
    from BOTH branches. A skewed NULL key also lands in the hot sample —
    it must never poison the tail's NOT-IN filter."""
    from pyspark.sql import functions as F

    from token_etl_spark.operators.skew import hot_key_join

    # 60% NULL keys (NULL is the hottest "key" the sampler sees), the
    # rest split between a hot key and a tail.
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 6, F.lit(None).cast("long"))
        .when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    for how in ("inner", "left"):
        plain = big.join(small, "k", how)
        hybrid = hot_key_join(big, small, "k", n_hot=2, sample_fraction=1.0, how=how)
        assert hybrid.count() == plain.count(), how
        # Counter, not sorted(): None keys are unorderable against ints
        from collections import Counter

        p = Counter((r.k, r.v, r.name) for r in plain.collect())
        h = Counter((r.k, r.v, r.name) for r in hybrid.collect())
        assert p == h, how
    left = hot_key_join(big, small, "k", n_hot=2, sample_fraction=1.0, how="left")
    assert left.filter(F.col("k").isNull()).count() == big.filter(F.col("k").isNull()).count()


def test_skew_profile_ranks_hot_keys(spark):
    """A planted 60/30/10 split must rank k0 > k1 > k2 with exact counts
    and shares; two-phase pre-rank must equal the naive global window
    regardless of bucket count."""
    from token_etl_spark.operators.skew import skew_profile

    rows = [("k0",)] * 60 + [("k1",)] * 30 + [("k2",)] * 10
    df = spark.createDataFrame(rows, ["key"])
    for n_buckets in (1, 4, 64):
        out = skew_profile(df, ["key"], top_k=2, n_buckets=n_buckets).collect()
        assert [(r["rank"], r["key"], r["n"], r["share"]) for r in sorted(out, key=lambda r: r["rank"])] == [
            (1, "k0", 60, 0.6),
            (2, "k1", 30, 0.3),
        ]


def test_skew_profile_deterministic_ties(spark):
    """Equal-count keys order by the key columns, not partition luck."""
    from token_etl_spark.operators.skew import skew_profile

    rows = [("b",), ("a",), ("c",)] * 5
    df = spark.createDataFrame(rows, ["key"]).repartition(8)
    out = skew_profile(df, ["key"], top_k=3).collect()
    assert [r["key"] for r in sorted(out, key=lambda r: r["rank"])] == ["a", "b", "c"]
