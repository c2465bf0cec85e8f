from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators.balances import (
    calculate_balance,
    cumulative_balance,
    forward_fill,
    hourly_net_flow,
    signed_endpoint_unpivot,
)

TRANSFERS = [
    # (_from, _to, value, transact_at) — hand-computed fixture
    ("wallets/a", "wallets/b", 10.0, "3600"),
    ("wallets/b", "wallets/a", 4.0, "3700"),   # same hour as above
    ("wallets/a", "wallets/c", 2.0, "7300"),   # next hour
    ("wallets/c", "wallets/c", 9.0, "7400"),   # self-transfer nets to 0
]


def _df(spark):
    return spark.createDataFrame(TRANSFERS, ["_from", "_to", "value", "transact_at"])


def test_signed_unpivot_doubles_rows_and_signs(spark):
    out = signed_endpoint_unpivot(_df(spark))
    assert out.count() == 8
    sums = {
        r["address"]: r["s"]
        for r in out.groupBy("address").agg(F.sum("signed_value").alias("s")).collect()
    }
    # a: -10 +4 -2 = -8 ; b: +10 -4 = 6 ; c: +2 -9 +9 = 2
    assert sums == {"wallets/a": -8.0, "wallets/b": 6.0, "wallets/c": 2.0}


def test_unpivot_agrees_with_union_form(spark):
    # The reference builds the same thing as a union of two projections
    # (BaseEnricher.scala:91-102); both forms must agree (SURVEY §2.7 U1).
    df = _df(spark)
    explode_form = signed_endpoint_unpivot(df).select("address", "signed_value")
    union_form = df.select(
        F.col("_from").alias("address"), (-F.col("value")).alias("signed_value")
    ).union(df.select(F.col("_to").alias("address"), F.col("value").alias("signed_value")))
    assert sorted(map(tuple, explode_form.collect())) == sorted(map(tuple, union_form.collect()))


def test_cumulative_balance_hand_computed(spark):
    balances = calculate_balance(_df(spark))
    got = {(r["address"], r["timestamp"]): r["balance"] for r in balances.collect()}
    assert got == {
        ("wallets/a", 3600): -6.0,   # -10 + 4
        ("wallets/a", 7200): -8.0,   # cumulative
        ("wallets/b", 3600): 6.0,
        ("wallets/c", 7200): 2.0,    # +2 (self-transfer nets out)
    }


def test_with_prev_balance_lag(spark):
    from token_etl_spark.operators.balances import with_prev_balance

    balances = calculate_balance(_df(spark))
    got = {
        (r["address"], r["timestamp"]): r["pre_balance"]
        for r in with_prev_balance(balances).collect()
    }
    assert got[("wallets/a", 3600)] is None      # first observation → no prev
    assert got[("wallets/a", 7200)] == -6.0      # prev hour's balance


def test_forward_fill_matches_crossjoin_reference(spark):
    # Engine's window forward-fill must equal the reference's
    # crossJoin + left-outer densification (WalletEnricher.scala:27-37).
    sparse = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 3, 30.0), ("b", 2, 5.0)], ["k", "ts", "v"]
    )
    filled = forward_fill(sparse, "k", "ts", "v")
    got = {(r["k"], r["ts"]): r["v"] for r in filled.collect()}
    assert got == {
        ("a", 1): 10.0, ("a", 2): 10.0, ("a", 3): 30.0,
        ("b", 1): None, ("b", 2): 5.0, ("b", 3): 5.0,
    }


def test_hourly_net_flow_zero_value_and_gap(spark):
    df = spark.createDataFrame(
        [("wallets/a", "wallets/b", 0.0, "3600"), ("wallets/a", "wallets/b", 1.0, "10900")],
        ["_from", "_to", "value", "transact_at"],
    )
    out = hourly_net_flow(
        signed_endpoint_unpivot(df.withColumn("transact_at_sec", F.col("transact_at").cast("long")))
    )
    hours = sorted({r["timestamp"] for r in out.collect()})
    assert hours == [3600, 10800]  # hour 7200 absent (gap preserved, no fill here)
