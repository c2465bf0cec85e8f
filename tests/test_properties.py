"""Property-based tests (hypothesis) for the determinism-critical kernels."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from token_etl_spark.operators.balances import forward_fill
from token_etl_spark.functions.timeops import HOUR, bucket

# Spark jobs per example are expensive — keep example counts small but
# meaningful; shrinking still works.
FAST = settings(max_examples=8, deadline=None)

_spark = None


def _get(sparksession):
    global _spark
    _spark = sparksession
    return _spark


@given(
    ts=st.lists(st.integers(min_value=0, max_value=10**10), min_size=1, max_size=30)
)
@FAST
def test_bucket_idempotent_and_bounded(spark, ts):
    df = _get(spark).createDataFrame([(x,) for x in ts], ["ts"])
    rows = df.select(
        F.col("ts"), bucket(F.col("ts"), HOUR).alias("b")
    ).collect()
    for r in rows:
        assert r["b"] % HOUR == 0
        assert r["b"] <= r["ts"] < r["b"] + HOUR


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
@FAST
def test_forward_fill_equals_crossjoin_reference(spark, data):
    # engine form (window fill) ≡ reference form (crossJoin + left-outer
    # + per-cell lookup of the latest value at-or-before ts)
    s = _get(spark)
    # dedup (k, ts) — both forms assume one observation per key/ts
    seen = {}
    for k, ts, v in data:
        seen[(k, ts)] = v
    rows = [(k, ts, v) for (k, ts), v in seen.items()]
    df = s.createDataFrame(rows, "k string, ts long, v double")

    got = {
        (r["k"], r["ts"]): r["v"] for r in forward_fill(df, "k", "ts", "v").collect()
    }

    keys = sorted({k for k, _, _ in rows})
    tss = sorted({ts for _, ts, _ in rows})
    exp = {}
    for k in keys:
        obs = sorted((ts, v) for kk, ts, v in rows if kk == k)
        for ts in tss:
            prior = [v for t0, v in obs if t0 <= ts]
            exp[(k, ts)] = prior[-1] if prior else None
    assert got == exp


@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.floats(min_value=-10, max_value=10, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
@FAST
def test_collapse_map_keys_are_distinct_ts(spark, vals):
    from token_etl_spark.functions.timeops import collapse_to_map

    s = _get(spark)
    df = s.createDataFrame(vals, "ts long, v double")
    m = collapse_to_map(df, "ts", "v", "m").collect()[0]["m"]
    assert set(m) == {ts for ts, _ in vals}
