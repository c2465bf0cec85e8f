from __future__ import annotations

import datetime as dt

from token_etl_spark.operators.timeseries import grouped_ewma


def _ref_ewma(xs, alpha):
    out = [xs[0]]
    for x in xs[1:]:
        out.append(alpha * x + (1 - alpha) * out[-1])
    return out


def test_grouped_ewma_matches_recurrence(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    series = {1: [10.0, 20.0, 30.0, 40.0], 2: [5.0, 5.0, 50.0]}
    for k, xs in series.items():
        for i, x in enumerate(xs):
            rows.append((k, base + dt.timedelta(hours=i), x))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    got = grouped_ewma(df, ["user_id"], "ts", "value", alpha=0.3)
    by_user = {}
    for r in got.orderBy("user_id", "ts").collect():
        by_user.setdefault(r.user_id, []).append(r.ewma)
    for k, xs in series.items():
        exp = _ref_ewma(xs, 0.3)
        assert all(abs(a - b) < 1e-12 for a, b in zip(by_user[k], exp, strict=True))


def test_grouped_ewma_alpha_one_is_identity(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=i), float(i * i)) for i in range(5)],
        "user_id long, ts timestamp, value double",
    )
    got = grouped_ewma(df, ["user_id"], "ts", "value", alpha=1.0)
    for r in got.collect():
        assert r.ewma == r.value
