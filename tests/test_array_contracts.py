"""Raw-array contracts for the two queries whose driver-facing form emits
'|'-joined strings (the driver's value hasher cannot hash list cells).

The driver gate proves the scalar rendering; these tests prove the raw
arrays themselves — and that the scalar rendering is lossless (the string
form round-trips to the exact array).
"""

from __future__ import annotations

from token_etl_spark.plans.domain import q_daily_event_types, q_daily_event_types_raw
from token_etl_spark.plans.relational import q_array_ops, q_array_ops_raw


def test_daily_event_types_raw_arrays(spark, sf_dir):
    raw = {r["day_ts"]: r for r in q_daily_event_types_raw(spark, sf_dir).collect()}
    assert raw, "no rows"
    for r in raw.values():
        assert r["types"] == sorted(set(r["types"])), "collect_set not sorted/unique"
        assert r["n_types"] == len(r["types"])


def test_daily_event_types_string_is_lossless(spark, sf_dir):
    raw = {r["day_ts"]: r["types"] for r in q_daily_event_types_raw(spark, sf_dir).collect()}
    rendered = {r["day_ts"]: r["types"] for r in q_daily_event_types(spark, sf_dir).collect()}
    assert rendered.keys() == raw.keys()
    for day_ts, s in rendered.items():
        assert s.split("|") == raw[day_ts]


def test_array_ops_raw_arrays(spark, sf_dir):
    rows = q_array_ops_raw(spark, sf_dir).collect()
    assert rows, "no rows"
    for r in rows:
        assert r["qty_arr"] == sorted(r["qty_arr"])
        assert abs(r["qty_sum"] - sum(r["qty_arr"])) < 1e-9
        assert r["n_big"] == sum(1 for x in r["qty_arr"] if x >= 30.0)
        assert r["doubled"] == [x * 2.0 for x in r["qty_arr"]]


def test_array_ops_string_is_lossless(spark, sf_dir):
    raw = {r["l_orderkey"]: r for r in q_array_ops_raw(spark, sf_dir).collect()}
    rendered = {r["l_orderkey"]: r for r in q_array_ops(spark, sf_dir).collect()}
    assert rendered.keys() == raw.keys()
    for k, r in rendered.items():
        assert [float(x) for x in r["qty_arr"].split("|")] == raw[k]["qty_arr"]
        assert [float(x) for x in r["doubled"].split("|")] == raw[k]["doubled"]
