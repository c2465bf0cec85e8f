from __future__ import annotations

from token_etl_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 200), (3, "u", 50), (4, "v", 100)],
        "event_id long, user string, ts long",
    )
    right = spark.createDataFrame(
        [("u", 90, "r90"), ("u", 150, "r150"), ("w", 10, "rw")],
        "user string, rts long, tag string",
    )
    return left, right


def test_asof_backward_join(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user", left_ts="ts", right_ts="rts",
                    right_payload=["rts", "tag"])
    got = {r["event_id"]: (r["rts"], r["tag"]) for r in out.collect()}
    assert got[1] == (90, "r90")     # latest rts <= 100
    assert got[2] == (150, "r150")   # latest rts <= 200
    assert got[3] == (None, None)    # no right row at/before 50
    assert got[4] == (None, None)    # user v has no right rows
    assert len(got) == 4             # all left rows preserved


def test_asof_equal_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, "u", 100)], "event_id long, user string, ts long")
    right = spark.createDataFrame([("u", 100, "exact")], "user string, rts long, tag string")
    incl = asof_join(left, right, "user", "ts", "rts", ["tag"]).collect()[0]
    assert incl["tag"] == "exact"  # <= semantics by default
    strict = asof_join(left, right, "user", "ts", "rts", ["tag"], strict=True).collect()[0]
    assert strict["tag"] is None   # < semantics when strict
