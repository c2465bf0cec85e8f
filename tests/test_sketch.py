"""Count-min sketch: upper-bound guarantee, mergeability, and
build-path equivalence (occurrence stream vs pre-aggregated counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators.sketch import countmin_estimate, countmin_table

DEPTH, WIDTH = 4, 8  # deliberately tiny so collisions occur


def _occurrences(spark):
    rows = (
        [("alpha",)] * 12
        + [("beta",)] * 7
        + [("gamma",)] * 5
        + [("delta",)] * 2
        + [(w,) for w in ("e1", "e2", "e3", "e4", "e5", "e6")]
    )
    return spark.createDataFrame(rows, "token string")


def test_estimate_is_upper_bound_on_truth(spark):
    occ = _occurrences(spark)
    truth = occ.groupBy("token").agg(F.count("*").alias("n"))
    cms = countmin_table(occ, depth=DEPTH, width=WIDTH)
    est = countmin_estimate(truth, cms, depth=DEPTH, width=WIDTH)
    rows = est.collect()
    assert len(rows) == 10
    assert all(r.est_n >= r.n for r in rows)
    # tiny width ⇒ at least one real collision, or the test is vacuous
    assert any(r.est_n > r.n for r in rows)


def test_table_is_sketch_sized(spark):
    cms = countmin_table(_occurrences(spark), depth=DEPTH, width=WIDTH)
    rows = cms.collect()
    assert len(rows) <= DEPTH * WIDTH
    assert {r.row for r in rows} <= set(range(DEPTH))
    assert all(0 <= r.bucket < WIDTH for r in rows)
    # total mass per hash row equals the stream length
    per_row = cms.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert all(r.m == 32 for r in per_row)


def test_merge_equals_single_build(spark):
    """Cell-wise addition of two partial sketches equals the sketch of
    the concatenated stream — the property that lets every partition/
    day/source sketch independently."""
    occ = _occurrences(spark)
    a = occ.limit(20)
    b = occ.exceptAll(a)
    sa = countmin_table(a, depth=DEPTH, width=WIDTH)
    sb = countmin_table(b, depth=DEPTH, width=WIDTH)
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = countmin_table(occ, depth=DEPTH, width=WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_weighted_build_equals_occurrence_build(spark):
    occ = _occurrences(spark)
    counts = occ.groupBy("token").agg(F.count("*").alias("n"))
    from_occ = countmin_table(occ, depth=DEPTH, width=WIDTH)
    from_counts = countmin_table(
        counts, weight_col="n", depth=DEPTH, width=WIDTH
    )
    assert sorted(map(tuple, from_occ.collect())) == sorted(
        map(tuple, from_counts.collect())
    )
