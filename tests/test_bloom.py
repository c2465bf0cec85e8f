"""Bloom-filter operators (operators/bloom.py): bitmap structure,
no-false-negative containment vs the exact scan, and the
result-transparency of the prefiltered join."""

from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators import bloom as B
from token_etl_spark.operators.curation import ngram_decontaminate


def test_bitmap_shape_and_membership(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["k"])
    m_bits, k_hashes = 1 << 12, 4
    bf = B.bloom_bitmap(keys, "k", m_bits=m_bits, k_hashes=k_hashes)
    row = bf.collect()
    assert len(row) == 1
    words = row[0]["bf"]
    assert len(words) == m_bits // B.BITS_PER_WORD
    # every word fits 32 bits (sign-safe packing)
    assert all(0 <= w < (1 << 32) for w in words)
    set_bits = sum(bin(w).count("1") for w in words)
    # at most k per key, fewer with collisions; never zero
    assert 0 < set_bits <= 200 * k_hashes

    # no false negatives: every inserted key probes positive
    probe = keys.crossJoin(F.broadcast(bf)).where(
        B.bloom_probe_expr(F.col("k"), F.col("bf"), m_bits, k_hashes)
    )
    assert probe.count() == 200


def test_empty_build_side_rejects_everything(spark):
    keys = spark.createDataFrame([("x",)], ["k"]).where(F.lit(False))
    bf = B.bloom_bitmap(keys, "k", m_bits=1 << 10, k_hashes=4)
    words = bf.collect()[0]["bf"]
    assert words == [0] * (1024 // 32)
    probe = (
        spark.createDataFrame([(f"p{i}",) for i in range(50)], ["k"])
        .crossJoin(F.broadcast(bf))
        .where(B.bloom_probe_expr(F.col("k"), F.col("bf"), 1 << 10, 4))
    )
    assert probe.count() == 0


def test_decontaminate_has_no_false_negatives(spark, sf_dir):
    """The exact scan's flagged set must be a subset of the bloom scan's,
    and bloom counts must dominate exact counts per doc (FPs only add)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in ngram_decontaminate(docs, bench, k=3, min_overlap=2).collect()
    }
    fuzzy = {
        r["doc_id"]: r["n_maybe"]
        for r in B.bloom_decontaminate(docs, bench, k=3, min_overlap=2).collect()
    }
    assert set(exact) <= set(fuzzy)
    assert all(fuzzy[d] >= n for d, n in exact.items())


def test_prefilter_join_is_result_transparent(spark, sf_dir):
    """bloom_prefilter_join ≡ plain inner join, row for row — false
    positives survive the prefilter but die in the exact join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("tp"))
    )
    fast = (
        B.bloom_prefilter_join(orders, cust, "o_custkey", "c_custkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("tp"))
    )
    a = {(r["o_orderpriority"], r["n"], round(r["tp"], 4)) for r in plain.collect()}
    b = {(r["o_orderpriority"], r["n"], round(r["tp"], 4)) for r in fast.collect()}
    assert a == b


def test_prefilter_actually_prunes(spark, sf_dir):
    """The probe must reject a measurable fraction of non-matching left
    rows (here: keys disjoint from the build side — survivors are pure
    false positives, bounded well under the FP formula's headroom)."""
    left = spark.range(0, 20_000).select(
        F.concat(F.lit("L"), F.col("id").cast("string")).alias("k")
    )
    right = spark.range(0, 1_000).select(
        F.concat(F.lit("R"), F.col("id").cast("string")).alias("k")
    )
    bf = B.bloom_bitmap(right, "k", m_bits=1 << 15, k_hashes=4)
    survivors = (
        left.crossJoin(F.broadcast(bf))
        .where(B.bloom_probe_expr(F.col("k"), F.col("bf"), 1 << 15, 4))
        .count()
    )
    # n/m = 1000/32768 -> per-key FP ~ (1-e^-0.122)^4 ~ 1.7e-4
    assert survivors < 20_000 * 0.01


def test_null_keys_dropped_not_crashed(spark):
    """A NULL build key must not poison map_from_entries, and a NULL
    probe key must behave like the exact join (no match) — nulls can
    never equi-match, so dropping them preserves result identity."""
    keys = spark.createDataFrame(
        [("k1",), (None,), ("k2",), (None,)], "k string"
    )
    bf = B.bloom_bitmap(keys, "k", m_bits=1 << 12, k_hashes=4)
    assert len(bf.collect()[0]["bf"]) == (1 << 12) // B.BITS_PER_WORD

    left = spark.createDataFrame(
        [(1, "k1"), (2, None), (3, "zzz")], "id long, k string"
    )
    right = spark.createDataFrame([("k1", 10)], "k string, v long")
    got = {
        (r["id"], r["v"])
        for r in B.bloom_prefilter_join(left, right, "k", "k").select(
            left["id"], "v"
        ).collect()
    }
    plain = {
        (r["id"], r["v"])
        for r in left.join(right, left["k"] == right["k"]).select(
            left["id"], "v"
        ).collect()
    }
    assert got == plain == {(1, 10)}


def test_m_bits_bounds_enforced(spark):
    """m_bits beyond the 24-bit md5-prefix address space, or a
    non-power-of-two size, is a loud error — never a silently worse
    false-positive rate."""
    import pytest

    keys = spark.createDataFrame([("k",)], ["k"])
    with pytest.raises(ValueError, match="2\\^24"):
        B.bloom_bitmap(keys, "k", m_bits=1 << 25)
    with pytest.raises(ValueError, match="power of two"):
        B.bloom_bitmap(keys, "k", m_bits=96)
    with pytest.raises(ValueError, match="multiple"):
        B.bloom_bitmap(keys, "k", m_bits=(1 << 12) + 1)
