from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "completely different content about spark query engines and shuffles"),
    (3, "THE  quick   brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0 after normalize
    (4, "another unrelated document mentioning parquet files and columnar storage"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups_normalized_copies(spark):
    out = exact_dedup(_docs(spark))
    groups = {r["keep_id"]: r["n_copies"] for r in out.collect()}
    assert groups[0] == 2  # docs 0 and 3 collapse
    assert out.count() == 4


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "")], ["doc_id", "text"])
    out = shingles(df, k=3).collect()
    got = {(r["id"], r["shingle"]) for r in out}
    assert (0, "a b") in got  # shorter than k → single truncated shingle
    # empty text yields one empty-ish shingle row; must not crash
    assert all(r["id"] in (0, 1) for r in out)


def test_minhash_finds_planted_near_dup(spark):
    pairs = minhash_dedup(_docs(spark), num_hashes=32, bands=16, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 3) in got  # exact dup also caught
    assert not any({a, b} == {0, 2} for a, b in got)


def test_minhash_agrees_with_exact_jaccard_on_candidates(spark):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dedup(_docs(spark), num_hashes=32, bands=16, threshold=0.5).collect()
    }
    # LSH-verified pairs report the same exact jaccard value
    for pair, j in lsh.items():
        assert abs(exact[pair] - j) < 1e-12


def test_simhash_near_dups_have_close_hashes(spark):
    out = {r["id"]: r["simhash"] for r in simhash(_docs(spark), bits=32).collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert hamming(out[0], out[3]) == 0  # identical token multiset
    assert hamming(out[0], out[1]) < hamming(out[0], out[2])
