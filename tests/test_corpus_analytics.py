"""Unit tests for the r8 corpus-analytics operators: text normalization,
duplication-inflation histogram, stratified dedup audit sampling,
cross-source overlap matrix, snapshot diff, vocabulary growth, URL-level
dedup, and the embedding-space outlier screen."""

from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators import curation as C
from token_etl_spark.operators import dedup as D
from token_etl_spark.operators.text import normalize_text


def test_normalize_text_rules_and_changed_flag(spark):
    df = spark.createDataFrame(
        [
            (1, "  Mixed CASE\tand\x07ctrl  chars \x1f here "),
            (2, "already clean"),
            (3, "Tab\there"),
        ],
        ["id", "text"],
    )
    out = {r["id"]: (r["norm_text"], r["changed"]) for r in normalize_text(df).collect()}
    assert out[1] == ("mixed case and ctrl chars here", True)
    assert out[2] == ("already clean", False)
    assert out[3] == ("tab here", True)


def test_dup_inflation_profile_hand_computed(spark):
    # a:3 copies, b:2, c:1, d:1  → hist {3:1, 2:1, 1:2}; total 7
    rows = [(i, t) for i, t in enumerate(["a", "a", "a", "b", "b", "c", "d"])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], round(r["share"], 9))
        for r in D.dup_inflation_profile(df).collect()
    }
    assert out == {
        3: (1, 3, round(3 / 7, 9)),
        2: (1, 2, round(2 / 7, 9)),
        1: (2, 2, round(2 / 7, 9)),
    }


def test_dedup_audit_sample_band_cap_and_determinism(spark):
    # 8 pairs in band 5 (0.5x), 2 in band 9 (cap never binds there)
    rows = [(i, i + 100, 0.5 + i / 1000.0) for i in range(8)] + [
        (50, 51, 0.95),
        (60, 61, 1.0),  # jaccard 1.0 must clamp into band 9, not band 10
    ]
    pairs = spark.createDataFrame(rows, ["id_a", "id_b", "jaccard"])
    out = D.dedup_audit_sample(pairs, k_per_band=3, n_bands=10)
    got = [(r["band"], r["id_a"], r["sample_rank"]) for r in out.collect()]
    by_band: dict = {}
    for band, ia, rk in got:
        by_band.setdefault(band, []).append((rk, ia))
    assert set(by_band) == {5, 9}
    assert len(by_band[5]) == 3 and sorted(rk for rk, _ in by_band[5]) == [1, 2, 3]
    assert len(by_band[9]) == 2
    # deterministic: a second run selects the identical slate
    again = [(r["band"], r["id_a"], r["sample_rank"]) for r in out.collect()]
    assert sorted(got) == sorted(again)


def test_source_overlap_matrix_collapses_orientation(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], ["id_a", "id_b"]
    )
    labels = spark.createDataFrame(
        [(1, "web"), (2, "wiki"), (3, "wiki"), (4, "web"), (5, "web"), (6, "web")],
        ["doc_id", "source"],
    )
    out = {
        (r["source_lo"], r["source_hi"]): r["n_pairs"]
        for r in D.source_overlap_matrix(pairs, labels).collect()
    }
    # (web, wiki) and (wiki, web) collapse; same-source pairs count too
    assert out == {("web", "wiki"): 2, ("web", "web"): 1}


def test_snapshot_diff_all_four_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], ["doc_id", "text"]
    )
    out = {r["id"]: r["status"] for r in C.snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_vocab_growth_hand_computed(spark):
    # bucket 0: docs 0-1, bucket 1: docs 2-3 (bucket_size=2)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "a d d"), (3, "e")],
        ["doc_id", "text"],
    )
    out = {
        r["bucket"]: (r["n_tokens"], r["new_types"], r["vocab_size"])
        for r in C.vocab_growth(docs, bucket_size=2).collect()
    }
    # bucket 0: 4 tokens, types {a,b,c} first here; bucket 1: 4 tokens, {d,e}
    assert out == {0: (4, 3, 3), 1: (4, 2, 5)}


def test_url_dedup_keeps_best_quality_then_smallest_id(spark):
    raw = spark.createDataFrame(
        [
            (1, "HTTP://A.com:80/x", 10),
            (2, "http://a.com/x", 30),   # same canonical, best quality
            (3, "http://a.com/x?utm_s=1", 30),  # quality tie → smaller id wins
            (4, "https://b.com/y", 5),
        ],
        ["doc_id", "url", "q"],
    )
    out = {r["doc_id"]: (r["canon_url"], r["kept"]) for r in
           C.url_dedup(raw, quality_col="q").collect()}
    assert out[1] == ("http://a.com/x", False)
    assert out[2] == ("http://a.com/x", True)
    assert out[3] == ("http://a.com/x", False)
    assert out[4] == ("https://b.com/y", True)


def test_embedding_outliers_flags_far_vector_and_honest_degenerates(spark):
    from token_etl_spark.operators.similarity import embedding_outliers

    # centroid = first vector (1,0); most rows hug it, one points away
    rows = (
        [(0, [1.0, 0.0])]
        + [(i, [1.0, 0.01 * (i % 3)]) for i in range(1, 12)]
        + [(99, [0.0, 1.0])]
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["id"]: (r["is_outlier"], r["z"]) for r in
           embedding_outliers(df, n_centroids=1, threshold=2.0).collect()}
    assert out[99][0] is True and out[99][1] < -2.0
    assert sum(1 for flag, _ in out.values() if flag) == 1
    # a single-member cluster flags nothing (z NULL, outlier False)
    one = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    got = embedding_outliers(one, n_centroids=1).collect()
    assert got[0]["z"] is None and got[0]["is_outlier"] is False


def test_normalize_text_in_place_reports_changed(spark):
    """Review r8: out_col == text_col (in-place) must still flag changed
    rows — the comparison runs before the overwrite."""
    df = spark.createDataFrame([(1, "  UPPER  "), (2, "ok")], ["id", "text"])
    out = {r["id"]: (r["text"], r["changed"]) for r in
           normalize_text(df, out_col="text").collect()}
    assert out[1] == ("upper", True)
    assert out[2] == ("ok", False)


def test_snapshot_diff_null_text_is_presence_not_absence(spark):
    """Review r8: md5(NULL) is NULL — presence must come from the join
    side. NULL text on one side is 'changed'; on both sides 'unchanged'."""
    old = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "y")], "doc_id long, text string"
    )
    got = {r["id"]: r["status"] for r in C.snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "changed"}


def test_dedup_threshold_curve_bands_and_cumsum(spark):
    from token_etl_spark.operators.dedup import dedup_threshold_curve

    pairs = spark.createDataFrame(
        [(1, 2, 0.52), (1, 3, 0.58), (2, 3, 0.74), (4, 5, 0.95), (5, 6, 1.0)],
        "id_a long, id_b long, jaccard double",
    )
    got = {
        r["band_lo"]: (r["n_pairs"], r["n_pairs_at_or_above"])
        for r in dedup_threshold_curve(pairs, step=0.05).collect()
    }
    # 0.52/0.58 -> 0.50 and 0.55; 0.74 -> 0.70; 0.95 -> 0.95; 1.0 -> 1.0
    assert got == {
        1.0: (1, 1),
        0.95: (1, 2),
        0.70: (1, 3),
        0.55: (1, 4),
        0.50: (1, 5),
    }


def test_langid_confusion_row_shares_sum_to_one(spark):
    from token_etl_spark.operators.text import langid_confusion

    df = spark.createDataFrame(
        [
            (1, "en", "the quick fox and the lazy dog"),
            (2, "en", "zzz qqq xxx"),
            (3, "de", "der hund und die katze sind da"),
        ],
        "doc_id long, lang string, text string",
    )
    rows = langid_confusion(df).collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["lang_label"], 0.0)
        by_label[r["lang_label"]] += r["label_share"]
        assert r["n_docs"] >= 1
    assert all(abs(s - 1.0) < 1e-12 for s in by_label.values())
    # the all-consonant doc scores 0 for every language -> 'und'
    assert any(r["lang_label"] == "en" and r["lang_pred"] == "und" for r in rows)


def test_source_centroid_similarity_known_vectors(spark):
    from token_etl_spark.operators.similarity import source_centroid_similarity

    labeled = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]), ("a", [1.0, 0.0]),      # centroid (1, 0)
            ("b", [0.0, 2.0]),                          # centroid (0, 2)
            ("c", [3.0, 3.0]), ("c", [1.0, 1.0]),      # centroid (2, 2)
        ],
        "source string, v array<double>",
    )
    got = {
        (r["source_a"], r["source_b"]): r["cosine_sim"]
        for r in source_centroid_similarity(labeled).collect()
    }
    assert abs(got[("a", "b")] - 0.0) < 1e-12
    assert abs(got[("a", "c")] - 2 / (1 * 8**0.5)) < 1e-12
    assert abs(got[("b", "c")] - 4 / (2 * 8**0.5)) < 1e-12
    assert len(got) == 3
