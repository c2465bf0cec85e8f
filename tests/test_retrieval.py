"""BM25 top-k (operators/retrieval.py): hand-computed scores on a tiny
corpus, idf/tf/length-normalization monotonicity, and rank determinism
on exact-duplicate documents."""

from __future__ import annotations

import pytest

from token_etl_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk


def _py_bm25(tf, df, dl, n_docs, avgdl, k1=BM25_K1, b=BM25_B):
    idf = ((n_docs - df) + 0.5) / (df + 0.5)
    den = tf + k1 * ((1.0 - b) + b * dl / avgdl)
    return idf * ((tf * (k1 + 1.0)) / den)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(rows)], ["doc_id", "text"]
    )


def test_scores_match_python_reference(spark):
    docs = _corpus(
        spark,
        [
            "red fox jumps",            # doc0: fox
            "red red dog sleeps here",  # doc1: no fox
            "fox fox fox den",          # doc2: fox tf=3
        ],
    )
    queries = spark.createDataFrame([("q", "fox red")], ["query_id", "query_text"])
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, queries, k=10).collect()}
    n, avgdl = 3, (3 + 5 + 4) / 3.0
    exp = {
        0: _py_bm25(1, 2, 3, n, avgdl) + _py_bm25(1, 2, 3, n, avgdl),  # fox+red
        1: _py_bm25(2, 2, 5, n, avgdl),                                # red only
        2: _py_bm25(3, 2, 4, n, avgdl),                                # fox only
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12), d


def test_rare_term_outweighs_common_term(spark):
    # 'zebra' appears in 1 of 10 docs, 'the' in all 10: the zebra doc
    # must outrank every the-only doc for the query 'zebra the'
    docs = _corpus(
        spark,
        ["the zebra runs"] + [f"the word{i} here" for i in range(9)],
    )
    queries = spark.createDataFrame([("q", "zebra the")], ["query_id", "query_text"])
    ranked = bm25_topk(docs, queries, k=10).orderBy("rank").collect()
    assert ranked[0]["doc_id"] == 0


def test_length_normalization(spark):
    # same tf for the query term; longer doc scores lower
    docs = _corpus(spark, ["fox a b c", "fox a b c d e f g h i j k"])
    queries = spark.createDataFrame([("q", "fox")], ["query_id", "query_text"])
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, queries).collect()}
    assert got[0] > got[1]


def test_duplicate_docs_tie_break_on_doc_id(spark):
    docs = _corpus(spark, ["fox den", "fox den", "fox den"])
    queries = spark.createDataFrame([("q", "fox")], ["query_id", "query_text"])
    ranked = bm25_topk(docs, queries, k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in ranked] == [0, 1, 2]
    assert len({r["bm25"] for r in ranked}) == 1


def test_non_matching_docs_absent(spark):
    docs = _corpus(spark, ["fox den", "dog house"])
    queries = spark.createDataFrame([("q", "fox")], ["query_id", "query_text"])
    got = bm25_topk(docs, queries, k=10).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_two_phase_rank_equals_single_window(spark):
    """The per-(query, doc-hash-bucket) pre-rank discards only rows that
    could never enter the global top-k: results are identical across
    bucket counts, including n_prebuckets=1 (degenerate single window).
    This is the guard for high-df probe terms whose candidate set
    approaches corpus size (VERDICT r4)."""
    docs = _corpus(
        spark,
        [f"the common word{i % 7} text{i}" for i in range(300)],
    )
    queries = spark.createDataFrame(
        [("q0", "the word3"), ("q1", "common text5")],
        ["query_id", "query_text"],
    )
    runs = [
        {
            (r["query_id"], r["rank"], r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, queries, k=15, n_prebuckets=nb).collect()
        }
        for nb in (1, 4, 64, 1024)
    ]
    assert all(s == runs[0] for s in runs[1:])
    assert len(runs[0]) == 30  # 15 per query; 'the'/'common' match all 300


def test_rrf_fuse_python_reference(spark):
    from token_etl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q0", 100, 1), ("q0", 101, 2), ("q0", 102, 3)],
        "query_id string, doc_id long, rank long",
    )
    vec = spark.createDataFrame(
        [("q0", 101, 1), ("q0", 200, 2), ("q0", 100, 3)],
        "query_id string, doc_id long, rank long",
    )
    got = {r.doc_id: (r.rank, r.rrf_score) for r in rrf_fuse(lex, vec, k=10).collect()}
    exp = {
        100: 1 / 61 + 1 / 63,
        101: 1 / 62 + 1 / 61,
        102: 1 / 63,
        200: 1 / 62,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert abs(got[d][1] - s) < 1e-12
    # 101 (1/62+1/61) > 100 (1/61+1/63) > 200 (1/62) > 102 (1/63)
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])]
    assert order == [101, 100, 200, 102]


def test_rrf_fuse_tie_breaks_on_doc_id(spark):
    from token_etl_spark.operators.retrieval import rrf_fuse

    # doc 5 only-lexical rank 2, doc 9 only-vector rank 2 → equal score
    lex = spark.createDataFrame(
        [("q0", 1, 1), ("q0", 5, 2)], "query_id string, doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [("q0", 1, 1), ("q0", 9, 2)], "query_id string, doc_id long, rank long"
    )
    rows = {r.doc_id: r.rank for r in rrf_fuse(lex, vec, k=10).collect()}
    assert rows[1] == 1 and rows[5] == 2 and rows[9] == 3


def test_rrf_fuse_k_cut_and_multiquery_isolation(spark):
    from token_etl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("qa", i, i) for i in range(1, 6)] + [("qb", 100 + i, i) for i in range(1, 4)],
        "query_id string, doc_id long, rank long",
    )
    vec = spark.createDataFrame(
        [("qa", 50 + i, i) for i in range(1, 6)],
        "query_id string, doc_id long, rank long",
    )
    out = rrf_fuse(lex, vec, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q["qa"]) == 3 and len(by_q["qb"]) == 3
    # qb has no vector list: pure-lexical ranks carry through in order
    qb = sorted(by_q["qb"], key=lambda r: r.rank)
    assert [r.doc_id for r in qb] == [101, 102, 103]
