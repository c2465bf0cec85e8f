"""Lexical retrieval: BM25 top-k scoring of a document corpus against a
small query set.

No reference analog (the reference stops at token ETL); this is the
retrieval probe a training-data pipeline runs for targeted corpus
inspection ("which documents score highest for these probe queries?"),
benchmark-leakage triage beyond exact-shingle overlap, and
quality-by-retrievability audits. Scoring is Robertson–Spärck Jones
BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond", FnTIR 3(4)) with one declared variant: the
idf factor is the RATIO form (N − df + 0.5)/(df + 0.5) without the log,
because log is correctly-rounded in neither engine while +, ×, / are
exactly-rounded IEEE — the same trade ``tfidf_top_terms`` and the DSIR
scorer make. Log is monotone, so each term's idf ORDER is preserved;
multi-term totals weight rare terms more steeply than log-BM25 — a
declared variant, not the textbook estimator.

100 TB shape: the postings build is one explode + map-side-combinable
groupBy (dl rides along as a constant group key — no separate
doc-length join); the query side and its df sub-table are broadcast, so
candidate selection is a map-side semi-join that keeps ONLY documents
containing ≥1 query term; the per-(query, doc) fold runs over the
term-sorted score array (pinned double accumulation — the q_array_ops
pattern); and the final top-k is TWO-PHASE (per-(query, doc-hash-bucket)
``row_number() ≤ k`` pre-rank, then the real rank over the ≤ k·n_buckets
survivors — the ext_top_tokens pattern), so even a probe query built of
high-df terms, whose candidate set approaches corpus size, never funnels
through a single task's window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from token_etl_spark.operators.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_prebuckets: int = 64,
) -> DataFrame:
    """Top-``k`` documents per query under ratio-idf BM25.

    ``queries`` is (query_id, query_text) — a SMALL frame (probes, not a
    workload): it is broadcast twice (term match + df lookup), never
    shuffled. Returns (query_id, rank, doc_id, dl, bm25) with rank ties
    broken on doc_id so exact-duplicate documents order
    deterministically.

    Every float enters in one pinned expression order (constants are
    Python-computed doubles embedded as literals; avgdl is one exact
    division of exact integer sums), so the DuckDB oracle replays scores
    bit-for-bit — see plans/quality.py SQL_BM25_TOPK.
    """
    k1p1 = k1 + 1.0
    omb = 1.0 - b

    base = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    post = (
        base.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("sum_dl"),
    )
    qterms = (
        queries.select(
            "query_id", F.explode(tokens("query_text")).alias("term")
        ).distinct()
    )
    # df restricted to query terms: vocabulary-sized frame cut to a
    # query-sized one BEFORE it is broadcast into the postings scan
    qdf = (
        post.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    matched = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    den = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(omb) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    num = F.col("tf").cast("double") * F.lit(k1p1)
    term_score = idf * (num / den)
    scored = matched.select(
        "query_id", "doc_id", "dl", "term", term_score.alias("ts")
    )
    folded = scored.groupBy("query_id", "doc_id", "dl").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "ts"))),
                lambda s: s.getField("ts"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("bm25")
    )
    # Two-phase top-k: a global top-k member is top-k within its bucket,
    # so the per-bucket pre-rank (parallel, bucket-sized sorts) discards
    # all but ≤ k·n_prebuckets rows per query before the real rank —
    # identical output to a single whole-candidate-set window, without
    # the one-task sort a high-df query term would otherwise force.
    from token_etl_spark.operators.curation import hash_bucket

    order = (F.col("bm25").desc(), F.col("doc_id"))
    wb = Window.partitionBy("query_id", "_pb").orderBy(*order)
    pre = (
        folded.withColumn("_pb", hash_bucket("doc_id", n_prebuckets))
        .withColumn("_pr", F.row_number().over(wb))
        .where(F.col("_pr") <= k)
        .drop("_pb", "_pr")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pre.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "dl", "bm25")
    )


RRF_C = 60


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    c: int = RRF_C,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher 2009, SIGIR, "Reciprocal rank fusion outperforms Condorcet
    and individual rank learning methods"): fuse a lexical top-k list
    and a vector top-k list into one ranking per query with

        rrf(d) = Σ_lists 1 / (c + rank_list(d))

    summing only over the lists that retrieved ``d`` (the standard
    union-of-candidates convention; ``c = 60`` is the paper's constant).
    This is the fusion step of every BM25-plus-embeddings hybrid search
    stack, and the corpus-inspection twin of ``bm25_topk``: ranks enter
    as INTEGERS, so unlike score-interpolation fusion there is nothing
    to calibrate across the two scorers' incomparable score scales.

    ``lexical`` and ``vector`` are (query_id, ``id_col``, rank) frames —
    any extra columns are ignored. Returns
    (query_id, rank, doc_id, rrf_score).

    100 TB shape: both inputs are ALREADY per-query top-k lists (the
    upstream operators did the heavy candidate generation with two-phase
    ranks), so this frame is ≤ 2k rows per query by construction. The
    fuse is one full-outer join on (query_id, id) and one window
    partitioned by query_id over those ≤ 2k survivors — no corpus-sized
    shuffle can reach it. The float is two exact integer→double
    divisions and one addition in pinned order (lexical + vector), so a
    SQL oracle replays it bit-for-bit.
    """
    lex = lexical.select(
        "query_id", F.col(id_col).alias("_id"), F.col("rank").alias("_lrank")
    )
    vec = vector.select(
        "query_id", F.col(id_col).alias("_id"), F.col("rank").alias("_vrank")
    )
    one = F.lit(1.0)
    fused = (
        lex.join(vec, ["query_id", "_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(one / (F.lit(float(c)) + F.col("_lrank").cast("double")), F.lit(0.0))
            + F.coalesce(one / (F.lit(float(c)) + F.col("_vrank").cast("double")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("_id").alias(id_col), "rrf_score")
    )
