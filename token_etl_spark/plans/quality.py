"""Quality-gate and observability queries: Gopher-style document
filtering, C4-style line cleaning, exact stratified sampling, and
single-pass table profiling (operators/text.py, operators/curation.py,
operators/profile.py).

No reference analog — these are the document-quality and observability
layers of a pretraining pipeline (BASELINE.json north star). The
line-filter query *injects* deterministic line structure and blocklist
phrases (identical literal replaces in Spark and DuckDB) because the
synthetic corpus is single-line and symbol-free — an all-pass filter
would prove nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_etl_spark.operators import curation as C
from token_etl_spark.operators import sketch as K
from token_etl_spark.operators import text as X
from token_etl_spark.operators.profile import profile_table
from token_etl_spark.plans.base import QuerySpec, t
from token_etl_spark.plans.extensions import SQL_TOKENS

_TOKS = SQL_TOKENS.format(col="text")
_EN_STOP = "['" + "','".join(X.STOPWORDS["en"]) + "']"


# --- Gopher-style quality gate ---------------------------------------------

_G = dict(min_words=25, max_words=90, min_mean_word_len=3.8, max_mean_word_len=5.2)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    out = X.gopher_filter(docs, **_G)
    return out.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("symbol_ratio", 6).alias("symbol_ratio"),
        "stopword_hits",
        "reject_reasons",
        "keep",
    )


_G_CASES = " || ".join(
    f"(CASE WHEN {cond} THEN ['{rule}'] ELSE CAST([] AS VARCHAR[]) END)"
    for rule, cond in [
        ("too_few_words", f"n_words < {_G['min_words']}"),
        ("too_many_words", f"n_words > {_G['max_words']}"),
        ("mean_word_len_low", f"mean_word_len < {_G['min_mean_word_len']}"),
        ("mean_word_len_high", f"mean_word_len > {_G['max_mean_word_len']}"),
        ("symbol_ratio_high", "symbol_ratio > 0.1"),
        ("too_few_stopwords", "stopword_hits < 1"),
    ]
)

SQL_GOPHER_QUALITY = f"""
WITH base AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mean_word_len,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
             / greatest(len(toks), 1) AS symbol_ratio,
         CAST(len(list_intersect(list_distinct(toks), {_EN_STOP})) AS BIGINT) AS stopword_hits
  FROM base)
SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio, stopword_hits,
       coalesce(array_to_string({_G_CASES}, '|'), '') AS reject_reasons,
       coalesce(array_to_string({_G_CASES}, '|'), '') = '' AS keep
FROM m
"""


# --- C4-style line filter --------------------------------------------------


def _structured(docs: DataFrame) -> DataFrame:
    """Deterministically inject line structure + blocklist phrases:
    ' row ' becomes a sentence break, ' slow ' becomes ' javascript ',
    and every 11th document gains a brace line."""
    base = F.replace(
        F.replace(F.col("text"), F.lit(" row "), F.lit(".\n")),
        F.lit(" slow "),
        F.lit(" javascript "),
    )
    withbrace = F.concat(base, F.lit("\nconfig { debug } end."))
    return docs.withColumn(
        "text", F.when(F.col("doc_id") % 11 == 0, withbrace).otherwise(base)
    )


def q_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _structured(t(spark, sf_dir, "documents"))
    out = X.line_filter(docs)
    return out.select("doc_id", "n_lines", "n_kept", "cleaned")


_SQL_STRUCT_TEXT = (
    "CASE WHEN doc_id % 11 = 0 THEN "
    "replace(replace(text, ' row ', '.' || chr(10)), ' slow ', ' javascript ')"
    " || chr(10) || 'config { debug } end.'"
    " ELSE replace(replace(text, ' row ', '.' || chr(10)), ' slow ', ' javascript ') END"
)

SQL_LINE_FILTER = f"""
WITH corpus AS (SELECT doc_id, {_SQL_STRUCT_TEXT} AS text FROM documents),
f AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)),
                     l -> len(string_split_regex(trim(l), '\\s+')) >= 5
                          AND ends_with(l, '.')
                          AND NOT contains(lower(l), 'javascript')
                          AND NOT contains(lower(l), 'lorem ipsum')
                          AND NOT contains(lower(l), '{{')) AS kept
  FROM corpus)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned
FROM f
"""


# --- intra-document line dedup ---------------------------------------------


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style intra-doc line dedup over injected line
    structure: documents are chunked into 3-word lines (the corpus is
    single-line, so structure must be synthesized — same rationale as
    the line-filter query) and every 5th document gets its first line
    re-appended, guaranteeing the keep-first path actually fires. The
    oracle replays chunking, injection, and keep-first dedup exactly;
    ``dedup_fp`` pins the surviving text byte-for-byte via md5."""
    # tk is MATERIALIZED before the per-index transform references it —
    # an inline split would re-run once per chunk inside the no-CSE
    # lambda (the bigram_array_expr / shingles trap)
    base = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("tk")
    )
    tk = F.col("tk")
    n_chunks = F.ceil(F.size(tk) / F.lit(3.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(F.slice(tk, i * 3 + 1, 3), " "),
    )
    joined = F.array_join(lines, "\n")
    synth_text = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(joined, F.lit("\n"), F.element_at(lines, 1)),
    ).otherwise(joined)
    out = X.line_dedup(base.select("doc_id", synth_text.alias("text")))
    return out.select(
        "doc_id", "n_lines", "n_unique", F.md5("deduped").alias("dedup_fp")
    )


SQL_LINE_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ls AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(tk)/3.0) AS BIGINT)),
                        i -> array_to_string(tk[i*3+1 : i*3+3], ' ')) AS lines
  FROM toks),
synth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN array_to_string(lines, chr(10)) || chr(10) || lines[1]
              ELSE array_to_string(lines, chr(10)) END AS text
  FROM ls),
l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM synth),
n AS (SELECT doc_id, lines, list_transform(lines, x -> trim(lower(x))) AS nls FROM l),
k AS (
  SELECT doc_id, len(lines) AS n_lines,
         list_filter(lines, (x, i) -> list_position(nls, trim(lower(x))) = i) AS kept
  FROM n)
SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, CAST(len(kept) AS BIGINT) AS n_unique,
       md5(array_to_string(kept, chr(10))) AS dedup_fp
FROM k
"""


# --- corpus-level (cross-document) line dedup ------------------------------


def q_crossdoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma/RefinedWeb-style corpus-level paragraph dedup over the same
    injected 3-word-line structure as ext_line_dedup (the corpus is
    single-line): each distinct normalized line survives only at its
    first (doc_id, idx) occurrence corpus-wide — duplicate documents and
    shared boilerplate chunks both exercise the cross-document path."""
    # same materialize-before-lambda rule as q_line_dedup above
    base = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("tk")
    )
    tk = F.col("tk")
    n_chunks = F.ceil(F.size(tk) / F.lit(3.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(F.slice(tk, i * 3 + 1, 3), " "),
    )
    synth = base.select("doc_id", F.array_join(lines, "\n").alias("text"))
    return X.crossdoc_line_dedup(synth)


SQL_CROSSDOC_LINE_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ls AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(tk)/3.0) AS BIGINT)),
                        i -> array_to_string(tk[i*3+1 : i*3+3], ' ')) AS lines
  FROM toks),
occ AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(0, len(lines))) AS idx
  FROM ls),
ranked AS (
  SELECT doc_id, idx, line,
         row_number() OVER (PARTITION BY trim(lower(line))
                            ORDER BY doc_id, idx) AS rn
  FROM occ),
kept AS (SELECT doc_id, idx, line FROM ranked WHERE rn = 1),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         array_to_string(list(line ORDER BY idx), chr(10)) AS kept_text
  FROM kept GROUP BY doc_id)
SELECT b.doc_id,
       CAST(len(b.lines) AS BIGINT) AS n_lines,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       md5(coalesce(a.kept_text, '')) AS dedup_fp
FROM ls b LEFT JOIN agg a USING (doc_id)
"""


# --- global heavy hitters (corpus vocabulary top-k) ------------------------

TOP_TOKENS_K = 50


TOP_TOKENS_BUCKETS = 64


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide most-frequent tokens (vocabulary/contamination
    observability), exact two-phase top-k. Shape at 100 TB: explode is a
    narrow generator and the count groupBy is map-side combinable — but
    the distinct-token frame of a web crawl runs to billions (typos,
    URLs, numbers), so a bare global ``Window.orderBy`` would sort the
    whole vocabulary through one task. Phase 1 therefore takes a
    per-hash-bucket ``row_number() <= K`` (any global top-K member is
    top-K within its bucket — row_number only decreases when rows are
    removed), leaving at most K x BUCKETS survivors; phase 2 runs the
    global rank over that bounded frame. Exact, same oracle; equivalence
    to the single-phase form is pinned in
    tests/test_quality.py::test_top_tokens_two_phase_equivalence.
    Ties break on the token string for a deterministic oracle."""
    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    wb = Window.partitionBy("bucket").orderBy(F.col("n").desc(), F.col("token"))
    survivors = (
        counts.withColumn(
            "bucket", F.pmod(F.xxhash64("token"), F.lit(TOP_TOKENS_BUCKETS))
        )
        .withColumn("bucket_rank", F.row_number().over(wb))
        .filter(F.col("bucket_rank") <= TOP_TOKENS_K)
        .drop("bucket", "bucket_rank")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_TOKENS_K)
        .select("rank", "token", "n")
    )


SQL_TOP_TOKENS = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
r AS (SELECT token, n,
             CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
      FROM c)
SELECT rank, token, n FROM r WHERE rank <= {TOP_TOKENS_K}
"""


# --- HyperLogLog distinct sketch -------------------------------------------


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct 3-token-shingle cardinality — the statistic
    that sizes a MinHash dedup run — exact countDistinct vs the
    deterministic HLL sketch (operators/sketch.py hll_registers /
    hll_estimate; see those docstrings for the register/merge shape at
    100 TB and the bit-reproducibility contract). Shingles, not tokens:
    the synthetic vocabulary is ~30 words per source, far below the
    m=256 raw-estimator regime (n/m ≳ 2.5), while the shingle frame
    sits properly above it at the sf0.01 gate. ``rel_err_pct`` is
    observability, not an assertion: the oracle replays the estimator
    exactly, so the row hashes green whatever the error is — unlike
    ``rel_approx_active_users``, whose engine-specific HLL forces a
    tolerance-style contract."""
    from token_etl_spark.operators.dedup import shingle_array_expr

    docs = t(spark, sf_dir, "documents")
    base = docs.select("source", X.tokens("text").alias("toks"))
    tok = base.select(
        "source", F.explode(shingle_array_expr(F.col("toks"), k=3)).alias("token")
    )
    regs = K.hll_registers(tok, "token", ("source",))
    est = K.hll_estimate(regs, ("source",))
    exact = tok.groupBy("source").agg(
        F.countDistinct("token").cast("long").alias("exact_distinct")
    )
    rel = (
        (F.col("hll_est") - F.col("exact_distinct"))
        / F.col("exact_distinct")
        * F.lit(100.0)
    )
    return est.join(exact, "source").select(
        "source",
        "exact_distinct",
        "n_obs",
        "v_zero",
        F.round("hll_est", 6).alias("hll_est"),
        F.round(rel, 6).alias("rel_err_pct"),
    )


_HLL_AM2 = repr(K.hll_alpha_m2(K.HLL_M))


def _hll_ln_literals() -> str:
    from token_etl_spark.operators.rollup import hll_ln_table

    return ", ".join(repr(x) for x in hll_ln_table(K.HLL_M))


_HLL_LN = _hll_ln_literals()

#: same distinct-3-shingle fragment as plans/curation.py _SHINGLES
#: (mirrors dedup.shingle_array_expr at k=3).
_HLL_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(tk) - 2, 1) + 1),"
    " i -> array_to_string(tk[i:i+2], ' ')))"
)

SQL_HLL_DISTINCT = f"""
WITH base AS (SELECT source, {_TOKS} AS tk FROM documents),
tok AS (SELECT source, unnest({_HLL_SHINGLES}) AS token FROM base),
h AS (
  SELECT source,
         CAST('0x' || substr(md5('hllb:' || token), 1, 6) AS BIGINT) % {K.HLL_M} AS bucket,
         CAST('0x' || substr(md5('hllr:' || token), 1, 12) AS BIGINT) AS hv
  FROM tok),
r AS (
  SELECT source, bucket,
         max(CASE WHEN hv = 0 THEN 49 ELSE 49 - length(bin(hv)) END) AS m_j
  FROM h GROUP BY 1, 2),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_obs,
         list_aggregate(list(1.0 / CAST(1::BIGINT << m_j AS DOUBLE) ORDER BY bucket),
                        'sum') AS s_obs
  FROM r GROUP BY 1),
e AS (
  SELECT source, n_obs, CAST({K.HLL_M} - n_obs AS BIGINT) AS v_zero,
         CASE WHEN ({K.HLL_M} - n_obs) > 0
                   AND ({_HLL_AM2} / (s_obs + CAST({K.HLL_M} - n_obs AS DOUBLE)))
                       <= CAST({2.5 * K.HLL_M!r} AS DOUBLE)
              THEN CAST({float(K.HLL_M)!r} AS DOUBLE)
                   * ([{_HLL_LN}])[CAST({K.HLL_M} - n_obs AS INT)]
              ELSE {_HLL_AM2} / (s_obs + CAST({K.HLL_M} - n_obs AS DOUBLE)) END AS est
  FROM s),
x AS (SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct
      FROM tok GROUP BY 1)
SELECT e.source, x.exact_distinct, e.n_obs, e.v_zero,
       round(e.est, 6) AS hll_est,
       round((e.est - x.exact_distinct) / x.exact_distinct * 100.0, 6) AS rel_err_pct
FROM e JOIN x USING (source)
"""


# --- KMV pairwise set overlap ----------------------------------------------

KMV_PAIR_K = 128


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated shingle-set overlap between every source pair from
    bottom-k sketches (operators/sketch.py kmv_sketch / kmv_pairwise) —
    the cross-source contamination/redundancy matrix a mixture designer
    reads before setting sampling weights. KMV rather than HLL because
    registers cannot intersect; bottom-k sets compose under union
    (merge-and-trim) and give Jaccard directly. The whole pairwise stage
    runs on k·|sources| sketch rows — corpus bytes only touch the
    sketch build. Oracle replays hashing, ranks, merge, and the three
    fixed-order float ops exactly."""
    from token_etl_spark.operators.dedup import shingle_array_expr
    from token_etl_spark.operators.sketch import kmv_pairwise, kmv_sketch

    docs = t(spark, sf_dir, "documents")
    base = docs.select("source", X.tokens("text").alias("toks"))
    items = base.select(
        "source", F.explode(shingle_array_expr(F.col("toks"), k=3)).alias("item")
    )
    ks = kmv_sketch(items, "item", ("source",), k=KMV_PAIR_K)
    out = kmv_pairwise(ks, "source", k=KMV_PAIR_K)
    return out.select(
        "ga",
        "gb",
        "n_both",
        F.round("jaccard_est", 6).alias("jaccard_est"),
        F.round("union_est", 6).alias("union_est"),
        F.round("inter_est", 6).alias("inter_est"),
    )


_KMV_SP = repr(float(1 << 48))
_KMV_UE = (
    f"CASE WHEN n_x < {KMV_PAIR_K} THEN CAST(n_x AS DOUBLE)"
    f" ELSE CAST({KMV_PAIR_K - 1}.0 AS DOUBLE) * CAST({_KMV_SP} AS DOUBLE)"
    f" / CAST(h_k AS DOUBLE) END"
)
_KMV_J = (
    f"CAST(n_both AS DOUBLE)"
    f" / CAST(least(n_x, {KMV_PAIR_K}) AS DOUBLE)"
)

SQL_KMV_OVERLAP = f"""
WITH base AS (SELECT source, {_TOKS} AS tk FROM documents),
it AS (SELECT DISTINCT source, item
       FROM (SELECT source, unnest({_HLL_SHINGLES}) AS item FROM base)),
h AS (SELECT DISTINCT source,
             CAST('0x' || substr(md5('kmv:' || item), 1, 12) AS BIGINT) AS h
      FROM it),
ks AS (SELECT source, h FROM (
         SELECT source, h,
                row_number() OVER (PARTITION BY source ORDER BY h) AS rank
         FROM h)
       WHERE rank <= {KMV_PAIR_K}),
nm AS (SELECT DISTINCT source FROM ks),
pr AS (SELECT a.source AS ga, b.source AS gb
       FROM nm a CROSS JOIN nm b WHERE a.source < b.source),
tg AS (
  SELECT pr.ga, pr.gb, ks.h, 1 AS in_a, 0 AS in_b
  FROM pr JOIN ks ON ks.source = pr.ga
  UNION ALL
  SELECT pr.ga, pr.gb, ks.h, 0 AS in_a, 1 AS in_b
  FROM pr JOIN ks ON ks.source = pr.gb),
mg AS (SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b
       FROM tg GROUP BY 1, 2, 3),
x AS (SELECT ga, gb, h, in_a, in_b FROM (
        SELECT ga, gb, h, in_a, in_b,
               row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS xr
        FROM mg)
      WHERE xr <= {KMV_PAIR_K}),
pp AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_x,
              CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
              max(h) AS h_k
       FROM x GROUP BY 1, 2)
SELECT ga, gb, n_both,
       round({_KMV_J}, 6) AS jaccard_est,
       round({_KMV_UE}, 6) AS union_est,
       round(({_KMV_J}) * ({_KMV_UE}), 6) AS inter_est
FROM pp
"""


# --- BM25 top-k retrieval --------------------------------------------------

BM25_QUERIES = [
    ("q0", "hash join merge"),
    ("q1", "window sort order"),
    ("q2", "spark table scan"),
]
BM25_TOPK = 10


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per probe query under ratio-idf BM25
    (operators/retrieval.py bm25_topk — see that docstring for the
    declared no-log idf variant and the broadcast/fold/rank shape at
    100 TB). The probe queries are drawn from the synthetic corpus
    vocabulary so every term matches at every SF."""
    from token_etl_spark.operators.retrieval import bm25_topk

    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(BM25_QUERIES, ["query_id", "query_text"])
    out = bm25_topk(docs, queries, k=BM25_TOPK)
    return out.select(
        "query_id",
        "rank",
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        F.round("bm25", 6).alias("bm25"),
    )


_B_K1 = 1.2
_B_B = 0.75
_B_VALUES = ", ".join(f"('{qid}', '{qt}')" for qid, qt in BM25_QUERIES)
_TOKSQ = SQL_TOKENS.format(col="query_text")

SQL_BM25_TOPK = f"""
WITH q(query_id, query_text) AS (VALUES {_B_VALUES}),
base AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
tf AS (
  SELECT doc_id, CAST(dl AS BIGINT) AS dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM base)
  GROUP BY 1, 2, 3),
qt AS (SELECT DISTINCT query_id, term
       FROM (SELECT query_id, unnest({_TOKSQ}) AS term FROM q)),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len(tk)) AS BIGINT) AS sum_dl FROM base),
m AS (
  SELECT qt.query_id, tf.doc_id, tf.dl, tf.term,
         ((CAST(n_docs - df AS DOUBLE) + CAST(0.5 AS DOUBLE))
          / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         * ((CAST(tf AS DOUBLE) * CAST({_B_K1 + 1.0!r} AS DOUBLE))
            / (CAST(tf AS DOUBLE)
               + CAST({_B_K1!r} AS DOUBLE)
                 * (CAST({1.0 - _B_B!r} AS DOUBLE)
                    + CAST({_B_B!r} AS DOUBLE) * CAST(tf.dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS ts
  FROM tf JOIN qt USING (term) JOIN dfq USING (term) CROSS JOIN stats),
g AS (
  SELECT query_id, doc_id, dl,
         list_aggregate(list(ts ORDER BY term), 'sum') AS bm25
  FROM m GROUP BY 1, 2, 3),
r AS (
  SELECT query_id, doc_id, dl, bm25,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
  FROM g)
SELECT query_id, rank, doc_id, dl, round(bm25, 6) AS bm25
FROM r WHERE rank <= {BM25_TOPK}
"""


# --- Hybrid retrieval: BM25 + vector, reciprocal rank fusion ----------------

RRF_K = 10
RRF_N_PROBES = 3  # probe i pairs BM25_QUERIES[i] with query vector vec_id=i


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the BM25 top-10 lexical list and the exact-cosine
    top-10 vector list, fused per probe by Reciprocal Rank Fusion
    (operators/retrieval.py rrf_fuse — Cormack et al. 2009, c=60). Probe
    ``i`` pairs lexical query ``BM25_QUERIES[i]`` with query vector
    ``vec_id = i`` (the synthetic corpus aligns documents and embeddings
    by id), which is exactly how a hybrid search stack issues one user
    query to both indexes. Ranks — not raw scores — cross the fusion
    boundary, so the two scorers' incomparable scales never need
    calibration, and the oracle replays the arithmetic bit-for-bit."""
    from token_etl_spark.operators import similarity as S
    from token_etl_spark.operators.retrieval import bm25_topk, rrf_fuse

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(
        BM25_QUERIES[:RRF_N_PROBES], ["query_id", "query_text"]
    )
    lex = bm25_topk(docs, queries, k=RRF_K)
    vec = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < RRF_N_PROBES), k=RRF_K
    ).select(
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    out = rrf_fuse(lex, vec, k=RRF_K)
    return out.select(
        "query_id", "rank", "doc_id", F.round("rrf_score", 6).alias("rrf_score")
    )


SQL_HYBRID_RRF = f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS lrank FROM ({SQL_BM25_TOPK})),
vq AS (SELECT vec_id AS qvid, 'q' || CAST(vec_id AS VARCHAR) AS query_id,
              embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < {RRF_N_PROBES}),
vc AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
vs AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
  FROM vq CROSS JOIN vc WHERE qvid <> neighbor_id),
vr AS (
  SELECT query_id, neighbor_id AS doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS vrank
  FROM vs),
vec AS (SELECT query_id, doc_id, vrank FROM vr WHERE vrank <= {RRF_K}),
fused AS (
  SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
         coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(lrank AS DOUBLE)),
                  CAST(0 AS DOUBLE))
         + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(vrank AS DOUBLE)),
                    CAST(0 AS DOUBLE)) AS rrf_score
  FROM lex FULL OUTER JOIN vec
    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id),
rr AS (
  SELECT query_id, doc_id, rrf_score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
  FROM fused)
SELECT query_id, rank, doc_id, round(rrf_score, 6) AS rrf_score
FROM rr WHERE rank <= {RRF_K}
"""


# --- TF-IDF distinctive terms ----------------------------------------------

TFIDF_K = 5


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 distinctive terms per document (operators/text.py
    tfidf_top_terms): integer-only ranking (tf DESC, df ASC, term) and a
    ratio-form idf weight built from exactly-rounded IEEE ops, so the
    DuckDB replay hash-matches bit-for-bit. See the operator docstring
    for the 100 TB shuffle shape."""
    docs = t(spark, sf_dir, "documents")
    return X.tfidf_top_terms(docs, k=TFIDF_K)


SQL_TFIDF_TERMS = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
r AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * (CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf,
         CAST(row_number() OVER (
             PARTITION BY tf.doc_id
             ORDER BY tf.tf DESC, dfreq.df ASC, tf.term) AS BIGINT) AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= {TFIDF_K}
"""


# --- DSIR-style importance weights -----------------------------------------

IMP_TARGETS = ("src0", "src1")
IMP_BUCKETS = 512


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram importance scoring against a target source mix
    (operators/curation.py importance_weights — DSIR ratio-form variant;
    see the operator docstring for the exactly-rounded-ops contract and
    the 100 TB shuffle shape). src0+src1 play the 'target distribution'
    role (10% of the corpus)."""
    docs = t(spark, sf_dir, "documents")
    out = C.importance_weights(
        docs, target_sources=IMP_TARGETS, n_buckets=IMP_BUCKETS
    )
    return out.select(
        "doc_id",
        "source",
        "n_bigrams",
        F.round("score", 6).alias("score"),
        F.round("avg_weight", 6).alias("avg_weight"),
    )


_IMP_TGT = "('" + "','".join(IMP_TARGETS) + "')"

SQL_IMPORTANCE_WEIGHTS = f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
  FROM toks),
occ AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(bg), 1, 6) AS BIGINT) % {IMP_BUCKETS} AS bucket
  FROM bg),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN source IN {_IMP_TGT} THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
         CAST(sum(CASE WHEN source IN {_IMP_TGT} THEN 0 ELSE 1 END) AS BIGINT) AS r_b
  FROM occ GROUP BY 1),
tot AS (SELECT CAST(sum(t_b) AS BIGINT) AS t_total,
               CAST(sum(r_b) AS BIGINT) AS r_total FROM stats),
w AS (
  SELECT bucket,
         CAST((t_b + 1) * (r_total + {IMP_BUCKETS}) AS DOUBLE)
         / CAST((r_b + 1) * (t_total + {IMP_BUCKETS}) AS DOUBLE) AS w
  FROM stats CROSS JOIN tot),
dc AS (SELECT doc_id, source, bucket, count(*) AS c FROM occ GROUP BY 1, 2, 3),
terms AS (
  SELECT doc_id, source, bucket, c, CAST(c AS DOUBLE) * w AS term
  FROM dc JOIN w USING (bucket)),
pd AS (
  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_bigrams,
         list_aggregate(list(term ORDER BY bucket), 'sum') AS score
  FROM terms GROUP BY 1, 2)
SELECT d.doc_id, d.source,
       CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(pd.score, 0.0), 6) AS score,
       round(CASE WHEN coalesce(pd.n_bigrams, 0) > 0
                  THEN pd.score / CAST(pd.n_bigrams AS DOUBLE) ELSE 0.0 END, 6)
         AS avg_weight
FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
"""


# --- CCNet-style bigram-LM quality score -----------------------------------

LM_REF = ("src0", "src1")


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring against a reference source mix
    (operators/curation.py bigram_lm_quality — CCNet linear-mean
    variant; see the operator docstring for the exactly-rounded-ops
    contract and the broadcast-LM 100 TB shape). src0+src1 play the
    'trusted reference corpus' role."""
    docs = t(spark, sf_dir, "documents")
    out = C.bigram_lm_quality(docs, reference_sources=LM_REF)
    return out.select(
        "doc_id",
        "source",
        "n_bigrams",
        F.round("score", 6).alias("score"),
        F.round("avg_p", 6).alias("avg_p"),
    )


_LM_REF_SQL = "('" + "','".join(LM_REF) + "')"

SQL_LM_QUALITY = f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
occ AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg,
         unnest(range(1, len(tk))) AS pos
  FROM toks),
c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2
       FROM occ WHERE source IN {_LM_REF_SQL} GROUP BY 1),
c1 AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(count(*) AS BIGINT) AS c1
       FROM occ WHERE source IN {_LM_REF_SQL} GROUP BY 1),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
pr AS (
  SELECT o.doc_id, o.source, o.pos,
         CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
         / CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE) AS p
  FROM occ o
  LEFT JOIN c2 USING (bg)
  LEFT JOIN c1 ON c1.w1 = string_split(o.bg, ' ')[1]
  CROSS JOIN v),
pd AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_bigrams,
         list_aggregate(list(p ORDER BY pos), 'sum') AS score
  FROM pr GROUP BY 1, 2)
SELECT d.doc_id, d.source,
       CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(coalesce(pd.score, 0.0), 6) AS score,
       round(CASE WHEN coalesce(pd.n_bigrams, 0) > 0
                  THEN pd.score / CAST(pd.n_bigrams AS DOUBLE) ELSE 0.0 END, 6)
         AS avg_p
FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
"""


# --- exact stratified sample -----------------------------------------------


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: runs the TWO-PHASE rank (per-(stratum, md5-prebucket)
    pre-rank, then the real rank over ≤ k·buckets survivors — the
    skew-safe plan); the oracle stays the single whole-stratum window,
    so a green row certifies two-phase ≡ naive window."""
    docs = t(spark, sf_dir, "documents")
    out = C.stratified_sample_exact(docs, "source", k=10, seed="s0", n_prebuckets=16)
    return out.select("source", "doc_id", F.col("sample_rank").cast("long").alias("sample_rank"))


SQL_STRATIFIED_SAMPLE = """
SELECT source, doc_id, sample_rank
FROM (SELECT source, doc_id,
             CAST(row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || 's0')) AS BIGINT) AS sample_rank
      FROM documents)
WHERE sample_rank <= 10
"""


# --- sliding-window chunking -----------------------------------------------


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return X.chunk_documents(docs, chunk_tokens=32, overlap=8)


SQL_CHUNK_DOCUMENTS = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
n AS (
  SELECT doc_id, tk, len(tk) AS n,
         CASE WHEN len(tk) <= 32 THEN 1
              ELSE CAST(ceil((len(tk) - 32) / 24.0) AS BIGINT) + 1 END AS nc
  FROM base),
e AS (SELECT doc_id, tk, n, unnest(range(0, nc)) AS chunk_id FROM n)
SELECT doc_id, chunk_id,
       chunk_id * 24 AS start_tok,
       least(n - chunk_id * 24, 32) AS n_tokens,
       coalesce(array_to_string(tk[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' '), '') AS chunk_text
FROM e
"""


# --- single-pass table profile ---------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return profile_table(docs, _PROFILE_COLS)


_PROFILE_AGGS = ", ".join(
    f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
    f"CAST(min({c}) AS VARCHAR) AS mn_{c}, CAST(max({c}) AS VARCHAR) AS mx_{c}"
    for c in _PROFILE_COLS
)
_PROFILE_ROWS = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, total AS n_rows, total - nn_{c} AS n_nulls, "
    f"nd_{c} AS n_distinct, mn_{c} AS min_val, mx_{c} AS max_val FROM s"
    for c in _PROFILE_COLS
)

SQL_TABLE_PROFILE = f"""
WITH s AS (SELECT count(*) AS total, {_PROFILE_AGGS} FROM documents)
{_PROFILE_ROWS}
"""


# --- corpus mixture: token budgets and epoch upsampling --------------------

_BUCKET = "CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 6) AS BIGINT) % {n}"


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    out = C.token_budget_cap(docs, budget_tokens=500)
    return out.select("doc_id", "source", "n_tokens", "cum_tokens")


SQL_TOKEN_BUDGET = f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS k
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM base)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens - n_tokens < 500
"""

def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced training-shard export manifest
    (operators/curation.assign_shards + shard_manifest): every document
    deterministically assigned to the ~1000-token shard where it starts
    on the md5-ordered token tape, then rolled up to the per-shard
    manifest (doc count, token total, [first_key, last_key] order-key
    range) a 100 TB export writes and audits against. The global cumsum
    runs the TWO-PHASE range-bucketed form (the token_budget_cap
    machinery, global key space) — equivalence to the single-window
    form is pinned in tests/test_quality_ops.py. Oracle replays the
    cumsum, the integral start-offset division, and the min/max key
    range exactly."""
    docs = t(spark, sf_dir, "documents")
    return C.shard_manifest(C.assign_shards(docs, tokens_per_shard=1000))


SQL_SHARD_MANIFEST = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS k
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, k,
         CAST(sum(n_tokens) OVER (ORDER BY k, n_tokens
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base),
a AS (
  SELECT doc_id, n_tokens, k, (cum - n_tokens) // 1000 AS shard_id FROM c)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(k) AS first_key, max(k) AS last_key
FROM a GROUP BY shard_id
"""


def q_shard_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard split arithmetic (operators/curation.split_shard_rows —
    the range decision behind io/sinks.split_shard, the maintenance
    lever route_to_shards' range-sharding discipline promises): the
    manifest's most-token splittable shard (>= 2 docs, ties to the
    smallest id) splits at the first document that starts at or past
    half its tokens, the second half takes max(shard_id) + 1, and the
    post-split manifest is emitted. Fully declarative — the target
    shard and the new id are 1-row broadcast frames, the split window
    runs over ONE shard's rows (bounded by construction), and every
    boundary comparison is integer arithmetic, so the oracle replays
    the cumsum, the 2*start >= total midpoint rule, the doc-count
    fallback, and the manifest stitch exactly. Plan note: the declared
    tree re-expands the assignment subtree under each consumer (the
    default-recompute trade); the PRODUCTION lever (io/sinks.
    split_shard) reads the materialized manifest plus ONE shard
    directory, so none of that re-expansion exists there."""
    docs = t(spark, sf_dir, "documents")
    assigned = C.assign_shards(docs, tokens_per_shard=1000).select(
        "ord_key", "n_tokens", "shard_id"
    )
    manifest = C.shard_manifest(assigned)
    tgt = (
        manifest.where(F.col("n_docs") >= 2)
        .agg(
            F.max(
                F.struct(
                    F.col("shard_tokens"), (-F.col("shard_id")).alias("_neg")
                )
            ).alias("_m")
        )
        .select((-F.col("_m._neg")).cast("long").alias("_tsid"))
    )
    mx = manifest.agg((F.max("shard_id") + 1).cast("long").alias("_new_sid"))
    rows = (
        assigned.crossJoin(F.broadcast(tgt))
        .where(F.col("shard_id") == F.col("_tsid"))
        .crossJoin(F.broadcast(mx))
    )
    halves = C.split_shard_rows(rows, F.col("_tsid"), F.col("_new_sid")).drop(
        "_tsid", "_new_sid"
    )
    untouched = manifest.join(
        F.broadcast(tgt), manifest.shard_id == tgt._tsid, "left_anti"
    )
    return untouched.unionByName(C.shard_manifest(halves))


SQL_SHARD_SPLIT = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS k
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, k,
         CAST(sum(n_tokens) OVER (ORDER BY k, n_tokens
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base),
a AS (
  SELECT doc_id, n_tokens, k, CAST((cum - n_tokens) // 1000 AS BIGINT) AS shard_id FROM c),
man AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         min(k) AS first_key, max(k) AS last_key
  FROM a GROUP BY shard_id),
tgt AS (
  SELECT shard_id AS tsid FROM man WHERE n_docs >= 2
  ORDER BY shard_tokens DESC, shard_id ASC LIMIT 1),
mx AS (SELECT CAST(max(shard_id) + 1 AS BIGINT) AS new_sid FROM man),
r AS (
  SELECT a.n_tokens, a.k, tgt.tsid,
         row_number() OVER (ORDER BY a.k, a.n_tokens) AS rn,
         CAST(sum(a.n_tokens) OVER (ORDER BY a.k, a.n_tokens
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
  FROM a JOIN tgt ON a.shard_id = tgt.tsid),
t2 AS (SELECT max(cum2) AS tot, CAST(count(*) AS BIGINT) AS n FROM r),
b AS (
  SELECT coalesce(
           min(CASE WHEN (cum2 - n_tokens) * 2 >= tot AND rn > 1 THEN rn END),
           min(n) // 2 + 1) AS bound
  FROM r CROSS JOIN t2),
halves AS (
  SELECT CAST(CASE WHEN rn >= bound THEN new_sid ELSE tsid END AS BIGINT) AS shard_id,
         n_tokens, k
  FROM r CROSS JOIN b CROSS JOIN mx),
split_man AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         min(k) AS first_key, max(k) AS last_key
  FROM halves GROUP BY shard_id)
SELECT * FROM man WHERE shard_id NOT IN (SELECT tsid FROM tgt)
UNION ALL
SELECT * FROM split_man
"""


def q_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard merge arithmetic (operators/curation.merge_shard_rows —
    the range decision behind io/sinks.merge_shards, the dual of the
    split lever and the third leg of the maintenance triad): the
    adjacent pair of manifest ranges with the smallest COMBINED token
    total (the sliver-fold target; ties to the smaller first_key)
    folds into one row under the lower-range shard's id — counts and
    token totals add, the key range becomes the union — and the
    post-merge manifest is emitted. Fully declarative: pair selection
    is a lead() window over the manifest (shard-cardinality, the
    bounded-frame exception) reduced to a 1-row broadcast via min_by,
    and the fold is one bounded filter + aggregate, so the oracle
    replays the cumsum, the lead pairing, the min-combined choice, and
    the fold exactly. The production lever (io/sinks.merge_shards)
    reads the materialized manifest plus TWO shard directories and
    derives the committed row from the rows actually written."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    manifest = C.shard_manifest(C.assign_shards(docs, tokens_per_shard=1000))
    w = Window.orderBy("first_key")
    pairs = manifest.select(
        "shard_id",
        "first_key",
        "shard_tokens",
        F.lead("shard_id").over(w).alias("_nsid"),
        F.lead("shard_tokens").over(w).alias("_ntok"),
    ).where(F.col("_nsid").isNotNull())
    best = (
        pairs.agg(
            F.min_by(
                F.struct(
                    F.col("shard_id").alias("_ksid"),
                    F.col("_nsid").alias("_dsid"),
                ),
                F.struct(
                    (F.col("shard_tokens") + F.col("_ntok")).alias("_t"),
                    F.col("first_key"),
                ),
            ).alias("_p")
        )
        .select(
            F.col("_p._ksid").cast("long").alias("_ksid"),
            F.col("_p._dsid").cast("long").alias("_dsid"),
        )
    )
    m2 = manifest.crossJoin(F.broadcast(best))
    return C.merge_shard_rows(m2, F.col("_ksid"), F.col("_dsid"))


SQL_SHARD_MERGE = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS k
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, k,
         CAST(sum(n_tokens) OVER (ORDER BY k, n_tokens
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base),
a AS (
  SELECT doc_id, n_tokens, k, CAST((cum - n_tokens) // 1000 AS BIGINT) AS shard_id FROM c),
man AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         min(k) AS first_key, max(k) AS last_key
  FROM a GROUP BY shard_id),
p AS (
  SELECT shard_id AS ksid, first_key,
         lead(shard_id) OVER (ORDER BY first_key) AS dsid,
         shard_tokens + lead(shard_tokens) OVER (ORDER BY first_key) AS comb
  FROM man),
best AS (
  SELECT ksid, dsid FROM p WHERE dsid IS NOT NULL
  ORDER BY comb ASC, first_key ASC LIMIT 1),
merged AS (
  SELECT CAST((SELECT ksid FROM best) AS BIGINT) AS shard_id,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(sum(shard_tokens) AS BIGINT) AS shard_tokens,
         min(first_key) AS first_key, max(last_key) AS last_key
  FROM man WHERE shard_id IN (SELECT ksid FROM best) OR shard_id IN (SELECT dsid FROM best))
SELECT * FROM man
WHERE shard_id NOT IN (SELECT ksid FROM best) AND shard_id NOT IN (SELECT dsid FROM best)
UNION ALL
SELECT * FROM merged
"""


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance recommendations over a POST-DEDUP manifest
    (operators/curation.plan_shard_maintenance — the policy observable
    beside the split/merge levers: the audit says whether the layout is
    sound, this says which levers to pull). Scenario is the lever's
    declared use case: documents were assigned at fit time (budget
    150), then aggressive dedup dropped half of them (deterministic
    doc_id parity stand-in), and the recommendations run over the
    SURVIVING manifest — sliver shards become merge_with_next, shards
    that kept an over-budget run of tokens become split
    (split_factor=1: rebalance anything over budget — chosen so all
    THREE branches carry driver-verified rows at every SF, ~90 ok /
    ~40 merge / ~23 split at sf0.001), 1-doc shards never split. Pure
    manifest-cardinality integer arithmetic over one bounded lead()
    window; the oracle replays the cumsum, the post-assignment drop,
    the lead pairing, and both integer thresholds exactly."""
    docs = t(spark, sf_dir, "documents")
    kept = C.assign_shards(docs, tokens_per_shard=150).where(
        F.col("doc_id") % 2 == 0
    )
    return C.plan_shard_maintenance(
        C.shard_manifest(kept), tokens_per_shard=150, split_factor=1
    )


SQL_SHARD_PLAN = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS k
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, k,
         CAST(sum(n_tokens) OVER (ORDER BY k, n_tokens
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base),
a AS (
  SELECT doc_id, n_tokens, k, CAST((cum - n_tokens) // 150 AS BIGINT) AS shard_id FROM c),
kept AS (SELECT * FROM a WHERE doc_id % 2 = 0),
man AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         min(k) AS first_key
  FROM kept GROUP BY shard_id),
p AS (
  SELECT shard_id, n_docs, shard_tokens,
         lead(shard_id) OVER (ORDER BY first_key) AS next_shard_id,
         shard_tokens + lead(shard_tokens) OVER (ORDER BY first_key) AS pair_tokens
  FROM man)
SELECT shard_id, n_docs, shard_tokens, next_shard_id,
       CAST(pair_tokens AS BIGINT) AS pair_tokens,
       CASE WHEN shard_tokens > 1 * 150 AND n_docs >= 2 THEN 'split'
            WHEN pair_tokens IS NOT NULL AND pair_tokens * 1 <= 150 * 1
            THEN 'merge_with_next'
            ELSE 'ok' END AS action
FROM p
"""


def q_shard_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE turns of the apply-one/re-plan merge crank
    (operators/curation.merge_min_pair — the per-step arithmetic
    io/sinks.apply_shard_maintenance's merge policy is pinned equal to,
    VERDICT r13 item 2): over the SAME post-dedup shrinkage manifest as
    ext_shard_plan (assignment at budget 150, then a deterministic
    doc_id-parity drop), each turn folds the qualifying adjacent pair
    with the smallest COMBINED token total (ties to the smaller
    first_key) and the next turn re-derives its lead() pairing from the
    folded manifest — the iterated fixpoint arithmetic, driver-proven
    for the loop's first three steps (the unrolled-pagerank precedent;
    full convergence is the production executor's job, pinned against
    the pure greedy replay in tests/test_sinks.py). The scenario holds
    ~40 merge candidates at sf0.001, so every turn folds at every SF —
    no step is a vacuous identity — while merge_min_pair's null-safe
    identity case is pinned separately in tests/test_quality_ops.py.
    Fully declarative: each turn is one manifest-cardinality lead()
    window (the bounded-frame exception), a 1-row min_by broadcast, and
    a bounded filter+aggregate; no corpus row is touched after the
    assignment and no driver-side collect exists anywhere."""
    docs = t(spark, sf_dir, "documents")
    kept = C.assign_shards(docs, tokens_per_shard=150).where(
        F.col("doc_id") % 2 == 0
    )
    man = C.shard_manifest(kept)
    for _ in range(3):
        # per-turn eager cut (r16): each merge layer re-nests the
        # previous turn's window/broadcast/union subtrees, and Catalyst
        # analysis of the 3-deep composition cost ~4.6 s of driver gap
        # against <1 s of execution (UI-REST probe). The manifest is
        # shard-cardinality (tiny); the row is iterative-tagged, so
        # jobs at build are its declared class. Identical rows.
        man = C.merge_min_pair(man, tokens_per_shard=150).localCheckpoint(
            eager=True
        )
    return man


def _merge_step_sql(i: int, tps: int = 150) -> str:
    """One CTE layer replaying merge_min_pair: the lead() pairing over
    m{i}, the min-(comb, first_key) qualifying pair, and the fold into
    m{i+1}. HAVING count(*) > 0 keeps the no-qualifying-pair case an
    identity instead of emitting an all-NULL aggregate row."""
    return f"""
p{i} AS (
  SELECT shard_id AS ksid, first_key,
         lead(shard_id) OVER (ORDER BY first_key) AS dsid,
         shard_tokens + lead(shard_tokens) OVER (ORDER BY first_key) AS comb
  FROM m{i}),
best{i} AS (
  SELECT ksid, dsid FROM p{i}
  WHERE dsid IS NOT NULL AND comb * 1 <= {tps} * 1
  ORDER BY comb ASC, first_key ASC LIMIT 1),
m{i + 1} AS (
  SELECT shard_id, n_docs, shard_tokens, first_key, last_key FROM m{i}
  WHERE shard_id NOT IN (SELECT ksid FROM best{i})
    AND shard_id NOT IN (SELECT dsid FROM best{i})
  UNION ALL
  SELECT CAST((SELECT ksid FROM best{i}) AS BIGINT) AS shard_id,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(sum(shard_tokens) AS BIGINT) AS shard_tokens,
         min(first_key) AS first_key, max(last_key) AS last_key
  FROM m{i}
  WHERE shard_id IN (SELECT ksid FROM best{i})
     OR shard_id IN (SELECT dsid FROM best{i})
  HAVING count(*) > 0)"""


SQL_SHARD_APPLY = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS k
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, k,
         CAST(sum(n_tokens) OVER (ORDER BY k, n_tokens
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base),
a AS (
  SELECT doc_id, n_tokens, k, CAST((cum - n_tokens) // 150 AS BIGINT) AS shard_id FROM c),
kept AS (SELECT * FROM a WHERE doc_id % 2 = 0),
m0 AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         min(k) AS first_key, max(k) AS last_key
  FROM kept GROUP BY shard_id),{_merge_step_sql(0)},{_merge_step_sql(1)},{_merge_step_sql(2)}
SELECT shard_id, n_docs, shard_tokens, first_key, last_key FROM m3
"""


_UP_WEIGHTS = {"src0": 2.5, "src1": 0.4, "src3": 3.0}


def q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    out = C.epoch_upsample(docs, _UP_WEIGHTS)
    return out.groupBy("source", "epoch").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_UP_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {w}" for s, w in sorted(_UP_WEIGHTS.items()))
    + " ELSE 1.0 END"
)

SQL_EPOCH_UPSAMPLE = f"""
WITH base AS (
  SELECT doc_id, source, {_UP_CASE} AS rate,
         {_BUCKET.format(key="doc_id", n=10_000)} AS b
  FROM documents),
n AS (
  SELECT doc_id, source,
         CAST(floor(rate) AS BIGINT)
         + CASE WHEN b < CAST(floor((rate - floor(rate)) * 10000) AS BIGINT)
                THEN 1 ELSE 0 END AS nc
  FROM base),
e AS (SELECT doc_id, source, unnest(range(1, nc + 1)) AS epoch FROM n)
SELECT source, epoch, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM e GROUP BY 1, 2
"""


# --- BPE vocabulary induction ------------------------------------------------

BPE_N_MERGES = 6


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE subword-merge training over the corpus (operators/bpe.py
    bpe_train): 6 merges learned from the distinct-word frequency table.
    Integer counts and exact string ops only, deterministic argmax
    (count DESC, pair ASC), so the oracle — the training loop unrolled
    CTE-per-iteration with the greedy rewrite as a string-accumulator
    ``list_reduce`` — replays the merge table exactly."""
    from token_etl_spark.operators.bpe import bpe_train

    docs = t(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=BPE_N_MERGES)


def _bpe_sql(n: int) -> str:
    blocks = _bpe_cte_blocks(n)
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_idx, l AS left_sym,"
        f" r AS right_sym, c AS pair_count FROM b{i}"
        for i in range(1, n + 1)
    )
    return "WITH " + ",\n".join(blocks) + "\n" + sel


def _bpe_cte_blocks(n: int) -> list:
    """Unrolled BPE training CTEs, one (pair-count, best-pair, rewrite)
    block per merge. MERGE-EXHAUSTION GUARD: when the corpus's natural
    merge count is below ``n``, ``p{i}``/``b{i}`` go empty — the rewrite
    therefore LEFT JOINs the (0-or-1 row) best-pair frame and falls
    through to the unmodified segmentation when it is empty, mirroring
    the engine's ``bpe_train`` early-break: the merge-table oracle emits
    no row for an empty ``b{i}`` (UNION ALL of empties) and the encode/
    pack oracles keep the fully-merged vocabulary instead of emptying
    every downstream CTE through a CROSS JOIN with nothing (equivalence
    on an exhausted corpus pinned in tests/test_bpe.py)."""
    blocks = [
        f"""wd AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY 1),
w0 AS (SELECT word, cnt,
       array_to_string(list_transform(range(1, length(word) + 1),
                       i -> substr(word, CAST(i AS INT), 1)), ' ') AS s
       FROM wd)"""
    ]
    for i in range(1, n + 1):
        blocks.append(
            f"""p{i} AS (
  SELECT split_part(pr, ' ', 1) AS l, split_part(pr, ' ', 2) AS r,
         CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT cnt,
               unnest(list_transform(range(1, len(string_split(s, ' '))),
                      j -> string_split(s, ' ')[j] || ' ' || string_split(s, ' ')[j+1])) AS pr
        FROM w{i-1})
  GROUP BY 1, 2),
b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
w{i} AS (SELECT word, cnt,
         CASE WHEN b.l IS NULL THEN s ELSE
           list_reduce(string_split(s, ' '), (acc, x) -> CASE
             WHEN x = b.r AND regexp_extract(acc, '[^ ]*$') = b.l
             THEN left(acc, length(acc) - length(b.l)) || b.l || b.r
             ELSE acc || ' ' || x END)
         END AS s
         FROM w{i-1} LEFT JOIN b{i} b ON TRUE)"""
        )
    return blocks


def _bpe_encode_sql(n: int) -> str:
    """Encode oracle: the training CTEs' final vocab frame w{n} ALREADY
    holds every distinct word's post-merge segmentation (the training
    loop rewrites the vocabulary each iteration), so encoding is a join
    of the exploded corpus to w{n} — structurally the same
    distinct-words-then-join-back shape as ``bpe_encode_table``."""
    blocks = _bpe_cte_blocks(n)
    blocks.append(f"cw AS (SELECT doc_id, unnest({_TOKS}) AS word FROM documents)")
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT cw.doc_id AS id, cw.word, replace(w.s, ' ', '|') AS pieces
FROM cw JOIN w{n} w USING (word)
"""
    )


SQL_BPE_MERGES = _bpe_sql(BPE_N_MERGES)
SQL_BPE_ENCODE = _bpe_encode_sql(BPE_N_MERGES)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a trained merge table via the
    REALISTIC-SCALE encode path (operators/bpe.py ``bpe_encode_table``:
    rank-greedy segmentation of the DISTINCT-word table in an
    Arrow-batched mapInPandas, joined back to the exploded corpus) —
    the path a 32k-merge production vocabulary must take, now under the
    driver gate. Equivalence with the compiled ``merge_fold`` chain is
    pinned in tests/test_bpe.py; the oracle reads the segmentation
    straight off the unrolled training CTEs' final vocabulary frame.
    ``pieces`` is emitted as a '|'-joined string (the q_array_ops
    driver-hasher convention; unambiguous — tokens are pure [a-z0-9]);
    the raw-array form stays exact-value-tested in tests/test_bpe.py."""
    from token_etl_spark.operators.bpe import bpe_encode_table, bpe_train

    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=BPE_N_MERGES)
    out = bpe_encode_table(docs, merges)
    return out.select("id", "word", F.concat_ws("|", "pieces").alias("pieces"))


# --- tokenizer-aware sequence packing ---------------------------------------

_TOKPACK_BUDGET = 256
_TOKPACK_SHARDS = 8


def q_tokenized_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack training sequences by TRUE subword token counts: BPE-train
    on the corpus, segment every document with ``bpe_encode_table``
    (the realistic-scale encode path), and feed the per-doc piece count
    into ``pack_sequences(token_col=...)`` — the budget a trainer
    actually consumes is tokenizer tokens, not whitespace words, and
    packing by the wrong unit over/under-fills every sequence. Composes
    the round's tokenizer stages with the r2 packer through the
    operator's existing ``token_col`` seam; documents whose text
    tokenizes to nothing pack as 0-token entries (the packer's declared
    NULL/empty rule). Oracle: per-doc piece counts read off the
    unrolled training CTEs' final vocabulary frame, then the
    ext_sequence_pack replay with that count column."""
    from token_etl_spark.operators.bpe import bpe_encode_table, bpe_train
    from token_etl_spark.operators.curation import pack_sequences

    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=BPE_N_MERGES)
    enc = bpe_encode_table(docs, merges)
    ntok = enc.groupBy("id").agg(
        F.sum(F.size("pieces")).cast("long").alias("bpe_tokens")
    )
    base = docs.join(ntok, docs.doc_id == ntok.id, "left").select(
        "doc_id", F.coalesce("bpe_tokens", F.lit(0)).cast("long").alias("bpe_tokens")
    )
    return pack_sequences(
        base,
        budget=_TOKPACK_BUDGET,
        n_shards=_TOKPACK_SHARDS,
        id_col="doc_id",
        token_col="bpe_tokens",
    )


def _tokenized_pack_sql(n: int) -> str:
    blocks = _bpe_cte_blocks(n)
    blocks.append(
        f"""cw AS (SELECT doc_id, unnest({_TOKS}) AS word FROM documents),
nt AS (SELECT cw.doc_id,
              CAST(sum(len(string_split(w.s, ' '))) AS BIGINT) AS n_tokens
       FROM cw JOIN w{n} w USING (word) GROUP BY 1),
alln AS (SELECT d.doc_id, coalesce(nt.n_tokens, 0) AS n_tokens
         FROM documents d LEFT JOIN nt USING (doc_id)),
base AS (
  SELECT doc_id, n_tokens,
         {_BUCKET.format(key="doc_id", n=_TOKPACK_SHARDS)} AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM alln),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY k
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM base)"""
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT doc_id, shard,
       CAST(floor((cum - n_tokens) / {float(_TOKPACK_BUDGET)!r}) AS BIGINT) AS seq_id,
       n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset
FROM c
"""
    )


SQL_TOKENIZED_PACK = _tokenized_pack_sql(BPE_N_MERGES)


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / compression quality signal: per-document
    (n_words, n_pieces, n_chars, pieces_per_word, chars_per_piece) from
    the trained BPE segmentation. Fertility (subword pieces per word)
    and compression (characters per piece) are the standard tokenizer
    health metrics — gibberish, unsupported scripts, and binary-ish text
    segment at near-character fertility and become curation drop
    candidates, which is why a data pipeline computes this corpus-wide.
    Composes train → encode → per-doc aggregate; zero-word documents
    keep NULL ratios (never a division by zero). Oracle reads the
    segmentations off the unrolled training CTEs' vocabulary frame."""
    from token_etl_spark.operators.bpe import bpe_encode_table, bpe_train

    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=BPE_N_MERGES)
    enc = bpe_encode_table(docs, merges)
    # underscore-prefixed aggregate names: the documents table carries
    # its own metadata columns and must not collide in the left join
    stats = enc.groupBy("id").agg(
        F.count("*").cast("long").alias("_nw"),
        F.sum(F.size("pieces")).cast("long").alias("_np"),
        F.sum(F.length("word")).cast("long").alias("_nc"),
    )
    return docs.join(stats, docs.doc_id == stats.id, "left").select(
        "doc_id",
        F.coalesce("_nw", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("_np", F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce("_nc", F.lit(0)).cast("long").alias("n_chars"),
        F.when(
            F.col("_nw") > 0,
            F.round(F.col("_np") / F.col("_nw").cast("double"), 6),
        ).alias("pieces_per_word"),
        F.when(
            F.col("_np") > 0,
            F.round(F.col("_nc") / F.col("_np").cast("double"), 6),
        ).alias("chars_per_piece"),
    )


def _bpe_fertility_sql(n: int) -> str:
    blocks = _bpe_cte_blocks(n)
    blocks.append(
        f"""cw AS (SELECT doc_id, unnest({_TOKS}) AS word FROM documents),
st AS (SELECT cw.doc_id,
              CAST(count(*) AS BIGINT) AS n_words,
              CAST(sum(len(string_split(w.s, ' '))) AS BIGINT) AS n_pieces,
              CAST(sum(len(word)) AS BIGINT) AS n_chars
       FROM cw JOIN w{n} w USING (word) GROUP BY 1)"""
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + """
SELECT d.doc_id,
       coalesce(st.n_words, 0) AS n_words,
       coalesce(st.n_pieces, 0) AS n_pieces,
       coalesce(st.n_chars, 0) AS n_chars,
       CASE WHEN st.n_words > 0
            THEN round(CAST(st.n_pieces AS DOUBLE) / st.n_words, 6) END
         AS pieces_per_word,
       CASE WHEN st.n_pieces > 0
            THEN round(CAST(st.n_chars AS DOUBLE) / st.n_pieces, 6) END
         AS chars_per_piece
FROM documents d LEFT JOIN st USING (doc_id)
"""
    )


SQL_BPE_FERTILITY = _bpe_fertility_sql(BPE_N_MERGES)


# --- end-to-end mixture manifest --------------------------------------------

_MIX_BUDGET = 800
_MIX_PACK = 256
_MIX_SHARDS = 8


def q_mixture_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END mixture build (pipelines/mixture.py build_mixture):
    per-source token budget → epoch upsampling → sequence packing, in
    one composed plan. Each stage is individually oracled elsewhere
    (ext_token_budget / ext_epoch_upsample / ext_sequence_pack); this
    query proves the COMPOSITION — the stages chain through the
    injective doc:epoch copy key and the manifest joins identity back
    losslessly. Decontamination and DSIR selection stay off here (both
    individually oracled; their SQL replays are page-sized) — the CLI
    wires the full pipeline."""
    from token_etl_spark.pipelines.mixture import build_mixture

    docs = t(spark, sf_dir, "documents")
    return build_mixture(
        docs,
        budget_tokens=_MIX_BUDGET,
        weights=_UP_WEIGHTS,
        pack_budget=_MIX_PACK,
        n_shards=_MIX_SHARDS,
    )


SQL_MIXTURE_MANIFEST = f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || 's0') AS bk
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY bk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
  FROM base),
kept AS (SELECT doc_id, source, n_tokens FROM cum WHERE ct - n_tokens < {_MIX_BUDGET}),
rated AS (
  SELECT doc_id, source, n_tokens, {_UP_CASE} AS rate,
         {_BUCKET.format(key="doc_id", n=10_000)} AS b
  FROM kept),
nc AS (
  SELECT doc_id, source, n_tokens,
         CAST(floor(rate) AS BIGINT)
         + CASE WHEN b < CAST(floor((rate - floor(rate)) * 10000) AS BIGINT)
                THEN 1 ELSE 0 END AS n_copies
  FROM rated),
copies AS (
  SELECT doc_id, source, n_tokens, unnest(range(1, n_copies + 1)) AS epoch
  FROM nc),
keyed AS (
  SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens,
         CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR) AS cid
  FROM copies),
sh AS (
  SELECT *, {_BUCKET.format(key="cid", n=_MIX_SHARDS)} AS shard, md5(cid) AS k
  FROM keyed),
pk AS (
  SELECT doc_id, source, epoch, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sh)
SELECT doc_id, source, epoch, shard,
       CAST(floor((cum - n_tokens) / {float(_MIX_PACK)!r}) AS BIGINT) AS seq_id,
       n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset
FROM pk
"""


# --- FULL five-stage mixture: decon → DSIR select → budget → upsample → pack

_MIX_SEL_PCT = 60.0


def q_mixture_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE ``build_mixture`` path under the gate: Bloom
    decontamination → DSIR importance selection (per-source top
    ``_MIX_SEL_PCT``%) → per-source token budget → epoch upsampling →
    sequence packing, one composed plan. ``ext_mixture_manifest`` proves
    the budget→upsample→pack tail; this row adds the two head stages the
    CLI previously wired untested-under-the-gate (r5 verdict item 4).
    The oracle replays all five stages over the same single table: the
    Bloom bitmap bit addressing, the DSIR bucket weights with the
    pinned bucket-order double fold (selection orders on the UNROUNDED
    score — bit-reproducible because every op is exactly-rounded IEEE,
    the same contract ext_importance_weights verifies), then the
    manifest tail verbatim.

    Runs with ``checkpoint_stages=True`` (and is tagged ``iterative``
    accordingly): the five-stage composed plan cost ~3 s of Catalyst
    ANALYSIS against ~0.2 s of execution at sf0.1 — per-stage eager
    checkpoints truncate the plan so each stage analyzes against an
    RDD root (identical rows; see build_mixture's docstring)."""
    from token_etl_spark.pipelines.mixture import build_mixture

    docs = t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    return build_mixture(
        docs,
        benchmark=benchmark,
        use_bloom=True,
        target_sources=IMP_TARGETS,
        select_top_pct=_MIX_SEL_PCT,
        budget_tokens=_MIX_BUDGET,
        weights=_UP_WEIGHTS,
        pack_budget=_MIX_PACK,
        n_shards=_MIX_SHARDS,
        checkpoint_stages=True,
    )


def _mixture_full_sql() -> str:
    from token_etl_spark.plans.curation import (
        _BLOOM_WORDS,
        _SHINGLES,
        _bf_hit,
        _bf_pos,
        BLOOM_K,
    )

    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({_SHINGLES}) AS shingle
  FROM (SELECT {_TOKS} AS tk FROM documents WHERE doc_id % 97 = 0)),
bpos AS (
  SELECT unnest([{", ".join(_bf_pos(r, "shingle") for r in range(BLOOM_K))}]) AS pos
  FROM bench),
bfw AS (
  SELECT pos // 32 AS word, bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM bpos GROUP BY 1),
bfd AS (
  SELECT list_transform(range(0, {_BLOOM_WORDS}),
                        w -> coalesce(bs[list_position(ws, w)], CAST(0 AS BIGINT))) AS bf
  FROM (SELECT list(word ORDER BY word) AS ws, list(bits ORDER BY word) AS bs FROM bfw)),
dsh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)),
contaminated AS (
  SELECT doc_id FROM dsh CROSS JOIN bfd
  WHERE {" AND ".join(_bf_hit(r, "shingle") for r in range(BLOOM_K))}
  GROUP BY 1 HAVING count(*) >= 2),
clean AS (
  SELECT d.doc_id, d.source, d.text FROM documents d
  LEFT JOIN contaminated c USING (doc_id) WHERE c.doc_id IS NULL),
toks AS (SELECT doc_id, source, {_TOKS} AS tk FROM clean),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
  FROM toks),
occ AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(bg), 1, 6) AS BIGINT) % {IMP_BUCKETS} AS bucket
  FROM bg),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN source IN {_IMP_TGT} THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
         CAST(sum(CASE WHEN source IN {_IMP_TGT} THEN 0 ELSE 1 END) AS BIGINT) AS r_b
  FROM occ GROUP BY 1),
tot AS (SELECT CAST(sum(t_b) AS BIGINT) AS t_total,
               CAST(sum(r_b) AS BIGINT) AS r_total FROM stats),
w AS (
  SELECT bucket,
         CAST((t_b + 1) * (r_total + {IMP_BUCKETS}) AS DOUBLE)
         / CAST((r_b + 1) * (t_total + {IMP_BUCKETS}) AS DOUBLE) AS w
  FROM stats CROSS JOIN tot),
dcnt AS (SELECT doc_id, source, bucket, count(*) AS c FROM occ GROUP BY 1, 2, 3),
terms AS (
  SELECT doc_id, source, bucket, c, CAST(c AS DOUBLE) * w AS term
  FROM dcnt JOIN w USING (bucket)),
pd AS (
  SELECT doc_id, source,
         list_aggregate(list(term ORDER BY bucket), 'sum') AS score
  FROM terms GROUP BY 1, 2),
scored AS (
  SELECT cl.doc_id, cl.source, coalesce(pd.score, 0.0) AS score
  FROM clean cl LEFT JOIN pd ON pd.doc_id = cl.doc_id AND pd.source = cl.source),
sel AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS r,
           count(*) OVER (PARTITION BY source) AS n
    FROM scored)
  WHERE r <= CAST(ceil(n * {_MIX_SEL_PCT / 100.0!r}) AS BIGINT)),
base AS (
  SELECT d.doc_id, d.source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(d.doc_id AS VARCHAR) || 's0') AS bk
  FROM clean d JOIN sel USING (doc_id)),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY bk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
  FROM base),
kept AS (SELECT doc_id, source, n_tokens FROM cum WHERE ct - n_tokens < {_MIX_BUDGET}),
rated AS (
  SELECT doc_id, source, n_tokens, {_UP_CASE} AS rate,
         {_BUCKET.format(key="doc_id", n=10_000)} AS b
  FROM kept),
nc AS (
  SELECT doc_id, source, n_tokens,
         CAST(floor(rate) AS BIGINT)
         + CASE WHEN b < CAST(floor((rate - floor(rate)) * 10000) AS BIGINT)
                THEN 1 ELSE 0 END AS n_copies
  FROM rated),
copies AS (
  SELECT doc_id, source, n_tokens, unnest(range(1, n_copies + 1)) AS epoch
  FROM nc),
keyed AS (
  SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens,
         CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR) AS cid
  FROM copies),
shard AS (
  SELECT *, {_BUCKET.format(key="cid", n=_MIX_SHARDS)} AS shard, md5(cid) AS k
  FROM keyed),
pk AS (
  SELECT doc_id, source, epoch, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM shard)
SELECT doc_id, source, epoch, shard,
       CAST(floor((cum - n_tokens) / {float(_MIX_PACK)!r}) AS BIGINT) AS seq_id,
       n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset
FROM pk
"""


SQL_MIXTURE_FULL = _mixture_full_sql()


SPECS = [
    QuerySpec("ext_gopher_quality", q_gopher_quality, SQL_GOPHER_QUALITY, ("curation", "text")),
    QuerySpec("ext_line_filter", q_line_filter, SQL_LINE_FILTER, ("curation", "text")),
    QuerySpec("ext_line_dedup", q_line_dedup, SQL_LINE_DEDUP, ("curation", "text", "dedup")),
    QuerySpec("ext_top_tokens", q_top_tokens, SQL_TOP_TOKENS, ("text", "agg-topk")),
    QuerySpec("ext_hll_distinct", q_hll_distinct, SQL_HLL_DISTINCT, ("sketch", "text", "agg-approx")),
    QuerySpec("ext_bm25_topk", q_bm25_topk, SQL_BM25_TOPK, ("text", "retrieval", "agg-topk")),
    QuerySpec("ext_hybrid_rrf", q_hybrid_rrf, SQL_HYBRID_RRF, ("text", "retrieval", "similarity", "join")),
    QuerySpec("ext_kmv_overlap", q_kmv_overlap, SQL_KMV_OVERLAP, ("sketch", "agg-approx", "setop")),
    QuerySpec("ext_tfidf_terms", q_tfidf_terms, SQL_TFIDF_TERMS, ("text", "agg-topk", "join")),
    QuerySpec("ext_crossdoc_line_dedup", q_crossdoc_line_dedup, SQL_CROSSDOC_LINE_DEDUP, ("text", "dedup")),
    QuerySpec("ext_importance_weights", q_importance_weights, SQL_IMPORTANCE_WEIGHTS, ("curation", "text")),
    QuerySpec("ext_lm_quality", q_lm_quality, SQL_LM_QUALITY, ("curation", "text")),
    QuerySpec("ext_stratified_sample", q_stratified_sample, SQL_STRATIFIED_SAMPLE, ("curation", "window")),
    QuerySpec("ext_table_profile", q_table_profile, SQL_TABLE_PROFILE, ("profile",)),
    QuerySpec("ext_chunk_documents", q_chunk_documents, SQL_CHUNK_DOCUMENTS, ("curation", "text")),
]

#: Kept as a separate list for registry ordering control. As of round 4
#: ext_token_budget heads the driver window via _PRIORITY_NAMES (it was
#: the one never-driver-green query — r3 red on the oracle dtype, since
#: fixed); ext_epoch_upsample was driver-verified green in r3.
MIX_SPECS = [
    QuerySpec("ext_token_budget", q_token_budget, SQL_TOKEN_BUDGET, ("curation", "window")),
    QuerySpec("ext_shard_manifest", q_shard_manifest, SQL_SHARD_MANIFEST, ("curation", "window", "sink")),
    QuerySpec("ext_shard_split", q_shard_split, SQL_SHARD_SPLIT, ("curation", "window", "sink")),
    QuerySpec("ext_shard_merge", q_shard_merge, SQL_SHARD_MERGE, ("curation", "window", "sink")),
    QuerySpec("ext_shard_plan", q_shard_plan, SQL_SHARD_PLAN, ("curation", "window", "sink")),
    QuerySpec("ext_shard_apply", q_shard_apply, SQL_SHARD_APPLY, ("curation", "window", "sink", "iterative")),
    QuerySpec("ext_epoch_upsample", q_epoch_upsample, SQL_EPOCH_UPSAMPLE, ("curation",)),
    QuerySpec("ext_mixture_manifest", q_mixture_manifest, SQL_MIXTURE_MANIFEST, ("curation", "pipeline", "window")),
    QuerySpec("ext_mixture_full", q_mixture_full, SQL_MIXTURE_FULL, ("curation", "pipeline", "window", "sketch", "iterative")),
    QuerySpec("ext_bpe_merges", q_bpe_merges, SQL_BPE_MERGES, ("text", "tokenizer", "iterative")),
    QuerySpec("ext_bpe_encode", q_bpe_encode, SQL_BPE_ENCODE, ("text", "tokenizer", "iterative")),
    QuerySpec("ext_tokenized_pack", q_tokenized_pack, SQL_TOKENIZED_PACK, ("text", "tokenizer", "curation", "window", "iterative")),
    QuerySpec("ext_bpe_fertility", q_bpe_fertility, SQL_BPE_FERTILITY, ("text", "tokenizer", "iterative")),
]
