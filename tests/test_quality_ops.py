"""Unit tests for the quality-gate operators: Gopher document filter,
C4 line filter, exact stratified sampling, single-pass table profile."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from token_etl_spark.operators.curation import (
    epoch_upsample,
    stratified_sample_exact,
    token_budget_cap,
)
from token_etl_spark.operators.profile import profile_table
import pytest

from token_etl_spark.operators.text import chunk_documents, gopher_filter, line_filter


def test_gopher_filter_flags_each_rule(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on a mat and it is fine today ok"),  # clean
            (2, "short text the"),  # too few words
            (3, "zz " * 40),  # mean word len low + no stopwords
            (4, "extraordinarily incomprehensible " * 10 + "the"),  # mean len high
            (5, "the thing ### #### ## is ... odd ... here ... now ok"),  # symbols
        ],
        ["doc_id", "text"],
    )
    out = gopher_filter(
        docs, min_words=5, max_words=50, min_mean_word_len=2.5,
        max_mean_word_len=8.0, max_symbol_ratio=0.2, min_stopword_hits=1,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["keep"] and got[1]["reject_reasons"] == ""
    assert got[2]["reject_reasons"] == "too_few_words"
    assert "mean_word_len_low" in got[3]["reject_reasons"]
    assert "too_few_stopwords" in got[3]["reject_reasons"]
    assert got[4]["reject_reasons"] == "mean_word_len_high"
    assert got[5]["reject_reasons"] == "symbol_ratio_high"
    # reasons are ordered per GOPHER_RULES, not discovery order
    assert got[3]["reject_reasons"] == "mean_word_len_low|too_few_stopwords"


def test_gopher_filter_empty_doc(spark):
    out = gopher_filter(spark.createDataFrame([(1, "")], ["doc_id", "text"]))
    row = out.collect()[0]
    assert row["n_words"] == 0 and not row["keep"]
    assert row["mean_word_len"] == 0.0


def test_line_filter_applies_c4_rules(spark):
    text = "\n".join(
        [
            "this line is long enough and ends well.",  # kept
            "too short.",  # < 5 words
            "this line has no terminal punctuation at all",  # no '.'
            "enable javascript to view this full content page.",  # blocklist
            "a config block follows here { verbose = true }.",  # brace
            "another perfectly reasonable closing sentence stands here.",  # kept
        ]
    )
    out = line_filter(spark.createDataFrame([(1, text)], ["doc_id", "text"]))
    row = out.collect()[0]
    assert row["n_lines"] == 6
    assert row["n_kept"] == 2
    assert row["cleaned"].split("\n") == [
        "this line is long enough and ends well.",
        "another perfectly reasonable closing sentence stands here.",
    ]


def test_stratified_sample_exact_counts_and_determinism(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("src")
    )
    a = stratified_sample_exact(df, "src", k=20, key_col="doc_id", seed="s0")
    counts = {r["src"]: r["n"] for r in a.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {str(i): 20 for i in range(7)}
    # deterministic: same seed → same set; different seed → different set
    b = stratified_sample_exact(df, "src", k=20, key_col="doc_id", seed="s0")
    assert a.exceptAll(b).count() == 0
    c = stratified_sample_exact(df, "src", k=20, key_col="doc_id", seed="s1")
    assert a.drop("sample_rank").exceptAll(c.drop("sample_rank")).count() > 0


def test_stratified_sample_rank_limit_pushed(spark):
    """row_number <= k must plan as WindowGroupLimit (per-task k-heap),
    not a full per-stratum sort feeding a filter."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("src")
    )
    plan = stratified_sample_exact(df, "src", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_token_budget_cap_per_source(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "w " * 10) for i in range(40)],  # 10 tokens each
        ["doc_id", "source", "text"],
    )
    out = token_budget_cap(df, budget_tokens=35)
    rows = out.collect()
    # budget 35, docs of 10 tokens taken in hash order: cum 10,20,30,40 —
    # the 4th doc starts at 30 < 35 so it is kept; the 5th starts at 40
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for src, got in per_src.items():
        assert len(got) == 4, (src, got)
        assert max(r["cum_tokens"] for r in got) == 40
    # deterministic: rerun keeps the identical doc set
    again = token_budget_cap(df, budget_tokens=35)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_token_budget_cap_two_phase_equals_single_window(spark):
    # skewed: one giant source (the 100 TB serialization case the
    # two-phase form exists for) + one small source
    rows = [(i, "big" if i < 3000 else "small", "tok " * (1 + i % 17)) for i in range(3400)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    two_phase = token_budget_cap(df, budget_tokens=5000)  # default: 256-way
    single = token_budget_cap(df, budget_tokens=5000, n_buckets=1)
    a = {(r["doc_id"], r["cum_tokens"]) for r in two_phase.collect()}
    b = {(r["doc_id"], r["cum_tokens"]) for r in single.collect()}
    assert a == b and len(a) > 0
    # the capped source keeps the first boundary-crossing doc ("within
    # one document of budget"); the small source fits entirely
    caps = {r["source"]: r["m"] for r in
            two_phase.groupBy("source").agg(F.max("cum_tokens").alias("m")).collect()}
    assert caps["big"] >= 5000
    assert caps["small"] < 5000
    assert two_phase.filter("source = 'small'").count() == 400  # nothing dropped


def test_token_budget_cap_two_phase_parallelism(spark):
    # the in-bucket cumsum window must partition on (source, bucket),
    # not source alone — assert the executed plan's window spec
    df = spark.createDataFrame(
        [(i, "only", "w " * 5) for i in range(500)], ["doc_id", "source", "text"]
    )
    out = token_budget_cap(df, budget_tokens=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan, plan  # two-phase window key present


def test_top_tokens_two_phase_equivalence(spark):
    """The two-phase top-k (per-hash-bucket row_number <= K prefilter,
    then global rank over <= K x BUCKETS survivors) must return exactly
    the single-phase global rank's answer — any global top-K member is
    top-K within its bucket, so the prefilter never drops a winner."""
    from pyspark.sql import Window

    from token_etl_spark.plans import quality as Q
    from token_etl_spark.plans.base import load_table
    from token_etl_spark.operators import text as X

    sf_dir = "/root/testdata/sf0.001"
    two_phase = Q.q_top_tokens(spark, sf_dir).collect()

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    single = (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= Q.TOP_TOKENS_K)
        .select("rank", "token", "n")
        .collect()
    )
    assert sorted(map(tuple, two_phase)) == sorted(map(tuple, single))
    # sf0.001's synthetic vocabulary is smaller than K; the result is the
    # whole ranked vocabulary in that case.
    assert 0 < len(two_phase) <= Q.TOP_TOKENS_K


def test_top_tokens_plan_has_bucketed_prefilter(spark):
    """Scale guard: the single-partition global window must rank only the
    bucket survivors, never the full vocabulary — the physical plan has
    to show a bucket-partitioned row_number window feeding the global
    one (r3 verdict 'What's wrong' #2)."""
    from token_etl_spark.plans import quality as Q

    plan = Q.q_top_tokens(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    # two Window operators: the bucket-partitioned prefilter and the
    # global rank; the prefilter's partition spec mentions the bucket.
    assert plan.count("Window") >= 2, plan
    assert "bucket" in plan, plan


def test_epoch_upsample_copy_counts(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 4)) for i in range(2000)], ["doc_id", "source"]
    )
    out = epoch_upsample(df, {"s0": 2.0, "s1": 0.0, "s2": 0.5, "s3": 2.5})
    counts = {
        (r["source"], r["epoch"]): r["n"]
        for r in out.groupBy("source", "epoch").agg(F.count("*").alias("n")).collect()
    }
    # integer weights: every doc exactly w copies
    assert counts[("s0", 1)] == 500 and counts[("s0", 2)] == 500
    assert ("s0", 3) not in counts
    # weight 0: source dropped entirely
    assert not any(src == "s1" for src, _ in counts)
    # fractional: epoch-1 full, epoch-2 absent, ~half via hash threshold
    assert 200 < counts[("s2", 1)] < 300
    assert ("s2", 2) not in counts
    assert counts[("s3", 1)] == 500 and counts[("s3", 2)] == 500
    assert 200 < counts[("s3", 3)] < 300
    # per-doc copies are consecutive epochs starting at 1
    eps = out.where("source = 's3'").groupBy("doc_id").agg(
        F.max("epoch").alias("mx"), F.count("*").alias("n")
    )
    assert eps.where("mx != n").count() == 0


def test_chunk_documents_windows_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, words), (2, "a b"), (3, "")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=4, overlap=2)  # stride 2
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: ceil((10-4)/2)+1 = 4 chunks at starts 0,2,4,6
    ones = sorted(k for k in rows if k[0] == 1)
    assert ones == [(1, i) for i in range(4)]
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
    assert rows[(1, 3)]["chunk_text"] == "w6 w7 w8 w9"
    assert rows[(1, 3)]["n_tokens"] == 4
    # short doc: exactly one (ragged) chunk
    assert rows[(2, 0)]["chunk_text"] == "a b" and rows[(2, 0)]["n_tokens"] == 2
    assert (2, 1) not in rows
    # empty doc: one empty chunk, not zero rows (caller can filter)
    assert rows[(3, 0)]["chunk_text"] == "" and rows[(3, 0)]["n_tokens"] == 0
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_ragged_tail_boundary(spark):
    # 7 tokens, chunk 4 stride 2 → ceil(3/2)+1 = 3 chunks; last is ragged
    df = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    got = {r["chunk_id"]: (r["chunk_text"], r["n_tokens"]) for r in out}
    assert got == {0: ("a b c d", 4), 1: ("c d e f", 4), 2: ("e f g", 3)}


def test_profile_table_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x", c=None),
            Row(a=2, b="y", c=1.5),
            Row(a=2, b=None, c=2.5),
            Row(a=None, b="x", c=2.5),
        ]
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"a", "b", "c"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert (prof["a"]["n_nulls"], prof["a"]["n_distinct"]) == (1, 2)
    assert (prof["b"]["n_nulls"], prof["b"]["n_distinct"]) == (1, 2)
    assert (prof["c"]["n_nulls"], prof["c"]["n_distinct"]) == (1, 2)
    assert prof["a"]["min_val"] == "1" and prof["a"]["max_val"] == "2"
    assert prof["b"]["min_val"] == "x" and prof["b"]["max_val"] == "y"


def test_profile_table_single_scan(spark):
    """The profile must read the table once — one Aggregate over one
    scan (Expand handles the multi-distinct), no union of per-column
    subplans."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 3).alias("b")
    )
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Range") == 1


def test_validate_constraint_semantics(spark):
    """Deequ-style validate (operators/profile.py): each check kind's
    metric and pass/fail on a frame with known violations, computed in
    ONE aggregation pass (plan has a single Aggregate over the scan)."""
    import io, contextlib
    from token_etl_spark.operators import profile as P

    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "b", None),
        (4, None, 40.0),
        (4, "c", 50.0),  # duplicate id
    ]
    df = spark.createDataFrame(rows, ["id", "cat", "v"])
    out = {
        (r["check_name"], r["col_name"]): r
        for r in P.validate(
            df,
            [
                P.check_completeness("cat", 1.0),
                P.check_completeness("v", 0.5),
                P.check_uniqueness("id", 1.0),
                P.check_min("v", 5.0),
                P.check_max("v", 45.0),
                P.check_values_in("cat", ("a", "b"), 0.5),
                P.check_row_count(5),
            ],
        ).collect()
    }
    assert out[("completeness", "cat")]["metric"] == 0.8
    assert not out[("completeness", "cat")]["passed"]
    assert out[("completeness", "v")]["metric"] == 0.8
    assert out[("completeness", "v")]["passed"]
    assert out[("uniqueness", "id")]["metric"] == 0.8
    assert not out[("uniqueness", "id")]["passed"]
    assert out[("min_bound", "v")]["metric"] == 10.0
    assert out[("min_bound", "v")]["passed"]
    assert out[("max_bound", "v")]["metric"] == 50.0
    assert not out[("max_bound", "v")]["passed"]
    assert out[("values_in", "cat")]["metric"] == 0.6  # 3 of 5 (null + 'c' fail)
    assert out[("values_in", "cat")]["passed"]
    assert out[("row_count", "*")]["metric"] == 5.0
    assert out[("row_count", "*")]["passed"]

    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        P.validate(df, [P.check_completeness("cat"), P.check_min("v", 0.0)]).explain(
            "formatted"
        )
    # one scan feeding one aggregate chain — no join, no union of scans
    plan = plan_buf.getvalue()
    assert "Union" not in plan and "Join" not in plan


def test_zscore_outliers_hand_computed(spark):
    """Group g: values 0,0,0,0,10 -> mean 2, sd sqrt(20)=4.472...;
    only the 10 crosses threshold 1.5 (z = 8/4.472 = 1.789)."""
    from token_etl_spark.operators.profile import zscore_outliers

    rows = [("g", float(v)) for v in (0, 0, 0, 0, 10)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = zscore_outliers(df, "v", ["grp"], threshold=1.5).collect()
    flagged = [r for r in out if r["is_outlier"]]
    assert len(flagged) == 1 and flagged[0]["v"] == 10.0
    assert abs(flagged[0]["z"] - 8.0 / 20 ** 0.5) < 1e-12
    assert all(not r["is_outlier"] for r in out if r["v"] == 0.0)


def test_zscore_outliers_degenerate_groups_flag_nothing(spark):
    """Constant groups (sd=0) and singletons (sd NULL) must yield z NULL
    and is_outlier false — never a division error, never a flag."""
    from token_etl_spark.operators.profile import zscore_outliers

    rows = [("const", 5.0), ("const", 5.0), ("lone", 99.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = zscore_outliers(df, "v", ["grp"], threshold=0.1).collect()
    assert all(r["z"] is None and r["is_outlier"] is False for r in out)


def test_mad_outliers_hand_computed_and_resists_masking(spark):
    """Values 1..9 plus 1000: median 5.5, MAD 2.5 -> robust_z(1000) =
    994.5/(1.4826*2.5) ~ 268, flagged. The plain z-score screen at the
    same nominal 3.5 misses it (the 1000 inflates sd to ~314, z ~ 2.9)
    — the masking failure the robust screen exists for."""
    from token_etl_spark.operators.profile import mad_outliers, zscore_outliers

    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])

    robust = mad_outliers(df, "v", ["grp"], threshold=3.5).collect()
    flagged = [r for r in robust if r["is_outlier"]]
    assert [r["v"] for r in flagged] == [1000.0]
    assert abs(flagged[0]["robust_z"] - 994.5 / (1.4826 * 2.5)) < 1e-9

    plain = zscore_outliers(df, "v", ["grp"], threshold=3.5).collect()
    assert not any(r["is_outlier"] for r in plain)


def test_mad_outliers_degenerate_mad_flags_nothing(spark):
    """A group where over half the values sit at one point has MAD 0 —
    robust_z NULL, nothing flagged (no division blowup)."""
    from token_etl_spark.operators.profile import mad_outliers

    rows = [("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 9.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = mad_outliers(df, "v", ["grp"], threshold=0.5).collect()
    assert all(r["robust_z"] is None and r["is_outlier"] is False for r in out)


# --- training-shard export: assign_shards + shard_manifest -------------------


def test_assign_shards_two_phase_equals_single_window(spark):
    from token_etl_spark.operators.curation import assign_shards

    df = spark.createDataFrame(
        [(i, "tok " * (1 + i % 23)) for i in range(3000)], ["doc_id", "text"]
    )
    two = assign_shards(df, tokens_per_shard=500)
    one = assign_shards(df, tokens_per_shard=500, n_buckets=1)
    a = {(r["doc_id"], r["shard_id"]) for r in two.collect()}
    b = {(r["doc_id"], r["shard_id"]) for r in one.collect()}
    assert a == b and len(a) == 3000


def test_assign_shards_balanced_and_lossless(spark):
    """Every shard except possibly the last lands within one document of
    its token budget (start-offset convention), nothing is lost, and the
    assignment is rerun-stable."""
    from token_etl_spark.operators.curation import assign_shards, shard_manifest

    df = spark.createDataFrame(
        [(i, "w " * (5 + i % 11)) for i in range(800)], ["doc_id", "text"]
    )
    assigned = assign_shards(df, tokens_per_shard=300)
    man = {r["shard_id"]: r for r in shard_manifest(assigned).collect()}
    total = sum(r["shard_tokens"] for r in man.values())
    assert total == sum(5 + i % 11 for i in range(800))
    assert sum(r["n_docs"] for r in man.values()) == 800
    max_doc = 15  # largest document in this fixture
    last = max(man)
    assert set(man) == set(range(last + 1))  # dense ids (no giant docs)
    for sid, r in man.items():
        if sid != last:
            # shard spans [sid*300, (sid+1)*300): it holds every doc
            # starting there, so tokens >= 300 - (max_doc - 1) and the
            # overshoot is < one document
            assert 300 - max_doc < r["shard_tokens"] < 300 + max_doc
    again = assign_shards(df, tokens_per_shard=300)
    assert assigned.select("doc_id", "shard_id").exceptAll(
        again.select("doc_id", "shard_id")
    ).count() == 0


def test_assign_shards_giant_doc_owns_oversized_shard(spark):
    """A document larger than tokens_per_shard owns its shard; the next
    document starts in a later window, so shard ids may skip — the
    documented semantics (no document is ever split)."""
    from token_etl_spark.operators.curation import assign_shards, shard_manifest

    df = spark.createDataFrame(
        [(1, "w " * 10), (2, "w " * 950), (3, "w " * 10), (4, "w " * 10)],
        ["doc_id", "text"],
    )
    man = shard_manifest(assign_shards(df, tokens_per_shard=100)).collect()
    by_id = {r["shard_id"]: r for r in man}
    giant = [r for r in man if r["shard_tokens"] >= 950]
    assert len(giant) == 1 and giant[0]["n_docs"] in (1, 2, 3)
    # total ids span > total_tokens/100 shards only if ids skipped; either
    # way totals are lossless
    assert sum(r["shard_tokens"] for r in man) == 980
    assert sum(r["n_docs"] for r in man) == 4
    assert len(by_id) == len(man)  # shard ids unique


def test_shard_manifest_ranges_partition_the_key_space(spark):
    """The manifest's [first_key, last_key] ranges are disjoint and
    ordered by shard_id — the property that lets an incremental export
    route a document to its shard by key alone."""
    from token_etl_spark.operators.curation import assign_shards, shard_manifest

    df = spark.createDataFrame(
        [(i, "w " * (3 + i % 7)) for i in range(500)], ["doc_id", "text"]
    )
    assigned = assign_shards(df, tokens_per_shard=200)
    man = sorted(shard_manifest(assigned).collect(), key=lambda r: r["shard_id"])
    for r in man:
        assert r["first_key"] <= r["last_key"]
    for prev, nxt in zip(man, man[1:]):
        assert prev["last_key"] < nxt["first_key"]
    # every document's key falls inside its own shard's range
    for r in assigned.select("ord_key", "shard_id").collect():
        m = man[[x["shard_id"] for x in man].index(r["shard_id"])]
        assert m["first_key"] <= r["ord_key"] <= m["last_key"]


def test_route_to_shards_roundtrip_identity(spark):
    """Routing a corpus through its OWN manifest reproduces the original
    assignment exactly — the property that makes incremental export
    sound (a document's shard is decidable from its key + the manifest,
    no global recomputation)."""
    from token_etl_spark.operators.curation import (
        assign_shards,
        route_to_shards,
        shard_manifest,
    )

    df = spark.createDataFrame(
        [(i, "w " * (4 + i % 9)) for i in range(600)], ["doc_id", "text"]
    )
    assigned = assign_shards(df, tokens_per_shard=250)
    man = shard_manifest(assigned)
    routed = route_to_shards(df, man)
    orig = {(r["doc_id"], r["shard_id"]) for r in assigned.collect()}
    got = {(r["doc_id"], r["shard_id"]) for r in routed.collect()}
    assert got == orig and len(got) == 600


def test_route_to_shards_gap_and_prepend_semantics(spark):
    """Keys between two shard ranges go to the PRECEDING shard; keys
    before every range prepend to the first shard — hand fixture with a
    synthetic manifest so the boundaries are explicit."""
    from pyspark.sql import Row

    from token_etl_spark.operators.curation import route_to_shards

    man = spark.createDataFrame(
        [
            Row(shard_id=0, n_docs=1, shard_tokens=1, first_key="4000", last_key="7fff"),
            Row(shard_id=1, n_docs=1, shard_tokens=1, first_key="9000", last_key="bfff"),
        ]
    )
    docs = spark.createDataFrame([(i,) for i in range(400)], ["doc_id"])
    routed = route_to_shards(docs, man)
    rows = routed.collect()
    assert len(rows) == 400
    for r in rows:
        k = r["ord_key"]
        if k < "4000":
            assert r["shard_id"] == 0, (k, r["shard_id"])  # prepend
        elif k < "9000":
            assert r["shard_id"] == 0, (k, r["shard_id"])  # in range 0 or the gap after it
        else:
            assert r["shard_id"] == 1, (k, r["shard_id"])
    # coverage: the fixture actually exercised all three regions
    ks = sorted(r["ord_key"] for r in rows)
    assert ks[0] < "4000" and ks[-1] > "9000"


def test_route_to_shards_plan_is_bucket_parallel(spark):
    """The as-of fill must window per _bkt (256-way parallel), never a
    global-order window over the corpus."""
    from token_etl_spark.operators.curation import (
        assign_shards,
        route_to_shards,
        shard_manifest,
    )

    df = spark.createDataFrame(
        [(i, "w " * 5) for i in range(300)], ["doc_id", "text"]
    )
    man = shard_manifest(assign_shards(df, tokens_per_shard=100))
    plan = route_to_shards(df, man)._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan


def test_assign_shards_precomputed_token_col_no_collision(spark):
    """token_col='n_tokens' (the natural precomputed-count usage) must
    not produce a duplicate n_tokens column — review-found r11."""
    from token_etl_spark.operators.curation import assign_shards, shard_manifest

    df = spark.createDataFrame(
        [(i, 7) for i in range(100)], ["doc_id", "n_tokens"]
    )
    assigned = assign_shards(df, tokens_per_shard=50, token_col="n_tokens")
    assert assigned.columns.count("n_tokens") == 1
    man = shard_manifest(assigned)
    assert sum(r["shard_tokens"] for r in man.collect()) == 700


def test_route_to_shards_replaces_existing_shard_id(spark):
    """Re-routing rows that already carry shard_id/ord_key must replace
    those columns, not duplicate them — review-found r11."""
    from token_etl_spark.operators.curation import (
        assign_shards,
        route_to_shards,
        shard_manifest,
    )

    df = spark.createDataFrame(
        [(i, "w " * 6) for i in range(200)], ["doc_id", "text"]
    )
    assigned = assign_shards(df, tokens_per_shard=120)
    man = shard_manifest(assigned)
    rerouted = route_to_shards(assigned, man)  # input HAS shard_id + ord_key
    assert rerouted.columns.count("shard_id") == 1
    assert rerouted.columns.count("ord_key") == 1
    a = {(r["doc_id"], r["shard_id"]) for r in assigned.collect()}
    b = {(r["doc_id"], r["shard_id"]) for r in rerouted.collect()}
    assert a == b


def test_route_to_shards_empty_manifest_raises(spark):
    """An empty manifest must fail loudly in-plan, never emit NULL
    shard_ids — review-found r11."""
    import pytest

    from token_etl_spark.operators.curation import route_to_shards, shard_manifest
    from token_etl_spark.operators.curation import assign_shards

    df = spark.createDataFrame([(1, "w " * 5)], ["doc_id", "text"])
    man = shard_manifest(assign_shards(df, tokens_per_shard=10)).filter("shard_id < 0")
    with pytest.raises(Exception, match="empty manifest"):
        route_to_shards(df, man).collect()


def test_split_shard_rows_token_midpoint_and_fallback(spark):
    """split_shard_rows: the boundary is the first document STARTING at
    or past half the shard's tokens; a giant trailing document (no
    interior start past the midpoint) falls back to the doc-count
    midpoint; both halves are always non-empty for n >= 2."""
    from token_etl_spark.operators.curation import split_shard_rows

    def mk(rows):
        return spark.createDataFrame(rows, "ord_key string, n_tokens long")

    # tokens 10,10,10,10 → total 40, midpoint 20 → rows 3,4 move
    even = mk([(f"k{i}", 10) for i in range(1, 5)])
    got = {
        r["ord_key"]: r["shard_id"]
        for r in split_shard_rows(even, 7, 99).collect()
    }
    assert got == {"k1": 7, "k2": 7, "k3": 99, "k4": 99}

    # giant trailing doc: starts at 10 < 55 = total/2 → no token
    # boundary → doc-count midpoint (n=2 → second row moves)
    giant = mk([("a", 10), ("b", 100)])
    got = {
        r["ord_key"]: r["shard_id"]
        for r in split_shard_rows(giant, 7, 99).collect()
    }
    assert got == {"a": 7, "b": 99}

    # giant LEADING doc: row 2 starts at 100 >= 55 → token boundary
    lead = mk([("a", 100), ("b", 10)])
    got = {
        r["ord_key"]: r["shard_id"]
        for r in split_shard_rows(lead, 7, 99).collect()
    }
    assert got == {"a": 7, "b": 99}


def test_plan_shard_maintenance_branches(spark):
    """The policy observable: over-budget multi-doc shards say 'split',
    a 1-doc giant never does (no document is ever cut), adjacent
    sliver pairs say 'merge_with_next' (overlaps allowed — apply one,
    re-audit, repeat), everything else 'ok'; pair columns NULL on the
    last shard."""
    from token_etl_spark.operators.curation import plan_shard_maintenance

    man = spark.createDataFrame(
        [
            # (shard_id, n_docs, shard_tokens, first_key, last_key)
            (0, 5, 2500, "a", "b"),   # over 2x budget, splittable
            (1, 1, 9000, "c", "d"),   # giant but 1 doc → never split
            (2, 2, 300, "e", "f"),    # sliver; 2+3 fit one budget
            (3, 2, 400, "g", "h"),    # sliver; 3+4 fit too (overlap ok)
            (4, 3, 500, "i", "j"),    # last: pair NULL, ok
        ],
        "shard_id long, n_docs long, shard_tokens long, first_key string, last_key string",
    )
    got = {
        r["shard_id"]: r
        for r in plan_shard_maintenance(man, tokens_per_shard=1000).collect()
    }
    assert got[0]["action"] == "split"
    assert got[1]["action"] == "ok"
    assert got[2]["action"] == "merge_with_next" and got[2]["next_shard_id"] == 3
    assert got[2]["pair_tokens"] == 700
    assert got[3]["action"] == "merge_with_next" and got[3]["pair_tokens"] == 900
    assert got[4]["action"] == "ok"
    assert got[4]["next_shard_id"] is None and got[4]["pair_tokens"] is None
    # fractional merge budget via integer cross-multiplication: 1/2
    tight = {
        r["shard_id"]: r["action"]
        for r in plan_shard_maintenance(
            man, tokens_per_shard=1000, merge_budget_num=1, merge_budget_den=2
        ).collect()
    }
    assert tight[2] == "ok" and tight[3] == "ok"  # 700/900 > 500


def test_merge_min_pair_step_and_identity(spark):
    """One declarative turn of the merge crank: folds the qualifying
    adjacent pair with the smallest combined tokens (ties to the
    smaller first_key), IDENTITY when no pair fits (the null-safe case
    that lets ext_shard_apply chain steps without collect), and two
    chained steps match two turns of the pure greedy replay."""
    from token_etl_spark.operators.curation import merge_min_pair

    man = spark.createDataFrame(
        [
            (0, 2, 300, "a", "b"),   # 0+1 = 700 (the min pair)
            (1, 2, 400, "c", "d"),   # 1+2 = 900
            (2, 3, 500, "e", "f"),   # 2+3 = 2500, over budget
            (3, 4, 2000, "g", "h"),
        ],
        "shard_id long, n_docs long, shard_tokens long, first_key string, last_key string",
    )
    one = {r["shard_id"]: r for r in merge_min_pair(man, 1000).collect()}
    assert set(one) == {0, 2, 3}
    assert one[0]["n_docs"] == 4 and one[0]["shard_tokens"] == 700
    assert one[0]["first_key"] == "a" and one[0]["last_key"] == "d"
    assert one[2]["shard_tokens"] == 500  # untouched

    # second turn: 0(700)+2(500)=1200 > 1000 → nothing fits → identity
    two = spark.createDataFrame(list(one.values())).select(man.columns)
    again = {r["shard_id"]: r.asDict() for r in merge_min_pair(two, 1000).collect()}
    assert again == {r["shard_id"]: r.asDict() for r in two.collect()}

    # tie on combined tokens breaks to the smaller first_key
    tie = spark.createDataFrame(
        [(0, 1, 100, "a", "b"), (1, 1, 100, "c", "d"),
         (2, 1, 100, "e", "f"), (3, 1, 100, "g", "h")],
        "shard_id long, n_docs long, shard_tokens long, first_key string, last_key string",
    )
    t = {r["shard_id"]: r for r in merge_min_pair(tie, 1000).collect()}
    assert set(t) == {0, 2, 3} and t[0]["shard_tokens"] == 200


def test_split_shard_rows_tied_keys_never_separate(spark):
    """Duplicate ord_keys at the would-be boundary move as one block:
    the boundary snaps forward to the next strict key increase, so the
    halves' key ranges stay disjoint no matter how the window orders
    tied rows (ADVICE r12 — an un-tiebroken boundary at a tie could
    make the new shard's first_key equal the old shard's last_key)."""
    from token_etl_spark.operators.curation import split_shard_rows

    # total 40, midpoint 20 → the plain boundary would be row 3, but
    # rows 2-3 tie on (ord_key, n_tokens): the tie run moves whole
    tied = spark.createDataFrame(
        [(0, "k1", 10), (1, "k2", 10), (2, "k2", 10), (3, "k3", 10)],
        "doc_id long, ord_key string, n_tokens long",
    )
    got = split_shard_rows(tied, 7, 99).collect()
    by_key: dict[str, set[int]] = {}
    for r in got:
        by_key.setdefault(r["ord_key"], set()).add(r["shard_id"])
    # every key lands wholly in one shard ⇒ ranges disjoint
    assert all(len(s) == 1 for s in by_key.values()), by_key
    assert by_key["k1"] == {7} and by_key["k2"] == {7} and by_key["k3"] == {99}
    old_keys = {r["ord_key"] for r in got if r["shard_id"] == 7}
    new_keys = {r["ord_key"] for r in got if r["shard_id"] == 99}
    assert max(old_keys) < min(new_keys)

    # a trailing tie run with no strict increase after the midpoint
    # falls back to the LAST run start (halves stay non-empty+disjoint)
    trail = spark.createDataFrame(
        [(0, "k1", 10), (1, "k2", 10), (2, "k2", 10), (3, "k2", 10)],
        "doc_id long, ord_key string, n_tokens long",
    )
    got = {r["doc_id"]: r["shard_id"] for r in split_shard_rows(trail, 7, 99).collect()}
    assert got == {0: 7, 1: 99, 2: 99, 3: 99}


def test_split_shard_rows_single_key_run_refuses(spark):
    """A shard whose rows ALL share one ord_key cannot split into
    disjoint key ranges — the in-plan assertion fails loudly instead
    of emitting overlapping shards."""
    import pytest

    from token_etl_spark.operators.curation import split_shard_rows

    onekey = spark.createDataFrame(
        [(i, "samekey", 10) for i in range(4)],
        "doc_id long, ord_key string, n_tokens long",
    )
    with pytest.raises(Exception, match="shares one ord_key"):
        split_shard_rows(onekey, 7, 99).collect()


def test_assign_shards_null_key_raises(spark):
    """A NULL key must fail loudly in BOTH cumsum paths — the two-phase
    offsets join used to silently drop the row — review-found r11."""
    import pytest

    from token_etl_spark.operators.curation import assign_shards

    df = spark.createDataFrame(
        [(1, "w " * 5), (None, "w " * 5)], "doc_id long, text string"
    )
    for nb in (1, 256):
        with pytest.raises(Exception, match="NULL doc_id"):
            assign_shards(df, tokens_per_shard=10, n_buckets=nb).collect()


def test_route_to_shards_null_key_raises(spark):
    import pytest

    from token_etl_spark.operators.curation import (
        assign_shards,
        route_to_shards,
        shard_manifest,
    )

    good = spark.createDataFrame([(1, "w " * 5)], "doc_id long, text string")
    man = shard_manifest(assign_shards(good, tokens_per_shard=10))
    bad = spark.createDataFrame([(None, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        route_to_shards(bad, man).collect()


def test_assign_shards_duplicate_keys_deterministic(spark):
    """Duplicate keys (identical md5 order positions) with DIFFERENT
    token counts must still produce run-stable shard boundaries — the
    n_tokens tiebreak, review-found r11."""
    from token_etl_spark.operators.curation import assign_shards

    rows = [(i, "w " * (3 + i % 5)) for i in range(200)]
    rows += [(7, "w " * 40), (7, "w " * 2)]  # duplicate key, unequal sizes
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = assign_shards(df, tokens_per_shard=80)
    b = assign_shards(df, tokens_per_shard=80)
    got_a = sorted((r["doc_id"], r["n_tokens"], r["shard_id"]) for r in a.collect())
    got_b = sorted((r["doc_id"], r["n_tokens"], r["shard_id"]) for r in b.collect())
    assert got_a == got_b and len(got_a) == 202
    one = assign_shards(df, tokens_per_shard=80, n_buckets=1)
    got_one = sorted((r["doc_id"], r["n_tokens"], r["shard_id"]) for r in one.collect())
    assert got_one == got_a  # both paths share the tiebreak


def test_route_to_shards_quoted_column_names(spark):
    """Payload struct casting must survive column names that need
    quoting (crawl metadata like 'content-type') — the simpleString
    DDL round-trip used to break; review-found r11."""
    from token_etl_spark.operators.curation import (
        assign_shards,
        route_to_shards,
        shard_manifest,
    )

    base = spark.createDataFrame(
        [(i, "w " * 4) for i in range(50)], ["doc_id", "text"]
    )
    man = shard_manifest(assign_shards(base, tokens_per_shard=40))
    docs = base.withColumnRenamed("text", "content-type")
    out = route_to_shards(docs, man)
    assert out.count() == 50 and "content-type" in out.columns
