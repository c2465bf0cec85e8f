from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.pipelines.corpus import corpus_summary, prepare_corpus

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "THE  quick   brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (3, "completely different content about spark query engines and shuffle planning"),
    (4, "x"),                                   # too short → quality drop
    (5, "1 2 3 4 5 6 7 8 9"),                   # alpha_ratio 0 → quality drop
]


def test_prepare_corpus_decisions(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    d = {r["doc_id"]: r for r in prepare_corpus(docs, jaccard_threshold=0.5).collect()}
    assert len(d) == 6                      # every input doc gets a decision
    assert not d[4]["passed_quality"] and not d[4]["keep"]
    assert not d[5]["passed_quality"] and not d[5]["keep"]
    assert d[2]["is_exact_dup"] and not d[2]["keep"]   # exact copy of 0
    assert d[1]["is_near_dup"] and not d[1]["keep"]    # near-dup, 0 is the rep
    assert d[0]["keep"] and d[3]["keep"]


def test_corpus_summary_accounting(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    decisions = prepare_corpus(docs, jaccard_threshold=0.5)
    s = corpus_summary(decisions).collect()[0]
    assert s["n_docs"] == 6
    assert s["n_kept"] == 2
    assert s["n_quality_dropped"] == 2
    assert s["n_exact_dups"] == 1
    assert s["n_near_dups"] == 1
    assert 0 < s["kept_est_tokens"] <= s["total_est_tokens"]


def test_prepare_corpus_default_survives_giant_near_dup_cluster(spark):
    """A 500-member NEAR-dup cluster (template + unique suffix, so exact
    dedup can NOT collapse it) must flow through the default pipeline:
    the star-edge cluster form emits O(k) LSH edges where the pair form
    emits k(k-1)/2 ≈ 125k. Exactly one template instance survives."""
    base = (
        "shared boilerplate template text that repeats across many scraped "
        "pages with navigation header footer copyright notice and contact "
        "information all identical between the page instances"
    )
    rows = [(i, f"{base} unique page token page{i}") for i in range(500)]
    rows += [(1000 + i, f"genuinely distinct document number {i} about topic "
              f"{'alpha beta gamma delta epsilon'.split()[i]} with its own words") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = {r["doc_id"]: r for r in prepare_corpus(docs, jaccard_threshold=0.6).collect()}
    cluster_kept = [i for i in range(500) if d[i]["keep"]]
    assert cluster_kept == [0]  # min-id representative only
    assert sum(1 for i in range(500) if d[i]["is_near_dup"]) == 499
    for i in range(1000, 1005):
        assert d[i]["keep"], i


def test_prepare_corpus_large_cluster_form_agrees(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    base = {
        r["doc_id"]: (r["keep"], r["is_near_dup"])
        for r in prepare_corpus(docs, jaccard_threshold=0.5).collect()
    }
    star = {
        r["doc_id"]: (r["keep"], r["is_near_dup"])
        for r in prepare_corpus(
            docs, jaccard_threshold=0.5, large_clusters=True
        ).collect()
    }
    assert base == star


def test_prepare_corpus_dedup_lines_stage(spark):
    # doc 10: a line repeated 3x — with dedup_lines the cleaned text
    # becomes an exact duplicate of doc 11, so the digest stage collapses
    # them; without it they are merely near-dups at best
    line = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [(10, "\n".join([line] * 3)), (11, line)], ["doc_id", "text"]
    )
    with_stage = {
        r["doc_id"]: r
        for r in prepare_corpus(docs, jaccard_threshold=0.5, dedup_lines=True).collect()
    }
    assert with_stage[10]["keep"] is True  # min doc_id wins the digest group
    assert with_stage[11]["is_exact_dup"] is True and with_stage[11]["keep"] is False
    without = {
        r["doc_id"]: r for r in prepare_corpus(docs, jaccard_threshold=0.5).collect()
    }
    assert without[11]["is_exact_dup"] is False  # raw texts differ


def test_prepare_corpus_span_stage(spark):
    """dedup_spans=True: cross-document boilerplate is cut before the
    quality gate, so exact copies of a long doc collapse to (near-)empty
    text and fail min_tokens instead of surviving to the dedup stages;
    the corpus-first copy keeps its full text and passes."""
    from token_etl_spark.pipelines.corpus import prepare_corpus

    long_text = " ".join(f"tok{i}" for i in range(40))
    fillers = ["apple banana cherry", "delta echo foxtrot", "maple willow cedar"]
    rows = [(1, long_text), (2, long_text), (3, long_text)] + [
        (10 + i, f"unique document variant {fillers[i]} with its own distinct "
                 f"prose about {fillers[i]} topics and plenty {fillers[i]} of "
                 f"ordinary words flowing naturally onward {fillers[i]} until the end")
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in prepare_corpus(
        df, min_tokens=5, dedup_spans=True, span_k=8
    ).collect()}
    assert out[1].passed_quality and out[1].keep
    for i in (2, 3):
        assert not out[i].passed_quality  # span-rewritten to empty
        assert not out[i].keep
    for i in (10, 11, 12):
        assert out[i].keep
    # default path ignores the stage entirely
    base = {r.doc_id: r for r in prepare_corpus(df, min_tokens=5).collect()}
    assert base[2].passed_quality and base[2].is_exact_dup


_CHROME = (
    '<html><head><style>body { color: red; }</style>'
    '<script>var nav = "<div>menu</div>";</script></head>'
    '<body><nav><a href="/">Home</a> <a href="/a">About us page</a></nav>'
)
_NAVFARM = "<p>" + " ".join(
    f'<a href="/c{i}">rather long category link number {i}</a>' for i in range(12)
) + "</p>"
_FOOT = '<footer><a href="/t">Terms</a></footer></body></html>'

_PROSE = {
    0: "the quick brown fox jumps over a lazy dog while seven other animals "
       "watch quietly from the distant hillside and a gentle evening breeze "
       "carries birdsong across the meadow toward an old stone bridge",
    1: "a different essay describes distributed query engines shuffling "
       "records between executors while an optimizer prunes columns and "
       "pushes filters down into columnar scans for every analytic workload",
    2: "yet another passage narrates sailors charting coastal waters under "
       "changing winds while gulls circle the harbor and fishermen mend "
       "their nets beside weathered boats at dawn",
    5: "this page carries genuine prose wrapped in heavy navigation chrome "
       "that extraction must strip away so the clean sentence survives all "
       "the quality and repetition gates without any trouble",
}


def test_prepare_corpus_crawl_ingest_composition(spark):
    """extract_html → domain gate → repetition gate, composed: gates and
    dedup key off the EXTRACTED text; a blocklisted domain's docs never
    reach per-document compute (NULL later-stage columns); a
    repetition-rejected doc never reaches digesting; link-farm chrome
    alone never sinks a clean document."""
    rows = [
        (0, _CHROME + "<p>" + _PROSE[0] + "</p>" + _FOOT, "https://good.com/0"),
        (1, _CHROME + "<p>" + _PROSE[1] + "</p>" + _FOOT, "https://good.com/1"),
        (2, _CHROME + "<p>" + _PROSE[2] + "</p>" + _FOOT, "https://a.good.com/2"),
        # blocklisted domain, otherwise-clean content
        (3, _CHROME + "<p>" + _PROSE[0] + " entirely fresh words</p>" + _FOOT,
         "https://spam.net/3"),
        # repetition bomb in the extracted text
        (4, _CHROME + "<p>" + "the spam line is here today ok " * 20 + "</p>" + _FOOT,
         "https://good.com/4"),
        # clean prose buried in a 12-anchor link farm
        (5, _CHROME + _NAVFARM + "<p>" + _PROSE[5] + "</p>" + _NAVFARM + _FOOT,
         "https://good.com/5"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    d = {
        r["doc_id"]: r
        for r in prepare_corpus(
            docs,
            extract_html=True,
            url_col="url",
            domain_blocklist=("spam.net",),
            repetition_filter=True,
        ).collect()
    }
    assert len(d) == 6
    # clean docs on a clean domain survive the whole pipeline
    for i in (0, 1, 2, 5):
        assert d[i]["domain_kept"] and d[i]["passed_repetition"], i
        assert d[i]["keep"], i
    # blocklisted domain: dropped BEFORE per-document compute
    assert not d[3]["domain_kept"] and not d[3]["keep"]
    assert d[3]["n_tokens"] is None and d[3]["passed_repetition"] is None
    # repetition bomb: domain-kept but gate-rejected before dedup
    assert d[4]["domain_kept"] and not d[4]["passed_repetition"]
    assert not d[4]["keep"] and d[4]["is_exact_dup"] is None
    assert "gram_char_frac" in d[4]["repetition_reasons"]
    # subdomain folded into the registered domain
    assert d[2]["domain"] == "good.com"


def test_prepare_corpus_domain_bounds_need_precomputed_stats(spark):
    """Self-derived domain stats carry counts only — asking for the
    quality/dup-rate bounds without a precomputed frame refuses."""
    import pytest

    docs = spark.createDataFrame(
        [(0, "plain prose with enough ordinary words here", "https://x.org/0")],
        "doc_id long, text string, url string",
    )
    with pytest.raises(ValueError, match="precomputed domain_stats_frame"):
        prepare_corpus(docs, url_col="url", min_domain_quality=0.5)


def test_prepare_corpus_precomputed_domain_stats_bounds(spark):
    """A precomputed reputation frame drives the quality bound: the
    low-reputation domain's documents drop before any compute."""
    from token_etl_spark.operators.curation import domain_stats

    history = spark.createDataFrame(
        [(i, f"https://good.com/{i}", 0.9) for i in range(5)]
        + [(9 + i, f"https://lowq.org/{i}", 0.1) for i in range(5)],
        "doc_id long, url string, q double",
    )
    stats = domain_stats(history, quality_col="q")
    docs = spark.createDataFrame(
        [
            (0, "the first ordinary document carries plenty of plain words "
                "arranged in an unremarkable but varied normal order", "https://good.com/a"),
            (1, "the second ordinary document also carries plenty of rather "
                "different plain words arranged some other varied way", "https://lowq.org/b"),
        ],
        "doc_id long, text string, url string",
    )
    d = {
        r["doc_id"]: r
        for r in prepare_corpus(
            docs, url_col="url", domain_stats_frame=stats, min_domain_quality=0.5
        ).collect()
    }
    assert d[0]["domain_kept"] and d[0]["keep"]
    assert not d[1]["domain_kept"] and not d[1]["keep"]
    assert d[1]["n_tokens"] is None
