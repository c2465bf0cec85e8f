"""Mixture builder (pipelines/mixture.py): stage composition on real
testdata — decontamination drops every flagged doc, the budget cap
holds per source, upsampling produces the right epoch multiset, and
packing assigns every surviving copy exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators.bloom import bloom_decontaminate
from token_etl_spark.operators.text import token_count
from token_etl_spark.pipelines.mixture import build_mixture


def test_full_mixture_manifest(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    weights = {"src0": 2.0, "src1": 0.5}
    manifest = build_mixture(
        docs,
        benchmark=bench,
        budget_tokens=2_000,
        weights=weights,
        pack_budget=256,
        n_shards=8,
    )
    rows = manifest.collect()
    assert rows

    # 1. no contaminated doc survives (bloom has no false negatives,
    #    so the flagged set is exactly what the pipeline dropped on)
    flagged = {
        r["doc_id"]
        for r in bloom_decontaminate(docs, bench, k=3, min_overlap=2).collect()
    }
    assert not ({r["doc_id"] for r in rows} & flagged)

    # 2. per-source budget: unique docs' tokens stay within one document
    #    of the cap (keep-the-crossing-document convention)
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count("text").alias("n")).collect()
    }
    per_source: dict[str, set] = {}
    for r in rows:
        per_source.setdefault(r["source"], set()).add(r["doc_id"])
    for src, ids in per_source.items():
        total = sum(toks[d] for d in ids)
        assert total <= 2_000 + max(toks[d] for d in ids), src

    # 3. epochs: src0 docs appear exactly twice, src1 at most once,
    #    others exactly once
    from collections import Counter

    copies = Counter((r["source"], r["doc_id"]) for r in rows)
    for (src, _), n in copies.items():
        if src == "src0":
            assert n == 2
        elif src == "src1":
            assert n == 1  # surviving half appears once
        else:
            assert n == 1

    # 4. packing: every copy assigned exactly one (shard, seq, offset);
    #    offsets are sane
    keys = [(r["doc_id"], r["epoch"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r["start_offset"] >= 0 and r["seq_id"] >= 0 for r in rows)


def test_importance_selection_stage(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    manifest = build_mixture(
        docs,
        target_sources=("src0", "src1"),
        select_top_pct=40.0,
        pack_budget=512,
        n_shards=4,
    )
    kept = manifest.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n")
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("t"))
    joined = {r["source"]: (r["n"],) for r in kept.collect()}
    for r in totals.collect():
        n = joined[r["source"]][0]
        import math

        assert n == math.ceil(r["t"] * 0.4), (r["source"], n, r["t"])


def test_decisions_compose_with_prepare_corpus(spark, sf_dir):
    """prepare_corpus → build_mixture end-to-end: only keep-list docs
    enter the mixture, and the result equals mixing the pre-filtered
    frame directly (the decisions path is a pure semi-join)."""
    from token_etl_spark.pipelines.corpus import prepare_corpus

    docs = load_table(spark, sf_dir, "documents")
    decisions = prepare_corpus(docs)
    kept_ids = {r["doc_id"] for r in decisions.where("keep").collect()}
    assert 0 < len(kept_ids) < docs.count()

    via_decisions = build_mixture(
        docs, decisions=decisions, pack_budget=512, n_shards=4
    )
    direct = build_mixture(
        docs.where(F.col("doc_id").isin(kept_ids)),
        pack_budget=512,
        n_shards=4,
    )
    a = {tuple(r) for r in via_decisions.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b
    assert {r[0] for r in a} <= kept_ids


def test_string_doc_ids_survive_packing(spark):
    """Manifest identity is recovered by joining on the copy key, not by
    re-parsing it: string doc_ids — even ones containing ':' — come back
    losslessly (ADVICE r4: the split-based form silently NULLed them)."""
    docs = spark.createDataFrame(
        [("url:a:1", "s", "alpha beta gamma"), ("url:b:2", "s", "delta eps zeta")],
        "doc_id string, source string, text string",
    )
    manifest = build_mixture(docs, weights={"s": 2.0}, pack_budget=8, n_shards=2)
    rows = manifest.collect()
    assert {r["doc_id"] for r in rows} == {"url:a:1", "url:b:2"}
    assert all(r["source"] == "s" for r in rows)
    assert sorted(r["epoch"] for r in rows) == [1, 1, 2, 2]
