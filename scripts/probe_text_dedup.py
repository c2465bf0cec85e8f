"""Reproducible scaling probe for the round-7 text/dedup operators
(PERF.md "Text-dedup scaling probe" section — VERDICT r7 item 5).

Replicates the sf0.1 documents table N× with id offsets and times three
operators end to end (noop sink):

- ``cdc_chunks``: post-fix claim — the narrow lazy-checkpoint barrier
  keeps the Rabin boundary scan LINEAR in N (the r7 no-CSE instance 5
  was O(n^4) per document before it);
- ``winnow_overlap_pairs``: pair growth is bounded by shared-fingerprint
  buckets under ``max_fp_df`` — replication multiplies every
  fingerprint's df by N, so the probe runs with ``max_fp_df`` scaled by
  N (the knob's documented contract) and pins that wall clock tracks
  the EMITTED PAIR count (quadratic in copies per fingerprint — exactly
  what replication manufactures, reported alongside time so the
  super-linear pair blowup is visible and attributable), not a hidden
  recompute;
- ``weighted_minhash_dedup``: the integer-expansion premium stays a
  constant factor over the unweighted path — both are timed, and the
  replicated corpus (N exact copies of every doc → giant true near-dup
  clusters) exercises the ``max_bucket`` guard headroom.

Usage: python scripts/probe_text_dedup.py [factors ...]   # default 1 2 4
(near-dup replication is quadratic in N by construction — every doc
gains N-1 exact copies — so factors stay small; the LINEAR-claim
operator cdc_chunks also takes 10 and 30 to pin its slope.)
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators.dedup import minhash_dedup, weighted_minhash_dedup
from token_etl_spark.operators.text import cdc_chunks, winnow_overlap_pairs
from token_etl_spark.session import get_spark


def replicate(docs, n: int, n_docs: int):
    return reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select((F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"), "text")
            for i in range(n)
        ],
    ).localCheckpoint(eager=True)


def timed(label: str, n: int, n_docs: int, fn) -> None:
    t0 = time.time()
    out = fn()
    rows = out.count()
    dt = time.time() - t0
    print(
        f"x{n:>3} ({n * n_docs:>7} docs) {label:>18}: {dt:6.2f} s  ({rows} rows)",
        flush=True,
    )


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("probe_text_dedup")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    # linear-claim operator: larger factors to pin the slope
    for n in sorted(set(factors) | {10, 30}):
        rep = replicate(docs, n, n_docs)
        timed("cdc_chunks", n, n_docs, lambda: cdc_chunks(rep))
        rep.unpersist()

    for n in factors:
        rep = replicate(docs, n, n_docs)
        timed(
            "winnow_overlap",
            n,
            n_docs,
            # df cap scales with replication (every fingerprint's df is
            # multiplied by N) — the knob's documented contract
            lambda: winnow_overlap_pairs(rep, max_fp_df=64 * n),
        )
        timed(
            "minhash_neardup",
            n,
            n_docs,
            lambda: minhash_dedup(rep, threshold=0.5, max_bucket=100_000),
        )
        timed(
            "weighted_neardup",
            n,
            n_docs,
            lambda: weighted_minhash_dedup(rep, threshold=0.5, max_bucket=100_000),
        )
        rep.unpersist()


def probe_ivf_scaling() -> None:
    """IVF label-noise sweep under replication: at FIXED n_centroids the
    candidate count per query grows linearly with the corpus (total work
    quadratic — the declared small-k regime); with n_centroids GROWN
    proportionally (the documented 100 TB contract) candidates per query
    stay constant and the sweep goes near-linear. Run:
    python -c "import sys; sys.path.insert(0,'.'); from scripts.probe_text_dedup import probe_ivf_scaling; probe_ivf_scaling()"
    """
    import time

    from token_etl_spark.operators.similarity import ivf_topk, knn_label_consistency

    spark = get_spark("probe_ivf_scaling")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n0 = emb.count()
    for n in (1, 2, 4):
        rep = reduce(
            lambda a, b: a.unionByName(b),
            [
                emb.select(
                    (F.col("vec_id") + F.lit(i * n0)).alias("vec_id"),
                    "embedding",
                    "label",
                )
                for i in range(n)
            ],
        ).localCheckpoint(eager=True)
        for k_cells, tag in ((16, "fixed-k"), (16 * n, "scaled-k")):
            t0 = time.time()
            nb = ivf_topk(rep, rep, k=10, n_centroids=k_cells, n_probe=4)
            out = knn_label_consistency(rep, k=10, neighbors=nb)
            rows = out.count()
            print(
                f"x{n} ({n * n0:>5} vecs) {tag:>9} (k={k_cells:>3}):"
                f" {time.time() - t0:6.2f} s  ({rows} rows)",
                flush=True,
            )
        rep.unpersist()


def probe_corpus_reports() -> None:
    """Replication sweep for the r8 corpus-analytics operators (VERDICT
    r8 item 5): url_dedup (canonical-URL key skew — group size grows
    with N by construction, plus a hot-key variant where 10% of rows
    share ONE url), snapshot_diff (digest-join linearity), vocab_growth
    (bucket-frame cumsum pushed to ~n_docs buckets via bucket_size=1 —
    the documented two-phase swap point probe). Run:
    python -c "import sys; sys.path.insert(0,'.'); from scripts.probe_text_dedup import probe_corpus_reports; probe_corpus_reports()"
    """
    from token_etl_spark.operators.curation import snapshot_diff, url_dedup, vocab_growth

    spark = get_spark("probe_corpus_reports")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "n_chars"
    )
    n_docs = docs.count()
    # warmup: JIT/codegen/shuffle-service costs dominate the first job at
    # this corpus size — burn them before the measured sweep
    url_dedup(
        docs.withColumn("url", F.concat(F.lit("https://w/"), F.col("doc_id"))),
    ).where("kept").count()
    for n in (1, 8, 64):
        rep = replicate(docs.select("doc_id", "text"), n, n_docs)
        # urls keyed by (doc_id % n_docs): every replica collides with
        # the original -> canonical group size == N (uniform skew-by-N)
        base_key = F.col("doc_id") % n_docs
        urls = rep.withColumn(
            "url",
            F.concat(F.lit("https://h"), (base_key % 997).cast("string"),
                     F.lit(".example.com/p/"), base_key.cast("string")),
        ).withColumn("n_chars", F.length("text"))
        timed("url_dedup", n, n_docs,
              lambda: url_dedup(urls, quality_col="n_chars").where("kept"))
        # hot key: 10% of rows share ONE canonical url
        hot = urls.withColumn(
            "url",
            F.when(base_key % 10 == 0, F.lit("https://hot.example.com/"))
            .otherwise(F.col("url")),
        )
        timed("url_dedup_hot", n, n_docs,
              lambda: url_dedup(hot, quality_col="n_chars").where("kept"))
        # snapshot diff: new side rewrites 1/5, drops 1/5, adds 1/5
        old = rep.where(F.col("doc_id") % 5 != 4)
        new = rep.where(F.col("doc_id") % 5 != 0).withColumn(
            "text",
            F.when(F.col("doc_id") % 5 == 1, F.concat("text", F.lit(" v2")))
            .otherwise(F.col("text")),
        )
        timed("snapshot_diff", n, n_docs, lambda: snapshot_diff(old, new))
        # bucket_size=1 -> bucket frame == doc count (cumsum stress)
        timed("vocab_growth_b1", n, n_docs, lambda: vocab_growth(rep, bucket_size=1))
        rep.unpersist()


if __name__ == "__main__":
    main()
