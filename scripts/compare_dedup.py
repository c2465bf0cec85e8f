"""Dedup-modality comparison: precision/recall of each near-dup path
against exact n-gram Jaccard ground truth — the 'second gate' for the
dedup stack (the replay oracles prove implementation = specification;
this measures whether each specification finds what it claims to find
on the driver corpus). Results recorded in PERF.md.

Usage: python scripts/compare_dedup.py [sf_dir] [jaccard_threshold]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators import dedup as D
from token_etl_spark.session import get_spark


def pair_set(df, a="id_a", b="id_b") -> set[tuple]:
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    spark = get_spark("compare-dedup")
    docs = load_table(spark, sf_dir, "documents").cache()
    n = docs.count()
    print(f"corpus={n} docs, truth = ngram Jaccard >= {thr}")

    t0 = time.time()
    truth = pair_set(D.ngram_jaccard_pairs(docs, threshold=thr))
    print(f"truth pairs: {len(truth)} ({time.time() - t0:.1f}s)")

    # exact dups are the J=1.0 subset
    t0 = time.time()
    groups = (
        docs.select("doc_id", F.md5(D.normalized(F.col("text"))).alias("digest"))
        .groupBy("digest")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    exact_pairs = set()
    for r in groups.collect():
        ids = r["ids"]
        exact_pairs.update((a, b) for i, a in enumerate(ids) for b in ids[i + 1:])
    in_truth = len(exact_pairs & truth)
    print(
        f"exact-dup pairs: {len(exact_pairs)}; in truth: {in_truth}"
        f" ({time.time() - t0:.1f}s)"
    )

    for num_hashes, bands in ((32, 8), (64, 16), (128, 32)):
        t0 = time.time()
        mh = pair_set(
            D.minhash_dedup(
                docs, num_hashes=num_hashes, bands=bands, threshold=thr
            )
        )
        tp = len(mh & truth)
        print(
            f"minhash {num_hashes}h/{bands}b verified: {len(mh)} pairs,"
            f" precision={tp / max(len(mh), 1):.3f}"
            f" recall={tp / max(len(truth), 1):.3f} ({time.time() - t0:.1f}s)"
        )

    for max_h in (3, 6):
        t0 = time.time()
        sh = pair_set(
            D.simhash_neardup(docs, bits=32, bands=8, max_hamming=max_h)
        )
        tp = len(sh & truth)
        print(
            f"simhash 32b/8bands h<={max_h}: {len(sh)} pairs,"
            f" precision-vs-J={tp / max(len(sh), 1):.3f}"
            f" recall-vs-J={tp / max(len(truth), 1):.3f} ({time.time() - t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
