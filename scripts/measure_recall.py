"""Recall@k of the approximate ANN paths vs brute-force cosine (ROADMAP 2).

Runs over the driver's ``embeddings`` table: brute-force top-k is ground
truth; LSH (by n_planes) and IVF (by n_probe, with/without spherical
k-means refinement) are scored as mean per-query recall. Results are
recorded in PERF.md.

Usage: python scripts/measure_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators import similarity as S
from token_etl_spark.session import get_spark


def topk_sets(df) -> dict[int, frozenset[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return {q: frozenset(s) for q, s in out.items()}


def recall(truth: dict[int, frozenset[int]], approx: dict[int, frozenset[int]]) -> float:
    per_q = [len(truth[q] & approx.get(q, frozenset())) / len(truth[q]) for q in truth]
    return sum(per_q) / len(per_q)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("measure-recall")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    queries = emb.limit(64).cache()
    print(f"corpus={n} queries=64 k={k}")

    t0 = time.time()
    truth = topk_sets(S.brute_force_topk(emb, queries, k=k))
    print(f"brute force: {time.time() - t0:.1f}s (ground truth)")

    for n_planes in (4, 6, 8):
        t0 = time.time()
        approx = topk_sets(S.lsh_topk(emb, queries, k=k, n_planes=n_planes))
        print(
            f"lsh n_planes={n_planes}: recall@{k}={recall(truth, approx):.3f}"
            f" ({time.time() - t0:.1f}s)"
        )

    for n_planes in (4, 6, 8):
        for ph in (1, 2):
            t0 = time.time()
            approx = topk_sets(
                S.lsh_multiprobe_topk(emb, queries, k=k, n_planes=n_planes, probe_hamming=ph)
            )
            print(
                f"lsh-multiprobe n_planes={n_planes} hamming<={ph}:"
                f" recall@{k}={recall(truth, approx):.3f} ({time.time() - t0:.1f}s)"
            )

    for refine in (0, 2):
        for n_probe in (1, 2, 4, 8):
            t0 = time.time()
            approx = topk_sets(
                S.ivf_topk(emb, queries, k=k, n_probe=n_probe, refine_iters=refine)
            )
            print(
                f"ivf n_probe={n_probe} refine={refine}:"
                f" recall@{k}={recall(truth, approx):.3f} ({time.time() - t0:.1f}s)"
            )

    t0 = time.time()
    approx = topk_sets(S.quantized_topk(emb, queries, k=k))
    print(
        f"int8 quantized full scan: recall@{k}={recall(truth, approx):.3f}"
        f" ({time.time() - t0:.1f}s)"
    )

    t0 = time.time()
    approx = topk_sets(S.pq_topk(emb, queries, k=k))
    print(
        f"pq m=8 k_codes=16 full scan: recall@{k}={recall(truth, approx):.3f}"
        f" ({time.time() - t0:.1f}s)"
    )

    for n_probe in (2, 4, 8):
        t0 = time.time()
        approx = topk_sets(S.ivfpq_topk(emb, queries, k=k, n_probe=n_probe))
        print(
            f"ivfpq n_probe={n_probe}: recall@{k}={recall(truth, approx):.3f}"
            f" ({time.time() - t0:.1f}s)"
        )

    for n_probe in (2, 4, 8):
        t0 = time.time()
        approx = topk_sets(S.ivfpq_residual_topk(emb, queries, k=k, n_probe=n_probe))
        print(
            f"ivfpq-residual n_probe={n_probe}:"
            f" recall@{k}={recall(truth, approx):.3f} ({time.time() - t0:.1f}s)"
        )

    for rr in (30, 50, 100):
        t0 = time.time()
        approx = topk_sets(
            S.ivfpq_rerank_topk(emb, queries, rerank_r=rr, k=k, n_probe=8)
        )
        print(
            f"ivfpq+rerank R={rr} n_probe=8:"
            f" recall@{k}={recall(truth, approx):.3f} ({time.time() - t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
