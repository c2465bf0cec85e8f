"""Recall@k and cost of ANN over JL-projected vectors vs full dimension.

The 100 TB question `random_projection` exists to answer: how much
neighbor fidelity survives 64 → k dims, and what does the distance scan
save? Brute-force cosine top-10 on the ORIGINAL vectors is ground
truth; the same brute-force on the PROJECTED vectors (k = 8/16/32) is
the candidate generator a projected index would feed. Also scored:
projected candidates at 3k re-ranked by exact cosine (the
retrieve-then-rerank composition `exact_rerank` already implements) —
the production shape, since re-ranking restores full-dim fidelity on a
candidate set 100× smaller than the corpus.

Usage: python scripts/probe_projection.py [sf_dir] [k]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators import similarity as S
from token_etl_spark.session import get_spark
from scripts.measure_recall import recall, topk_sets


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("probe-projection")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    queries = emb.limit(64).cache()
    print(f"corpus={n} queries=64 k={k}")

    t0 = time.time()
    truth = topk_sets(S.brute_force_topk(emb, queries, k=k))
    t_full = time.time() - t0
    print(f"full-dim brute force: {t_full:.1f}s (ground truth)")

    for kdim in (8, 16, 32):
        proj_c = S.random_projection(emb, dim=64, k=kdim, out_col="embedding_p").select(
            "vec_id", F.col("embedding_p").alias("embedding")
        ).cache()
        proj_q = S.random_projection(queries, dim=64, k=kdim, out_col="embedding_p").select(
            "vec_id", F.col("embedding_p").alias("embedding")
        )
        proj_c.count()  # cache the projection; the scan cost is what we time
        t0 = time.time()
        approx = topk_sets(S.brute_force_topk(proj_c, proj_q, k=k))
        t_proj = time.time() - t0
        r_direct = recall(truth, approx)

        # retrieve 3k in projected space, re-rank by exact cosine through
        # the PRODUCTION composition (operators/similarity.exact_rerank),
        # so the probe measures what the pipeline actually runs
        t0 = time.time()
        cand = S.brute_force_topk(proj_c, proj_q, k=3 * k).select(
            "query_id", "neighbor_id"
        )
        rer = S.exact_rerank(cand, emb, queries, k=k)
        r_rerank = recall(truth, topk_sets(rer))
        t_rer = time.time() - t0
        print(
            f"k={kdim:2d} dims: direct recall@{k}={r_direct:.3f} ({t_proj:.1f}s), "
            f"retrieve-3k+exact-rerank recall@{k}={r_rerank:.3f} ({t_rer:.1f}s)"
        )
        proj_c.unpersist()

    # The gate table is i.i.d.-random vectors — the ADVERSARIAL case for
    # any distance-preserving sketch (all pairs concentrate near
    # orthogonality, so top-k margins are tiny and JL's ±eps distortion
    # scrambles rank order even while preserving distances). Real
    # embeddings cluster; measure that regime too so the probe reports
    # both ends.
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(50, 64)
    rows = [
        (i, [float(x) for x in centers[i % 50] + 0.35 * rng.randn(64)])
        for i in range(n)
    ]
    clus = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    clus.count()
    cq = clus.limit(64)
    truth_c = topk_sets(S.brute_force_topk(clus, cq, k=k))
    for kdim in (16, 32):
        pc = S.random_projection(clus, dim=64, k=kdim, out_col="p").select(
            "vec_id", F.col("p").alias("embedding")
        ).cache()
        pc.count()
        pq = S.random_projection(cq, dim=64, k=kdim, out_col="p").select(
            "vec_id", F.col("p").alias("embedding")
        )
        direct = recall(truth_c, topk_sets(S.brute_force_topk(pc, pq, k=k)))
        cover = recall(truth_c, topk_sets(S.brute_force_topk(pc, pq, k=3 * k)))
        print(
            f"clustered (50 centers, sigma 0.35) k={kdim:2d}: "
            f"direct recall@{k}={direct:.3f}, "
            f"candidate-{3 * k} true-top-{k} coverage={cover:.3f}"
        )
        pc.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
