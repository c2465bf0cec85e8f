from __future__ import annotations

import math

import pytest

import numpy as np
from pyspark.sql import functions as F

from token_etl_spark.operators.similarity import brute_force_topk, cosine, lsh_topk


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    exp = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert math.isclose(got, exp, rel_tol=1e-12)


def _corpus(spark, n=50, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(float)
    return spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], "vec_id long, embedding array<double>"
    ), vecs


def test_brute_force_topk_matches_numpy(spark):
    df, vecs = _corpus(spark)
    out = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=5)
    got = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    sims[0] = -np.inf  # exclude self
    exp = list(np.argsort(-sims)[:5])
    assert got == exp


def test_embedding_near_dups_subset_of_exact(spark):
    from token_etl_spark.operators.similarity import embedding_near_dups

    df, vecs = _corpus(spark, n=80, dim=8)
    thr = 0.6
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, threshold=thr, n_planes=2, dim=8).collect()
    }
    sims = (vecs @ vecs.T) / (
        np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(vecs, axis=1)[None, :]
    )
    exact_pairs = {
        (i, j) for i in range(80) for j in range(i + 1, 80) if sims[i, j] >= thr
    }
    assert lsh_pairs <= exact_pairs          # LSH never invents a pair
    if exact_pairs:
        assert len(lsh_pairs) > 0            # and finds some at 2 planes


def test_lsh_topk_subset_of_bruteforce_universe(spark):
    df, _ = _corpus(spark)
    queries = df.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(df, queries, k=10)
    approx = lsh_topk(df, queries, k=10, n_planes=2, dim=8)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    # every approx result is a real (non-self) pair with correct cosine sign conventions
    assert all(r["query_id"] != r["neighbor_id"] for r in approx_rows)
    # with 2 planes buckets are coarse → decent overlap with exact top-10
    overlap = {(r["query_id"], r["neighbor_id"]) for r in approx_rows} & exact_pairs
    assert len(overlap) > 0


def test_quantize_vec_range_and_extreme(spark):
    from pyspark.sql import functions as F
    from token_etl_spark.operators.similarity import quantize_vec

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, -2.0]), (3, [1.0, 1.0, 1.0, 1.0])],
        ["id", "v"],
    )
    out = df.select(
        "id", quantize_vec(F.col("v").cast("array<double>")).alias("q")
    ).collect()
    got = {r["id"]: r["q"] for r in out}
    assert got[1] == [95, 127]  # scale by max|x|=4 → floor(95.75), floor(127.5)
    assert max(abs(x) for r in out for x in r["q"]) == 127  # max component always ±127
    assert got[2] == [0, -127]
    assert got[3] == [127, 127, 127, 127]


def test_quantized_topk_shape_and_recall(spark, sf_dir):
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import brute_force_topk, quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    quant = quantized_topk(emb, queries, k=10)
    rows = quant.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == set(range(8))
    for q, rs in per_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, 11))
        assert all(r["neighbor_id"] != q for r in rs)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact & approx) / len(exact) > 0.3  # sanity floor, honest recall in PERF.md


def test_semantic_dedup_exemplar_rule(spark):
    """Planted exact duplicates: identical vectors share a cluster and a
    centroid_sim, so exactly the smallest id of each identical group is
    kept; singletons far from everything are all kept."""
    import math

    from token_etl_spark.operators.similarity import semantic_dedup

    # 20 base vectors on distinct axes (orthogonal → cosine 0 between
    # groups), ids 100/101/102 duplicate vector axis-0, 200/201 axis-1.
    rows = []
    dim = 24
    def axis(i, scale=1.0):
        v = [0.0] * dim
        v[i % dim] = scale
        return v
    for i in range(20):
        rows.append((i, axis(i)))
    rows += [(100, axis(0, 2.0)), (101, axis(0, 3.0)), (102, axis(0, 0.5))]
    rows += [(200, axis(1, 4.0)), (201, axis(1, 0.25))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(df, n_centroids=4, n_iters=1, threshold=0.99)
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 25
    ax0 = [0, 100, 101, 102]
    ax1 = [1, 200, 201]
    # identical directions → cosine 1 ≥ 0.99 → one exemplar each
    for group in (ax0, ax1):
        kept = [i for i in group if got[i]["kept"]]
        assert kept == [min(group)], group
        sims = {round(got[i]["centroid_sim"], 9) for i in group}
        assert len(sims) == 1  # same direction → same centroid_sim
        for i in group:
            assert got[i]["n_dups"] == len(group) - 1
    # orthogonal singletons under a 0.99 threshold: no dups unless the
    # k-means centroid merged axes (cosine between distinct axes is 0)
    for i in range(2, 20):
        assert got[i]["kept"], i
        assert got[i]["n_dups"] == 0


def test_semantic_dedup_cluster_cap_guard(spark):
    """A degenerate clustering (one giant cell) must raise the explicit
    in-plan cap error before quadratic pair emission, and the guard must
    stay silent when every cluster is under the cap."""
    import pytest

    from token_etl_spark.operators.similarity import semantic_dedup

    dim = 8
    giant = [(i, [1.0] + [0.0] * (dim - 1)) for i in range(300)]
    df = spark.createDataFrame(giant, ["vec_id", "embedding"])
    with pytest.raises(Exception, match="semantic-dedup cluster"):
        semantic_dedup(
            df, n_centroids=4, n_iters=1, threshold=0.99, max_cluster=100
        ).collect()
    ok = semantic_dedup(
        df, n_centroids=4, n_iters=1, threshold=0.99, max_cluster=500
    )
    assert ok.count() == 300


def test_prototypicality_filter_drops_cluster_core(spark):
    """Two well-separated clusters; within each, members closest to the
    centroid get the lowest proto_rank and are dropped at drop_pct."""
    from token_etl_spark.operators.similarity import prototypicality_filter

    # cluster A along +x (even ids), cluster B along +y (odd ids) —
    # interleaved so the deterministic min-id init seeds BOTH clusters;
    # each has one member pointing slightly off-axis (least prototypical)
    rows = []
    for i, off in zip((0, 2, 4, 6), (0.0, 0.01, 0.02, 0.9)):
        rows.append((i, [1.0, off, 0.0, 0.0]))
    for i, off in zip((1, 3, 5, 7), (0.0, 0.01, 0.02, 0.9)):
        rows.append((i, [off, 1.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prototypicality_filter(df, n_centroids=2, n_iters=2, drop_pct=25).collect()
    by_id = {r.id: r for r in out}
    assert len(by_id) == 8
    clusters = {}
    for r in out:
        clusters.setdefault(r.centroid_id, []).append(r)
    assert sorted(len(v) for v in clusters.values()) == [4, 4]
    for members in clusters.values():
        # 25% of 4 = exactly 1 dropped: the rank-1 (most prototypical) member
        dropped = [r for r in members if not r.kept]
        assert len(dropped) == 1 and dropped[0].proto_rank == 1
        # the off-axis member (0.9 perturbation) must survive
        tail = max(members, key=lambda r: r.proto_rank)
        assert tail.kept and tail.id in (6, 7)
        assert all(r.cluster_n == 4 for r in members)


def test_prototypicality_drop_boundary_integer_exact(spark):
    """(n * drop_pct) div 100 boundary: with n=5 and drop_pct=39 exactly
    1 row drops; with drop_pct=40 exactly 2 drop."""
    from token_etl_spark.operators.similarity import prototypicality_filter

    rows = [(i, [1.0, i * 0.05, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for pct, expect_dropped in ((39, 1), (40, 2)):
        out = prototypicality_filter(df, n_centroids=1, n_iters=1, drop_pct=pct).collect()
        assert sum(1 for r in out if not r.kept) == expect_dropped


def test_centroid_passthrough_matches_internal_training(spark, sf_dir):
    """semantic_dedup / prototypicality_filter with a pre-trained
    centroid table produce row-identical output to internal training
    (same params) — the train-once-reuse contract of d4_select."""
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        prototypicality_filter,
        semantic_dedup,
        spherical_kmeans,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = spherical_kmeans(emb, n_centroids=8, n_iters=2)
    a = sorted(map(tuple, semantic_dedup(emb, 8, 2, 0.3).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, 8, 2, 0.3, centroids=cents).collect()))
    assert a == b
    c = sorted(map(tuple, prototypicality_filter(emb, 8, 2, 25).collect()))
    d = sorted(
        map(tuple, prototypicality_filter(emb, 8, 2, 25, centroids=cents).collect())
    )
    assert c == d


def test_d4_select_composes_both_stages(spark, sf_dir):
    """keep == semdedup_kept AND proto_kept; stage-2 quota applies to
    the deduplicated cluster sizes (cluster_n counts survivors only)."""
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import d4_select, semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    out = d4_select(emb, n_centroids=8, n_iters=2, threshold=0.3, drop_pct=25)
    rows = out.collect()
    assert len(rows) == emb.count()
    sem_keep = {r.id for r in rows if r.semdedup_kept}
    final_keep = {r.id for r in rows if r.keep}
    assert final_keep < sem_keep  # drop_pct=25 strictly shrinks the set
    for r in rows:
        if not r.semdedup_kept:
            assert r.proto_kept is None and not r.keep
        else:
            assert r.proto_kept is not None
            assert r.keep == (r.semdedup_kept and r.proto_kept)
    # stage-1 decisions must equal a standalone SemDeDup run
    sem_alone = {
        r.id for r in semantic_dedup(emb, 8, 2, 0.3).collect() if r.kept
    }
    assert sem_keep == sem_alone
    # per-cluster survivor counts: cluster_n sums to |survivors|
    per_cluster = {}
    for r in rows:
        if r.semdedup_kept:
            per_cluster.setdefault(r.centroid_id, set()).add(r.cluster_n)
    assert all(len(v) == 1 for v in per_cluster.values())


def test_pq_shapes_and_recall_floor(spark, sf_dir):
    """Codebook is m×k_codes, codes are m-arrays over 1..k_codes, top-k
    output is well-formed per query, and the shared-codebook
    pass-through equals internal training (train once, reuse)."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=8, k=16, n_iters=2)
    assert cb.count() == 8 * 16
    codes = pq_encode(emb, cb).collect()
    assert all(len(r.codes) == 8 for r in codes)
    assert all(1 <= c <= 16 for r in codes for c in r.codes)

    q = emb.filter(F.col("vec_id") < 5)
    top = pq_topk(emb, q, k=10)
    rows = top.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(5))
    for qq, rs in per_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, 11))
        assert all(r.neighbor_id != qq for r in rs)
        assert all(r.pq_dist >= 0 for r in rs)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact & approx) / len(exact) > 0.15  # floor; curve in PERF.md

    shared = sorted(map(tuple, pq_topk(emb, q, k=10, codebooks=cb).collect()))
    assert shared == sorted(map(tuple, rows))


def test_ivfpq_shape_and_probe_pruning(spark, sf_dir):
    """IVF-PQ returns well-formed per-query top-k, candidates only from
    probed cells (n_probe=n_centroids degenerates to flat PQ — same
    result set), and recall floor holds."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = ivfpq_topk(emb, q, n_centroids=8, n_probe=2, k=10).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(5))
    for qq, rs in per_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, 11))
        assert all(r.neighbor_id != qq for r in rs)
    # probing every cell == flat PQ over the same codebooks/params
    full = sorted(
        map(tuple, ivfpq_topk(emb, q, n_centroids=8, n_probe=8, k=10).collect())
    )
    flat = sorted(map(tuple, pq_topk(emb, q, k=10).collect()))
    assert full == flat
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=10).collect()}
    got = {(r.query_id, r.neighbor_id) for r in out}
    assert len(exact & got) / len(exact) > 0.1


def test_ivfpq_residual_exact_when_codes_saturate(spark, sf_dir):
    """Structural identity: with one code per vector (k_codes = |corpus|)
    residual quantization is lossless, so in-probed-cell distances are
    EXACT squared-L2 and recall over probed cells is perfect."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_residual_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    q = emb.filter(F.col("vec_id") < 4)
    out = ivfpq_residual_topk(
        emb, q, n_centroids=4, n_probe=4, k_codes=60, pq_iters=1, k=10
    ).collect()
    exact = {}
    for r in brute_force_topk(emb, q, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in out:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got == exact


def test_lsh_multiprobe_dominates_single_probe(spark, sf_dir):
    """At the same n_planes, probing Hamming-1 neighbors must find a
    strict superset of the single-probe candidates (same planes, the
    0-mask probe IS the single-probe bucket) — so recall can only rise;
    on this corpus it rises strictly."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        lsh_multiprobe_topk,
        lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)

    def sets(df):
        out = {}
        for r in df.select("query_id", "neighbor_id").collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    truth = sets(brute_force_topk(emb, q, k=10))
    single = sets(lsh_topk(emb, q, k=10, n_planes=4))
    multi = sets(lsh_multiprobe_topk(emb, q, k=10, n_planes=4, probe_hamming=1))

    def rec(d):
        return sum(len(truth[qq] & d.get(qq, set())) for qq in truth)

    assert rec(multi) >= rec(single)
    assert rec(multi) > 0


def test_semantic_dedup_boundary_blind_spot_documented(spark):
    """SemDeDup's known limitation, pinned: a near-dup pair placed
    symmetrically about two centroids' bisector assigns to DIFFERENT
    clusters, so the in-cluster pair search cannot flag it — while the
    clustering-free embedding_near_dups path does. This is the paper's
    own trade (per-cluster quadratic work in exchange for boundary
    misses); the engine carries both operators so a pipeline can chase
    the boundary tail when it matters."""
    from token_etl_spark.operators.similarity import (
        embedding_near_dups,
        semantic_dedup,
    )
    from pyspark.sql import functions as F

    dim = 8

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    # fixed centroids on axes 0 and 1; the near-dup pair straddles the
    # 45-degree bisector: cosine(v1, v2) ~ 0.9998, but v1 leans to c1
    # and v2 to c2
    cents = spark.createDataFrame(
        [(1, vec(1.0, 0.0)), (2, vec(0.0, 1.0))],
        ["centroid_id", "centroid_vec"],
    )
    rows = [
        (10, vec(1.0, 0.98)),   # argmax -> centroid 1
        (11, vec(0.98, 1.0)),   # argmax -> centroid 2
        (20, vec(1.0, 0.0)),    # filler, cluster 1
        (21, vec(0.0, 1.0)),    # filler, cluster 2
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    out = {r["id"]: r for r in semantic_dedup(
        df, threshold=0.99, centroids=cents
    ).collect()}
    # the straddling pair is invisible to the in-cluster search
    assert out[10]["kept"] and out[11]["kept"]
    assert out[10]["n_dups"] == 0 and out[11]["n_dups"] == 0

    # the LSH near-dup path sees it (same half-space under every plane
    # with overwhelming probability at this cosine; assert it fires)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, threshold=0.99, dim=dim).collect()
    }
    assert (10, 11) in pairs


def test_semantic_dedup_multi_assign_closes_boundary(spark, sf_dir):
    """n_assign=2 probes each row's top-2 cells in the pair search:
    the bisector-straddling pair from the blind-spot test is now
    flagged (one exemplar kept), and on real embeddings n_assign=1
    stays row-identical to the original semantics."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import semantic_dedup

    dim = 8

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    cents = spark.createDataFrame(
        [(1, vec(1.0, 0.0)), (2, vec(0.0, 1.0))],
        ["centroid_id", "centroid_vec"],
    )
    rows = [
        (10, vec(1.0, 0.98)),
        (11, vec(0.98, 1.0)),
        (20, vec(1.0, 0.0)),
        (21, vec(0.0, 1.0)),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["id"]: r
        for r in semantic_dedup(
            df, threshold=0.99, centroids=cents, n_assign=2
        ).collect()
    }
    # the pair now meets in a shared probe cell: the exemplar rule keeps
    # exactly one of {10, 11}; primary assignment is unchanged
    assert out[10]["n_dups"] == 1 and out[11]["n_dups"] == 1
    assert out[10]["kept"] != out[11]["kept"]
    assert out[10]["centroid_id"] == 1 and out[11]["centroid_id"] == 2
    assert out[20]["kept"] and out[21]["kept"]

    # n_assign=1 equivalence on real embeddings
    emb = load_table(spark, sf_dir, "embeddings")
    base = {
        tuple(r)
        for r in semantic_dedup(emb, n_centroids=8, n_iters=1)
        .select("id", "centroid_id", "n_dups", "kept")
        .collect()
    }
    same = {
        tuple(r)
        for r in semantic_dedup(emb, n_centroids=8, n_iters=1, n_assign=1)
        .select("id", "centroid_id", "n_dups", "kept")
        .collect()
    }
    assert base == same


def test_semantic_dedup_max_cluster_guards_probe_cells(spark):
    """max_cluster composes with n_assign>1: the cap is applied to the
    PROBE-cell frame (the frame the pair join actually consumes), so the
    multi-probe boundary fix is not silently discarded — the straddling
    pair is still flagged under a passing cap, and the cap measures the
    n_assign-inflated cell sizes (a cap below the inflated size raises
    even though every PRIMARY cell would fit)."""
    import pytest
    from token_etl_spark.operators.similarity import semantic_dedup

    dim = 8

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    cents = spark.createDataFrame(
        [(1, vec(1.0, 0.0)), (2, vec(0.0, 1.0))],
        ["centroid_id", "centroid_vec"],
    )
    rows = [
        (10, vec(1.0, 0.98)),
        (11, vec(0.98, 1.0)),
        (20, vec(1.0, 0.0)),
        (21, vec(0.0, 1.0)),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    # passing cap: multi-probe semantics intact (pair flagged)
    out = {
        r["id"]: r
        for r in semantic_dedup(
            df, threshold=0.99, centroids=cents, n_assign=2, max_cluster=10
        ).collect()
    }
    assert out[10]["n_dups"] == 1 and out[11]["n_dups"] == 1
    assert out[10]["kept"] != out[11]["kept"]

    # n_assign=2 puts all 4 rows into both probe cells (size 4); primary
    # cells hold only 2 each — a cap of 3 must trip on the PROBE frame
    with pytest.raises(Exception, match="semantic-dedup cluster"):
        semantic_dedup(
            df, threshold=0.99, centroids=cents, n_assign=2, max_cluster=3
        ).collect()


def test_exact_rerank_identity_and_containment(spark, sf_dir):
    """Re-ranking a candidate set that contains the true top-k returns
    exactly the brute-force top-k; output is always a subset of the
    candidates."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        exact_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    cands = brute_force_topk(emb, q, k=30)
    got = exact_rerank(cands, emb, q, k=10)
    want = brute_force_topk(emb, q, k=10)
    gset = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in got.collect()}
    wset = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in want.collect()}
    assert gset == wset
    cset = {(r["query_id"], r["neighbor_id"]) for r in cands.collect()}
    assert {(a, b) for a, b, _ in gset} <= cset


def test_ivfpq_rerank_recall_dominates_pq_ranking(spark, sf_dir):
    """Exact re-rank of the PQ candidates must not lose recall vs the
    raw compressed ranking at the same probe width — and on this corpus
    it strictly gains (0.194 -> 0.45 at R=50, PERF.md)."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_rerank_topk,
        ivfpq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 16)

    def sets(df):
        out = {}
        for r in df.select("query_id", "neighbor_id").collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = sets(brute_force_topk(emb, q, k=10))

    def rec(d):
        return sum(len(truth[qq] & d.get(qq, set())) for qq in truth)

    base = rec(sets(ivfpq_topk(emb, q, k=10, n_probe=8)))
    rr = rec(sets(ivfpq_rerank_topk(emb, q, rerank_r=50, k=10, n_probe=8)))
    assert rr >= base


def test_lsh_margin_probe_t_full_equals_hamming1(spark, sf_dir):
    """probe_t = n_planes selects every single-bit flip — identical
    probe set, identical output to probe_hamming=1; smaller T returns a
    valid subset-ranked result."""
    from pyspark.sql import functions as F
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 6)
    full = {
        tuple(r)
        for r in lsh_multiprobe_topk(emb, q, k=10, n_planes=6, probe_hamming=1)
        .select("query_id", "neighbor_id", "rank")
        .collect()
    }
    margin_full = {
        tuple(r)
        for r in lsh_multiprobe_topk(emb, q, k=10, n_planes=6, probe_t=6)
        .select("query_id", "neighbor_id", "rank")
        .collect()
    }
    assert full == margin_full
    small = lsh_multiprobe_topk(emb, q, k=10, n_planes=6, probe_t=2).collect()
    assert small and all(r["query_id"] != r["neighbor_id"] for r in small)
    # candidates from fewer probes are a subset universe: every result
    # pair must also appear in the full single-flip result's universe
    small_pairs = {(r["query_id"], r["neighbor_id"]) for r in small}
    full_pairs = {(a, b) for a, b, _ in full}
    # not necessarily subset of top-10s, but nothing impossible: re-run
    # full with large k to get the whole candidate universe
    universe = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_multiprobe_topk(
            emb, q, k=10_000, n_planes=6, probe_hamming=1
        ).collect()
    }
    assert small_pairs <= universe


def test_semantic_decontaminate_flags_and_tiebreak(spark):
    """Corpus vectors near a benchmark vector are flagged; best_match
    ties (bit-identical sims from duplicate benchmark vectors) break to
    the LOWEST benchmark id; orthogonal vectors pass clean."""
    from token_etl_spark.operators.similarity import semantic_decontaminate

    dim = 4

    def vec(*xs):
        return list(xs) + [0.0] * (dim - len(xs))

    bench = spark.createDataFrame(
        [(100, vec(1.0, 0.0)), (101, vec(1.0, 0.0)), (102, vec(0.0, 1.0))],
        ["vec_id", "embedding"],
    )
    corpus = spark.createDataFrame(
        [(1, vec(0.99, 0.14)), (2, vec(0.0, 0.0, 1.0)), (3, vec(0.0, 1.0))],
        ["vec_id", "embedding"],
    )
    out = {
        r["id"]: r
        for r in semantic_decontaminate(corpus, bench, threshold=0.9).collect()
    }
    assert out[1]["contaminated"] and out[1]["best_match"] == 100  # tie -> min id
    assert not out[2]["contaminated"]  # orthogonal to every benchmark vec
    assert out[3]["contaminated"] and out[3]["best_match"] == 102
    assert out[3]["best_sim"] == 1.0


def test_trained_centroids_memoized_and_deterministic(spark, sf_dir):
    """r6 verdict item 6: the four declared centroid queries share ONE
    training run per session via plans.extensions._trained_centroids —
    the cache returns the same checkpointed frame, and that frame is
    bit-identical to a fresh spherical_kmeans run (determinism is what
    licenses memoizing under retraining oracles)."""
    import token_etl_spark.operators.similarity as S
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.plans.extensions import (
        _trained_centroids,
        _trained_centroids_means,
    )

    a = _trained_centroids(spark, sf_dir)
    # the memoized object is the keep_means training run; the plain
    # accessor wraps it in a (new) two-column projection each call
    assert _trained_centroids_means(spark, sf_dir) is _trained_centroids_means(
        spark, sf_dir
    )
    emb = load_table(spark, sf_dir, "embeddings")
    fresh = S.spherical_kmeans(emb, 16, 2)
    ga = {(r["centroid_id"], tuple(r["centroid_vec"])) for r in a.collect()}
    gf = {(r["centroid_id"], tuple(r["centroid_vec"])) for r in fresh.collect()}
    assert ga == gf and len(ga) == 16


def test_knn_label_consistency_hand_fixture(spark):
    """Two tight clusters with one mislabeled point: the planted noise
    row is the only suspect; clean rows agree with their neighborhood."""
    import token_etl_spark.operators.similarity as S

    # cluster A around +x (label 0), cluster B around +y (label 1);
    # vec 5 sits in cluster A but carries label 1 (planted noise)
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.95, 0.05, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.1, 0.9, 0.0], 1),
        (5, [0.92, 0.08, 0.0], 1),
        (6, [0.05, 0.95, 0.0], 1),
    ]
    frame = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {r["id"]: r for r in S.knn_label_consistency(frame, k=3).collect()}
    assert got[5]["suspect"] and got[5]["majority_label"] == 0
    assert got[5]["n_same"] == 0 and got[5]["agreement"] == 0.0
    for i in (0, 1, 2, 3, 4, 6):
        assert not got[i]["suspect"], i
    # vec 0's 3 nearest are 2, 1, 5 -> labels 0,0,1
    assert got[0]["n_same"] == 2 and abs(got[0]["agreement"] - 2 / 3) < 1e-9


def test_knn_label_consistency_majority_tie_breaks_to_smaller_label(spark):
    """The single-pass vote's max_by((c, -nlab)) must replay the
    documented tie rule (count desc, label asc): with k=2 and a 1-1
    split between labels 0 and 1, the majority is 0 for every row."""
    import token_etl_spark.operators.similarity as S

    # three near-collinear vectors, k=2 -> every row's neighbors are the
    # other two: rows 0 and 2 see labels {0,1} (a forced 1-1 majority
    # tie), row 1 sees {0,0}
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 1),
        (2, [0.98, 0.02], 0),
    ]
    frame = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {r["id"]: r for r in S.knn_label_consistency(frame, k=2).collect()}
    for i in (0, 1, 2):
        assert got[i]["majority_label"] == 0, i
    # the 1-1 ties resolve to label 0 (smaller), so the label-0 rows are
    # not suspects and carry agreement 1/2
    assert not got[0]["suspect"] and not got[2]["suspect"]
    assert got[0]["n_same"] == 1 and abs(got[0]["agreement"] - 0.5) < 1e-12
    assert got[2]["n_same"] == 1 and abs(got[2]["agreement"] - 0.5) < 1e-12
    # row 1's whole neighborhood disagrees
    assert got[1]["suspect"]
    assert got[1]["n_same"] == 0 and got[1]["agreement"] == 0.0


def test_knn_label_consistency_accepts_precomputed_neighbors(spark, sf_dir):
    """The IVF-at-scale seam: feeding the exact top-k frame through
    ``neighbors`` reproduces the default output."""
    import token_etl_spark.operators.similarity as S
    from token_etl_spark.io.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(60).localCheckpoint()
    nb = S.brute_force_topk(emb, emb, k=5)
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(S.knn_label_consistency(emb, k=5, neighbors=nb)) == key(
        S.knn_label_consistency(emb, k=5)
    )


def test_semantic_dedup_pair_salts_output_identical_and_measured(spark, sf_dir):
    """pair_salts > 1 (the 2D-block self-join salt, r8) must produce
    exactly the default's rows — same pairs, same keep decisions — and
    its plan must carry the explicit salted repartitions."""
    import contextlib
    import io

    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import semantic_dedup, spherical_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    cents = spherical_kmeans(emb, 8, 1)

    def key(df):
        return {
            (r["id"], r["centroid_id"], round(r["centroid_sim"], 9), r["n_dups"], r["kept"])
            for r in df.collect()
        }

    base = key(semantic_dedup(emb, centroids=cents))
    salted_df = semantic_dedup(emb, centroids=cents, pair_salts=4)
    assert key(salted_df) == base and base
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted_df.explain("formatted")
    plan = buf.getvalue()
    assert any(
        "hashpartitioning(centroid_id" in l and "_ps" in l and "REPARTITION_BY_NUM" in l
        for l in plan.splitlines()
    )


# --- sparse random projection (JL) ------------------------------------------


def test_projection_signs_deterministic_and_sparse():
    from token_etl_spark.operators.similarity import projection_signs

    a = projection_signs(64, 16)
    b = projection_signs(64, 16)
    assert a == b  # pure function of (dim, k, seed, s)
    flat = [x for row in a for x in row]
    assert set(flat) <= {1.0, -1.0, 0.0}
    # Achlioptas s=3: about 2/3 zeros; every output row non-degenerate
    zero_frac = flat.count(0.0) / len(flat)
    assert 0.55 < zero_frac < 0.78
    assert all(any(x != 0.0 for x in row) for row in a)
    # a different seed is a different matrix
    assert projection_signs(64, 16, seed="rp-other") != a


def test_random_projection_matches_numpy_reference(spark, sf_dir):
    """The fold-form projection equals the straight numpy matmul of the
    same matrix to float accumulation order (the pandas twin shares the
    numpy path, so this pins BOTH implementations to the definition)."""
    import numpy as np

    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import (
        projection_signs,
        random_projection,
        random_projection_pandas,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    native = {
        r.vec_id: np.array(r.proj)
        for r in random_projection(emb, dim=64, k=16).select("vec_id", "proj").collect()
    }
    arrow = {
        r.vec_id: np.array(r.proj)
        for r in random_projection_pandas(emb, dim=64, k=16)
        .select("vec_id", "proj")
        .collect()
    }
    mat = np.asarray(projection_signs(64, 16), dtype=np.float64).T * np.sqrt(3 / 16)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()
    }
    assert set(native) == set(arrow) == set(vecs) and len(native) == 100
    for vid, v in vecs.items():
        ref = v @ mat
        assert np.max(np.abs(native[vid] - ref)) < 1e-12
        assert np.max(np.abs(arrow[vid] - ref)) < 1e-12


def test_random_projection_preserves_distances(spark, sf_dir):
    """The JL contract this operator exists for: pairwise L2 distances
    survive 64 → 16 dims within the expected distortion band. With
    k = 16 the per-pair bound is loose, so assert on the DISTRIBUTION:
    median ratio near 1, no pair collapsing to ~0 or exploding."""
    import itertools
    import statistics

    import numpy as np

    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings").limit(60)
    proj = {
        r.vec_id: np.array(r.proj)
        for r in random_projection(emb, dim=64, k=16).select("vec_id", "proj").collect()
    }
    orig = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    ratios = []
    for a, b in itertools.combinations(sorted(orig), 2):
        d0 = float(np.linalg.norm(orig[a] - orig[b]))
        if d0 > 1e-9:
            ratios.append(float(np.linalg.norm(proj[a] - proj[b])) / d0)
    assert 0.8 < statistics.median(ratios) < 1.25
    assert min(ratios) > 0.2 and max(ratios) < 2.5


def test_random_projection_wrong_width_degrades_to_null(spark):
    """Degrade-never-crash: a vector whose width disagrees with ``dim``
    projects to NULL components (zip_with null-padding), it does not
    kill the task — the multimodal-decoder contract for malformed rows."""
    from token_etl_spark.operators.similarity import random_projection

    from token_etl_spark.operators.similarity import random_projection_pandas

    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 10), (3, None)],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r.vec_id: r.proj
        for r in random_projection(df, dim=64, k=4).select("vec_id", "proj").collect()
    }
    assert all(x is not None for x in rows[1])
    assert rows[2] == [None] * 4  # short vector: every fold hits a null pad
    assert rows[3] == [None] * 4
    # the Arrow twin produces the IDENTICAL degraded shape (k NULL
    # components, not a NULL array) — swapping implementations must not
    # change output shape for malformed rows
    rows_p = {
        r.vec_id: r.proj
        for r in random_projection_pandas(df, dim=64, k=4)
        .select("vec_id", "proj")
        .collect()
    }
    assert rows_p[2] == [None] * 4 and rows_p[3] == [None] * 4
    assert rows_p[1] == pytest.approx(rows[1])


def test_random_projection_plan_is_map_only(spark, sf_dir):
    """Zero shuffle: the projection must not add an Exchange — the whole
    point is that 100 TB of vectors stay where they are."""
    from token_etl_spark.io.sources import load_table
    from token_etl_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        random_projection(emb, dim=64, k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_projected_topk_production_composition(spark):
    """projected_topk = project → candidate scan → exact rerank: ranks
    are 1..k per query with no self-pairs, cosine_sim is the FULL-dim
    cosine (spot-checked against numpy), and on a clustered corpus the
    composition recovers most of the true top-k (the probe-measured
    coverage regime)."""
    import numpy as np

    from token_etl_spark.operators.similarity import (
        brute_force_topk,
        projected_topk,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(20, 64)
    rows = [
        (i, [float(x) for x in centers[i % 20] + 0.3 * rng.randn(64)])
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 8)
    out = projected_topk(emb, q, k=5, dim=64, proj_dim=16).collect()
    vecs = {r[0]: np.array(r[1]) for r in rows}
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["query_id"] != r["neighbor_id"]
        a, b = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        exact = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["cosine_sim"] - exact) < 1e-9  # FULL-dim cosine
    assert set(per_q) == set(range(8))
    for rs in per_q.values():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert len(got & truth) / len(truth) > 0.6  # clustered-regime floor


def test_arrow_assign_bit_exact_to_declarative(spark):
    """The Arrow-vectorized assignment twin (_assign_argmax_arrow, the
    n_centroids >= 64 scale route — r14 scaling probe) is BIT-EXACT to
    the declarative HOF form: same centroid_id on every row (incl. the
    (sim, -id) tie rule) and the winning cosine equal to the last float
    bit — the property that keeps every kmeans/SemDeDup oracle replay
    valid regardless of which route ran. Checked on seeded random
    vectors plus exact-tie rows (duplicated centroids force sim ties)."""
    import numpy as np

    from token_etl_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    n, dim, nc = 300, 16, 80
    vecs = rng.normal(size=(n, dim))
    # duplicated centroid pairs: ids i and i+nc//2 share a vector, so
    # every row assigned there exercises the exact-tie rule
    cvecs = rng.normal(size=(nc, dim))
    cvecs[nc // 2 :] = cvecs[: nc // 2]
    base = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "corpus_id long, cv array<double>",
    )
    cents = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(cvecs)],
        "centroid_id long, centroid_vec array<double>",
    )
    decl = {
        r["corpus_id"]: r["centroid_id"]
        for r in S._assign_to_centroids(base, cents).collect()
    }
    arrow = {
        r["corpus_id"]: r["centroid_id"]
        for r in S._assign_argmax_arrow(base, cents, "cv", with_sim=False).collect()
    }
    assert arrow == decl
    # every tied assignment resolved to the LOW id (ids nc//2.. are dups)
    assert all(c < nc // 2 for c in arrow.values())

    # with_sim: winning cosine equal to the last bit
    base2 = base.withColumnRenamed("corpus_id", "id").withColumnRenamed("cv", "v")
    carr = F.broadcast(
        cents.agg(
            F.collect_list(F.struct("centroid_id", "centroid_vec")).alias("_cents")
        )
    )
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                S.cosine(F.col("v"), c.getField("centroid_vec")).alias("sim"),
                (-c.getField("centroid_id")).alias("neg_id"),
            ),
        )
    )
    decl_sim = {
        r["id"]: (r["centroid_id"], r["centroid_sim"])
        for r in base2.join(carr)
        .withColumn("_b", best)
        .select(
            "id",
            (-F.col("_b.neg_id")).alias("centroid_id"),
            F.col("_b.sim").alias("centroid_sim"),
        )
        .collect()
    }
    arrow_sim = {
        r["id"]: (r["centroid_id"], r["centroid_sim"])
        for r in S._assign_argmax_arrow(base2, cents, "v", with_sim=True).collect()
    }
    assert arrow_sim.keys() == decl_sim.keys()
    for i in arrow_sim:
        assert arrow_sim[i][0] == decl_sim[i][0], i
        import struct as _struct

        assert _struct.pack("<d", arrow_sim[i][1]) == _struct.pack(
            "<d", decl_sim[i][1]
        ), (i, arrow_sim[i], decl_sim[i])


def test_semantic_dedup_same_results_across_assign_routes(spark):
    """semantic_dedup's OUTPUT (ids, cells, sims, n_dups, kept) is
    identical whether the centroid count routes assignment through the
    declarative form (< 64) or the Arrow twin (>= 64) — same seeded
    corpus clustered under a pre-trained 80-centroid table, once forced
    down each route by flipping the threshold constant."""
    import numpy as np

    import token_etl_spark.operators.similarity as S

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 8))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = S.spherical_kmeans(emb, n_centroids=80, n_iters=1)
    cents = cents.localCheckpoint(eager=True)

    def run():
        return sorted(
            (
                (r["id"], r["centroid_id"], r["centroid_sim"], r["n_dups"], r["kept"])
                for r in S.semantic_dedup(
                    emb, n_centroids=80, n_iters=1, threshold=0.3, centroids=cents
                ).collect()
            )
        )

    real = S._ARROW_ASSIGN_MIN
    try:
        S._ARROW_ASSIGN_MIN = 64  # arrow route (80 >= 64)
        via_arrow = run()
        S._ARROW_ASSIGN_MIN = 10**9  # declarative route
        via_decl = run()
    finally:
        S._ARROW_ASSIGN_MIN = real
    assert via_arrow == via_decl


def test_pair_cosine_arrow_bit_exact(spark):
    """_pair_cosine_arrow (the joined-pair verify's scale twin) is
    bit-exact to the declarative cosine(): out_col values equal to the
    last float bit on seeded random pairs, and threshold filtering
    keeps exactly the same id set."""
    import numpy as np
    import struct as _struct

    from token_etl_spark.operators import similarity as S

    rng = np.random.default_rng(23)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=12)],
         [float(x) for x in rng.normal(size=12)])
        for i in range(120)
    ]
    pairs = spark.createDataFrame(
        rows, "pid long, va array<double>, vb array<double>"
    )
    decl = {
        r["pid"]: r["c"]
        for r in pairs.withColumn("c", S.cosine(F.col("va"), F.col("vb"))).collect()
    }
    arrow = {
        r["pid"]: r["c"]
        for r in S._pair_cosine_arrow(pairs, "va", "vb", out_col="c").collect()
    }
    assert arrow.keys() == decl.keys()
    for i in decl:
        assert _struct.pack("<d", arrow[i]) == _struct.pack("<d", decl[i]), i

    thr = float(np.median(list(decl.values())))
    decl_keep = {i for i, c in decl.items() if c >= thr}
    arrow_keep = {
        r["pid"]
        for r in S._pair_cosine_arrow(pairs, "va", "vb", threshold=thr).collect()
    }
    assert arrow_keep == decl_keep

    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        S._pair_cosine_arrow(pairs, "va", "vb")


def test_ivf_topk_same_results_across_verify_routes(spark):
    """ivf_topk's output (neighbors, sims, ranks) is identical whether
    the CORPUS ASSIGNMENT routes through the declarative HOF argmax or
    the Arrow twin — forced down each route by flipping the threshold
    constant at n_centroids=80. (The candidate VERIFY deliberately has
    no Arrow route — measured slower, see _cell_join_topk — so the
    assignment is the only switch this flips.)"""
    import numpy as np

    import token_etl_spark.operators.similarity as S

    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(300, 8))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = S.spherical_kmeans(emb, n_centroids=80, n_iters=1)
    cents = cents.localCheckpoint(eager=True)

    def run():
        return sorted(
            (
                (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
                for r in S.ivf_topk(
                    emb, emb, k=5, n_centroids=80, n_probe=3, centroids=cents
                ).collect()
            )
        )

    real = S._ARROW_ASSIGN_MIN
    try:
        S._ARROW_ASSIGN_MIN = 64
        via_arrow = run()
        S._ARROW_ASSIGN_MIN = 10**9
        via_decl = run()
    finally:
        S._ARROW_ASSIGN_MIN = real
    assert via_arrow == via_decl


def test_arrow_paths_refuse_zero_vectors(spark):
    """The Arrow twins uphold cosine()'s nonzero-input contract: a
    zero-norm corpus vector, centroid, or pair side raises loudly
    (the declarative form raises ANSI DIVIDE_BY_ZERO; numpy would
    silently score NaN and corrupt the argmax/filter downstream)."""
    import pytest

    from token_etl_spark.operators import similarity as S

    base = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0])],
        "corpus_id long, cv array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    with pytest.raises(Exception, match="zero-norm corpus vector"):
        S._assign_argmax_arrow(base, cents, "cv", with_sim=False).collect()

    zero_cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    good = base.where(F.col("corpus_id") == 0)
    with pytest.raises(Exception, match="zero-norm centroid"):
        S._assign_argmax_arrow(good, zero_cents, "cv", with_sim=False).collect()

    pairs = spark.createDataFrame(
        [(0, [1.0, 2.0], [0.0, 0.0])],
        "pid long, va array<double>, vb array<double>",
    )
    with pytest.raises(Exception, match="zero-norm vector in pair"):
        S._pair_cosine_arrow(pairs, "va", "vb", threshold=0.5).collect()


def test_kmeans_checkpoint_cadence_invariant(spark, sf_dir, monkeypatch):
    """The r16 Lloyd checkpoint cadence (one eager cut per
    _KMEANS_CKPT_EVERY rounds instead of per round) must not change the
    trained centroids — the checkpoint is lineage truncation only — and
    must actually REDUCE the per-round driver-job count (one barrier +
    block write per skipped checkpoint; VERDICT r15 item 4)."""
    import token_etl_spark.operators.similarity as S
    from token_etl_spark.io.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    got_batched = {
        r[0]: (r[1], r[2])
        for r in S.spherical_kmeans(
            emb, 16, 3, id_col="vec_id", vec_col="embedding", keep_means=True
        ).collect()
    }
    monkeypatch.setattr(S, "_KMEANS_CKPT_EVERY", 1)
    got_per_round = {
        r[0]: (r[1], r[2])
        for r in S.spherical_kmeans(
            emb, 16, 3, id_col="vec_id", vec_col="embedding", keep_means=True
        ).collect()
    }
    assert got_batched == got_per_round
    monkeypatch.undo()

    # job-count pin: 2 extra rounds must not cost 2 extra checkpoints
    # (measured: 4 jobs per uncheckpointed round, 5 with the eager cut —
    # the old per-round form added 10 jobs for rounds 2-3, the batched
    # form 8; slack below absorbs AQE stage-count drift, not the cut)
    sc = spark.sparkContext
    counts = {}
    for iters in (1, 3):
        group = f"kmeans-cadence-{iters}"
        sc.setJobGroup(group, group)
        try:
            S.spherical_kmeans(
                emb, 16, iters, id_col="vec_id", vec_col="embedding"
            ).collect()
            counts[iters] = len(sc.statusTracker().getJobIdsForGroup(group))
        finally:
            sc.setJobGroup("", "")
    assert counts[3] - counts[1] <= 9, counts
