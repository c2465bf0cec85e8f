"""Linear-probe training (operators/linear.py): numpy parity for the
full gradient-descent run, determinism, and the map-only sweep plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators.linear import (
    linear_probe,
    linear_probe_score,
    linear_probe_train,
)


def _numpy_probe(data, target, n_iters, lr):
    X = np.array([r["embedding"] for r in data], dtype=np.float64)
    X = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
    y = (np.array([r["label"] for r in data]) == target).astype(np.float64)
    n = float(len(y))
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(n_iters):
        err = X @ w + b - y
        w = w - lr * 2.0 * (err[:, None] * X).sum(axis=0) / n
        b = b - lr * 2.0 * err.sum() / n
    return {r["vec_id"]: float(s) for r, s in zip(data, X @ w + b)}


def test_linear_probe_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    data = emb.select("vec_id", "embedding", "label").collect()
    ref = _numpy_probe(data, target=0, n_iters=3, lr=0.5)
    got = {
        r["id"]: r["score"]
        for r in linear_probe(emb, target_label=0, n_iters=3, lr=0.5).collect()
    }
    assert got.keys() == ref.keys()
    assert max(abs(got[i] - ref[i]) for i in got) < 1e-12


def test_linear_probe_training_reduces_loss(spark, sf_dir):
    """More gradient steps cannot increase the squared loss on this
    full-batch, small-lr setup — descent actually descends."""
    emb = load_table(spark, sf_dir, "embeddings")

    def loss(iters):
        out = linear_probe(emb, n_iters=iters, lr=0.5)
        row = out.agg(
            F.avg((F.col("score") - F.col("y")) ** 2).alias("mse")
        ).collect()[0]
        return row["mse"]

    l0, l1, l3 = loss(0), loss(1), loss(3)
    assert l1 < l0 and l3 < l1


def test_linear_probe_score_sweep_is_map_only(spark, sf_dir):
    """With a materialized model and a fixed threshold, the sweep plan
    has no shuffle: broadcast 1-row model + narrow projection."""
    import contextlib
    import io

    emb = load_table(spark, sf_dir, "embeddings")
    model = linear_probe_train(emb, n_iters=1).localCheckpoint()
    swept = linear_probe_score(emb, model, threshold=0.5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        swept.explain("formatted")
    plan = buf.getvalue()
    # the only exchange is the broadcast of the 1-row model — no
    # shuffle (hash/range repartitioning) anywhere
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert swept.count() == emb.count()
