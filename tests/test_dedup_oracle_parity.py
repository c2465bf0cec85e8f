"""Pins the data-dependent assumptions the dedup/multimodal oracles rest
on (plans/extensions.py "Oracle strategy" note).

The MinHash+LSH oracles use the exact-Jaccard pair set as ground truth.
That is only a true oracle if band recall is COMPLETE on the gated data:
LSH always emits a subset (every emitted pair is Jaccard-verified), and
these tests prove subset == whole set, pair for pair, on the driver's
tables. The engine is deterministic (murmur3, fixed data), so local
equality here implies equality under the external gate.

If the driver's documents tables ever change such that a qualifying pair
falls below the 8-band recall knee, these tests fail FIRST — the fix is
to raise bands/hashes or re-demote those oracles, not to ship a red gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators import dedup as D
from token_etl_spark.plans.base import t
from token_etl_spark.plans.extensions import JACCARD_THRESHOLD


def _exact_pairs(docs):
    return {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in D.ngram_jaccard_pairs(docs, k=3, threshold=JACCARD_THRESHOLD).collect()
    }


def _py_components(pairs):
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
        nodes.update((a, b))
    return {n: find(n) for n in nodes}


def test_lsh_pair_set_equals_exact_pair_set(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    lsh = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in D.minhash_dedup(
            docs, k=3, num_hashes=32, bands=8, threshold=JACCARD_THRESHOLD
        ).collect()
    }
    assert lsh == _exact_pairs(docs)


def test_star_clusters_equal_exact_pair_components(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    got = {
        r.id: r.component
        for r in D.minhash_dedup_clusters(docs, threshold=JACCARD_THRESHOLD).collect()
    }
    assert got == _py_components(_exact_pairs(docs))


def test_documents_first_byte_is_ascii_and_nonempty(spark, sf_dir):
    # SQL_MULTIMODAL_DECODE reads the first payload BYTE via ascii() of
    # the first CHAR — identical only while first chars are ASCII.
    docs = t(spark, sf_dir, "documents")
    bad = docs.filter(
        (F.length("text") == 0) | (F.ascii(F.substring("text", 1, 1)) >= 128)
    ).count()
    assert bad == 0


def test_incremental_index_pair_set_equals_exact_cross_set(spark, sf_dir):
    """ext_incremental_neardup's oracle assumption: the index-LSH
    candidate set covers every exact cross-set Jaccard pair on the gate
    corpus (same band-recall argument as the self-join form)."""
    docs = t(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 13 == 0)
    new = docs.where(F.col("doc_id") % 13 != 0)
    index = D.minhash_index_frame(ref)
    got = {
        (r.id_new, r.id_ref): round(r.jaccard, 6)
        for r in D.minhash_match_index(
            new, index, threshold=JACCARD_THRESHOLD
        ).collect()
    }
    # exact ground truth: all-pairs jaccard, filtered to cross-set
    exact = {}
    for (a, b), j in _exact_pairs(docs).items():
        # ngram_jaccard_pairs emits id_a < id_b; orient to (new, ref)
        if a % 13 == 0 and b % 13 != 0:
            exact[(b, a)] = j
        elif b % 13 == 0 and a % 13 != 0:
            exact[(a, b)] = j
    assert got == exact


def test_weighted_lsh_pair_set_equals_exact_weighted_pair_set(spark, sf_dir):
    """Same parity contract for the WEIGHTED sketch: the banded +
    verified emission must equal the exact weighted-Jaccard pair set
    (weights = min(tf, 16)) on the gated data, which is what makes
    SQL_WEIGHTED_NEARDUP a true oracle for ext_weighted_neardup."""
    docs = t(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b): round(r.wjaccard, 6)
        for r in D.weighted_minhash_dedup(
            docs, k=3, num_hashes=32, bands=8, threshold=JACCARD_THRESHOLD,
            max_weight=16,
        ).collect()
    }
    # exact reference: per-doc capped counts, python dict arithmetic
    import re
    from collections import Counter

    rows = docs.select("doc_id", F.col("text")).collect()

    def grams(text):
        toks = [w for w in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if w]
        n = max(len(toks) - 2, 1)
        return Counter(" ".join(toks[i : i + 3]) for i in range(n))

    cnt = {r.doc_id: {g: min(c, 16) for g, c in grams(r.text).items()} for r in rows}
    tot = {d: sum(m.values()) for d, m in cnt.items()}
    exp = {}
    # restrict the O(n^2) reference to docs sharing >=1 gram via inverted index
    inv = {}
    for d, m in cnt.items():
        for g in m:
            inv.setdefault(g, []).append(d)
    cand = set()
    for ds in inv.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    for a, b in cand:
        ma, mb = cnt[a], cnt[b]
        if len(mb) < len(ma):
            ma, mb = mb, ma
        m = sum(min(c, mb.get(g, 0)) for g, c in ma.items())
        wj = m / (tot[a] + tot[b] - m)
        if wj >= JACCARD_THRESHOLD:
            exp[(a, b)] = round(wj, 6)
    assert got == exp
