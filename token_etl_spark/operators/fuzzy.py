"""Fuzzy (edit-distance) matching: blocked Levenshtein join for entity
resolution — matching noisy names/titles/URLs across tables when no
exact key exists.

No reference analog (the reference joins on exact keys only); this is
the record-linkage primitive a training-data pipeline needs for source
attribution and metadata reconciliation. The all-pairs Levenshtein join
is quadratic, so candidates come from Q-GRAM BLOCKING — a declared,
oracle-replayable semantic (like containment_pairs' df cap), not a
recall afterthought: two strings within edit distance d differ in at
most d·q of their positional q-grams, so they MUST share at least
max(|s|, |t|) − q + 1 − d·q q-grams (Gravano et al. 2001, "Approximate
string joins in a database (almost) for free", VLDB). We use the
sufficient single-shared-gram relaxation: candidates are pairs sharing
>= 1 q-gram, complete whenever that count bound is >= 1.

Levenshtein itself is a built-in in BOTH engines (Spark ``levenshtein``,
DuckDB ``levenshtein``), integer-exact by definition — no float caveat
anywhere in this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos_grams(c: Column, q: int, positional: bool) -> Column:
    """Distinct q-gram array of ``c``; '<pos>:' prefixed when positional.
    Positional (not bag) gramming keeps the blocking selective on
    strings with repetitive alphabets (ids, codes) where the same gram
    recurs at many offsets."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (q - 1), F.lit(1)))
    if positional:
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat(i.cast("string"), F.lit(":"), c.substr(i, F.lit(q))),
            )
        )
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(q))))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_dist: int = 2,
    q: int = 3,
    block_pos: bool = True,
) -> DataFrame:
    """Inner join on ``levenshtein(left_key, right_key) <= max_dist``,
    with q-gram blocking generating the candidate pairs.

    Returns (lk, rk, dist), distinct key pairs. Blocking is COMPLETE for
    pairs within ``max_dist`` whenever
    max(|s|,|t|) − q + 1 − max_dist·q >= 1 (the Gravano count bound;
    positional blocking additionally assumes the strings align, i.e.
    substitution-style noise — set ``block_pos=False`` for insertions/
    deletions that shift offsets, at some selectivity cost). Callers
    with very short keys should drop ``q`` to 2.

    100 TB shape: each side explodes to (gram, key) — corpus-linear —
    and the gram equi-join emits pairs bounded per gram by that gram's
    frequency product; ubiquitous grams are the skew risk, and
    positional gramming is what keeps template-heavy key spaces (ids,
    SKUs) selective. The verify is a codegen'd integer ``levenshtein``
    over the distinct candidate pairs only.
    """
    lk = left.select(F.col(left_key).cast("string").alias("lk")).distinct()
    rk = right.select(F.col(right_key).cast("string").alias("rk")).distinct()
    lg = lk.select("lk", F.explode(_pos_grams(F.col("lk"), q, block_pos)).alias("g"))
    rg = rk.select("rk", F.explode(_pos_grams(F.col("rk"), q, block_pos)).alias("g"))
    cands = lg.join(rg, "g").select("lk", "rk").distinct()
    return (
        cands.withColumn("dist", F.levenshtein("lk", "rk").cast("long"))
        .where(F.col("dist") <= max_dist)
        .select("lk", "rk", "dist")
    )
