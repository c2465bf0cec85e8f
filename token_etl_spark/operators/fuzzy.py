"""Fuzzy (edit-distance) matching: prefix-filtered q-gram Levenshtein
join for entity resolution — matching noisy names/titles/URLs across
tables when no exact key exists.

No reference analog (the reference joins on exact keys only); this is
the record-linkage primitive a training-data pipeline needs for source
attribution and metadata reconciliation. The all-pairs Levenshtein join
is quadratic, so candidates come from q-gram blocking with PREFIX
FILTERING (Xiao et al. 2008, "Ed-Join: an efficient algorithm for
similarity joins with edit distance constraints", VLDB): one edit
operation disturbs at most ``q`` q-gram occurrences under
POSITION-TOLERANT matching (content equal, positions within the edit
distance), so two strings within edit distance ``d`` leave at most
``d·q`` of each side's gram occurrences unmatched — hence in ANY fixed
global order of the gram universe, each string's ``d·q + 1`` first
("rarest") gram occurrences must contain a match of the other's.
Blocking on those prefixes with the position-tolerant condition is
therefore COMPLETE for the distance predicate, and selective whenever
keys HAVE ``d·q + 1`` rare grams (the record-linkage design case —
measured near-linear on diverse keys). When they don't — dense-ID
corpora where every key is a few edits from thousands of others — no
complete gram blocking is selective; see the saturation caveat on
:func:`fuzzy_join` and PERF.md round 6 for the measurement (an earlier
positional-exact variant looked fast on exactly that corpus because it
silently dropped indel pairs).

Matching gram CONTENT with a position band — not exact '<pos>:<gram>'
tokens — is load-bearing for completeness: an insertion or deletion
shifts every later gram's position by one, so under exact positional
matching a dist-1 indel pair ('abcdef' vs 'Xabcdef') shares NO token
and is silently dropped. Ed-Join's location condition |pos_l − pos_r|
≤ d keeps those pairs while still rejecting same-content grams from
far-apart offsets. The standard companion length filter
||left| − |right|| ≤ d (a necessary condition of edit distance) prunes
candidates for free before the verify.

Levenshtein itself is a built-in in BOTH engines (Spark ``levenshtein``,
DuckDB ``levenshtein``), and the global gram order is (df, gram, pos)
with a deterministic row_number — everything integer/string-exact, so
the DuckDB oracle replays candidates AND verdicts bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


PAD_CHAR = "\x01"


def _pos_grams(c: Column, q: int) -> Column:
    """q-gram occurrences of ``c`` as an array of (p, g) structs — one
    entry per position, content NOT deduplicated: the Ed-Join
    disturbance bound counts occurrences, and collapsing repeated
    contents (think 'aaaa') would shorten the gram set the prefix
    length q·d+1 is calibrated against.

    The string is PADDED with q−1 sentinel characters on both ends
    (Gravano et al. 2001, "Approximate string joins in a database
    (almost) for free", VLDB — the standard q-gram profile), so every
    key has ≥ q gram occurrences and boundary edits still disturb ≤ q
    of them. Without padding, keys shorter than ~q have degenerate
    profiles and indel pairs like ('ba','a') at q=2 share NO gram —
    found by the randomized completeness test in tests/test_properties.
    A sentinel colliding with data characters is completeness-safe (it
    can only ADD candidates, which the levenshtein verify filters)."""
    pad = F.lit(PAD_CHAR * (q - 1))
    padded = F.concat(pad, c, pad)
    idx = F.sequence(F.lit(1), F.length(c) + (q - 1))
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("p"), padded.substr(i, F.lit(q)).alias("g")
        ),
    )


_FUZZY_CAP_ADVICE = (
    "keys lack d*q+1 rare grams (the dense-ID pathology, PERF.md round 6):"
    " raise q, pre-partition on a stronger blocking key, or run the"
    " verified cross join the data actually requires."
)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_dist: int = 2,
    q: int = 3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Inner join on ``levenshtein(left_key, right_key) <= max_dist``
    over distinct keys; returns (lk, rk, dist).

    Candidates: each side keeps only its ``max_dist·q + 1`` first gram
    occurrences under the global (df, gram, pos) order — df counted
    over gram CONTENT across BOTH sides, so the order is shared — and
    pairs must share a content-equal gram whose positions differ by at
    most ``max_dist`` (Ed-Join's location condition: indels shift later
    grams by at most the number of edits) between keys whose lengths
    differ by at most ``max_dist``. Complete by the Ed-Join
    prefix-filter theorem; selective because a gram's place in the
    order grows with its frequency, so the ubiquitous grams that would
    emit quadratic candidates are exactly the ones excluded from every
    prefix.

    100 TB shape: gram explode is corpus-linear; the df count and the
    per-key rank are one shuffle each over the gram frame; the
    candidate join enumerates the left occurrence's ``2d+1`` admissible
    positions so the equi-key is (gram, EXACT position) — identical
    output to joining on content with a position-band filter, but the
    hash buckets keep positional selectivity (one content gram spread
    over P positions costs Σ_p l_p·r_p, not (Σ_p l_p)(Σ_p r_p)). The
    verify runs IN-STREAM on candidate occurrences (no candidate-sized
    distinct shuffle — dedup happens after the distance filter, on the
    output-sized survivor set); levenshtein is a codegen'd integer
    builtin and the ~2× duplicate-occurrence evaluations are far
    cheaper than shuffling the candidate set.

    SATURATION CAVEAT (measured, PERF.md round 6): prefix filtering is
    near-linear when keys have ``d·q+1`` rare grams — the
    entity-resolution design case. On dense-ID corpora (zero-padded
    serial numbers: only a handful of varying characters, every key
    within a few edits of thousands of others) NO complete gram
    blocking is selective: the candidate set provably saturates toward
    the all-pairs product (measured 256M candidates from 15k×15k keys
    at sf0.1), and runtime approaches the verified cross join. The r5
    positional-exact variant looked fast on exactly that corpus because
    it was silently incomplete, not because it solved it. For such
    corpora the honest plan is the cross join within blocking partitions
    the data actually supports (length, shared literal prefix), or a
    stricter distance predicate. ``max_gram_df`` turns that saturation
    from a silent slowdown into a loud in-plan failure: each side's
    prefix occurrences are window-counted on the join's own
    (gram, position) shuffle key (ReusedExchange — no extra scan) and
    asserted ≤ the cap BEFORE any pair is emitted, the same
    ``_cap_bucket_size`` discipline every other quadratic path in this
    repo carries (LSH buckets, SemDeDup clusters, containment blocks).
    Default None: completeness is never silently traded, and research
    corpora that legitimately saturate still run.
    """
    prefix_len = max_dist * q + 1
    lk = left.select(F.col(left_key).cast("string").alias("k")).distinct()
    rk = right.select(F.col(right_key).cast("string").alias("k")).distinct()

    def grams(keys: DataFrame) -> DataFrame:
        return keys.select(
            "k", F.explode(_pos_grams(F.col("k"), q)).alias("pg")
        ).select("k", F.col("pg.p").alias("p"), F.col("pg.g").alias("g"))

    lg = grams(lk)
    rg = grams(rk)
    gdf = (
        lg.unionByName(rg)
        .groupBy("g")
        .agg(F.count("*").alias("df"))
    )
    w = Window.partitionBy("k").orderBy("df", "g", "p")

    def prefix(g: DataFrame) -> DataFrame:
        return (
            g.join(gdf, "g")
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= prefix_len)
            .select("k", "g", "p")
        )

    # delta-enumerate the left side's admissible partner positions:
    # |pos_l - pos_r| <= d becomes the equi-condition pp == rpos
    lp = (
        prefix(lg)
        .select(F.col("k").alias("lk"), F.col("g").alias("lg"), F.col("p").alias("lpos"))
        .withColumn(
            "pp",
            F.explode(
                F.array(*[F.col("lpos") + F.lit(i) for i in range(-max_dist, max_dist + 1)])
            ),
        )
    )
    rp = prefix(rg).select(
        F.col("k").alias("rk"), F.col("g").alias("rg"), F.col("p").alias("rpos")
    )
    if max_gram_df is not None:
        from token_etl_spark.operators.dedup import _cap_bucket_size

        lp = _cap_bucket_size(
            lp, ["lg", "pp"], max_gram_df, "fuzzy-join gram", advice=_FUZZY_CAP_ADVICE
        )
        rp = _cap_bucket_size(
            rp, ["rg", "rpos"], max_gram_df, "fuzzy-join gram", advice=_FUZZY_CAP_ADVICE
        )
    cands = lp.join(
        rp,
        (F.col("lg") == F.col("rg"))
        & (F.col("pp") == F.col("rpos"))
        & (F.abs(F.length("lk") - F.length("rk")) <= max_dist),
    ).select("lk", "rk")

    # SHORT-KEY BRANCH: a key with <= d·q gram occurrences (padded
    # length |k|+q-1 <= d·q, i.e. |k| <= q(d-1)+1) has a VACUOUS
    # match-count bound — gram blocking guarantees nothing for it
    # (minimal case: lev('a','b') = 1 with zero shared grams; found by
    # the randomized completeness test). Any partner of such a key is
    # itself short (length band), so keys with |k| <= q(d-1)+1+d pair
    # through a delta-enumerated LENGTH equi-join (no cartesian) and go
    # straight to the verify. The short population is alphabet-bounded
    # in principle and tiny in entity-resolution practice; max_gram_df
    # caps its per-length buckets the same way it caps gram buckets.
    short_bound = q * (max_dist - 1) + 1 + max_dist
    sl = lk.where(F.length("k") <= short_bound).select(
        F.col("k").alias("lk"), F.length("k").alias("ll")
    )
    sr = rk.where(F.length("k") <= short_bound).select(
        F.col("k").alias("rk"), F.length("k").alias("rl")
    )
    if max_gram_df is not None:
        from token_etl_spark.operators.dedup import _cap_bucket_size

        sl = _cap_bucket_size(
            sl, ["ll"], max_gram_df, "fuzzy-join short-key", advice=_FUZZY_CAP_ADVICE
        )
        sr = _cap_bucket_size(
            sr, ["rl"], max_gram_df, "fuzzy-join short-key", advice=_FUZZY_CAP_ADVICE
        )
    short_cands = (
        sl.withColumn(
            "tl",
            F.explode(
                F.array(*[F.col("ll") + F.lit(i) for i in range(-max_dist, max_dist + 1)])
            ),
        )
        .join(sr, F.col("tl") == F.col("rl"))
        .select("lk", "rk")
    )

    return (
        cands.unionByName(short_cands)
        .withColumn("dist", F.levenshtein("lk", "rk").cast("long"))
        .where(F.col("dist") <= max_dist)
        .select("lk", "rk", "dist")
        .distinct()
    )
