"""Mergeable frequency sketches: count-min over token streams.

No reference analog (the reference stops at token ETL); this is the
fixed-memory frequency-observability layer a corpus pipeline runs when
exact per-item counts are too big to hold — the count-min sketch of
Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 55(1)).

Why a sketch when ``groupBy(token).count()`` is exact? At 100 TB the
distinct-token frame is billions of rows and must itself be shuffled,
stored, and joined; the CMS is ``depth × width`` counters TOTAL —
kilobytes — regardless of corpus bytes, it merges by cell-wise addition
(so per-partition sketches combine map-side and across days/sources),
and membership questions against it are a broadcast join. The estimate
is an upper bound: ``est ≥ true`` always, with ``est ≤ true + εN`` at
probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

All hashing is md5-prefix bucketing (``curation.hash_bucket`` with a
row-index salt) — deterministic, JVM-codegen'd, and byte-for-byte
reproducible by the DuckDB oracle. Never ``rand()``, same rule as every
other operator in this package.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from token_etl_spark.operators.curation import hash_bucket


def _salted_bucket(item: Column, row: int, width: int) -> Column:
    """Bucket of ``item`` under hash row ``row``: md5 of 'row:item'."""
    return hash_bucket(F.concat(F.lit(f"{row}:"), item), width)


def countmin_table(
    df: DataFrame,
    item_col: str = "token",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the count-min counter table: (row, bucket, cnt), exactly
    ``depth × width`` cells (absent cells are implicitly zero).

    Input is one row per item occurrence (``weight_col=None``) or a
    pre-aggregated (item, weight) frame — building from exact partial
    counts is cell-wise identical to streaming every occurrence, which
    is the CMS mergeability property and why a pipeline can sketch each
    source/day independently and union the tables.

    Plan shape: the ``depth`` (row, bucket) projections explode from a
    literal struct array (narrow, no shuffle), then ONE
    map-side-combinable groupBy on (row, bucket) — whose output
    cardinality is the sketch size, not the data size. The result is
    broadcastable by construction.
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _salted_bucket(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"), w.alias("w"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("w").alias("cnt"))
    )


def countmin_estimate(
    items: DataFrame,
    cms: DataFrame,
    item_col: str = "token",
    depth: int = 4,
    width: int = 1024,
    est_col: str = "est_n",
) -> DataFrame:
    """Point-query the sketch: for each row of ``items`` append
    ``est_col`` = min over hash rows of the addressed counter (the CMS
    estimate — an upper bound on the true count; missing cells are
    impossible for items the sketch saw, and would mean 0).

    ``cms`` is sketch-sized, so the join is broadcast: estimation is a
    narrow pass over ``items`` — the whole point of sketching at scale.
    """
    probes = items.select(
        "*", F.posexplode(
            F.array(*[_salted_bucket(F.col(item_col), r, width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    others = [c for c in items.columns]
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy(*others)
        .agg(F.min("cnt").alias(est_col))
    )
