"""Table profiling: SUMMARIZE-style per-column statistics in one pass.

An engine that curates 100 TB corpora needs cheap observability — null
rates, cardinalities and value ranges per column — to catch schema
drift and degenerate partitions before they poison a training run. This
is DuckDB's SUMMARIZE / Deequ's profiler re-expressed as a single Spark
aggregate.

Plan shape: ONE aggregation over the table computes every column's
(non-null count, distinct count, min, max) simultaneously — Catalyst
plans the multi-distinct via Expand, so the table is scanned once — and
a ``stack`` pivots the 1-row result to one row per column. Nothing
driver-side; the profile is itself a DataFrame. At 100 TB swap
``countDistinct`` for ``approx_count_distinct`` via ``exact=False``:
HLL sketches merge map-side and drop the Expand blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """One row per column: ``col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val`` (min/max cast to string so heterogeneous column
    types share one schema).
    """
    cols = cols or df.columns
    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            ndv(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _total - _nn_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.selectExpr(
        "_total AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
