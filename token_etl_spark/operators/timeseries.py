"""Per-group time-series operators that genuinely need the Pandas-UDF
path (SURVEY §7.0: core stays native; `applyInPandas` is reserved for
semantics built-ins can't express).

EWMA is the canonical case: the recurrence
``y_t = alpha * x_t + (1 - alpha) * y_{t-1}`` has a closed form usable
with window cumsums, but it divides by ``(1-alpha)^t`` — numerically
explosive past a few hundred rows — so the stable computation is the
sequential recurrence per group. ``applyInPandas`` runs it vectorized
(pandas ``ewm``) per group partition, Arrow-batched, with the groups
distributed across executors: parallelism is across groups, which is the
only parallelism the recurrence admits.

At 100 TB: the shuffle is one hash partition on the group key; each
group must fit in one task's memory (time series per entity — fine for
per-user/per-token series; a single group spanning years of seconds
would need chunked carry-state instead, see streaming/stateful.py for
the incremental form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructType


def grouped_ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average of ``value_col`` per group,
    ordered by ``ts_col`` (``adjust=False`` recurrence: y_0 = x_0,
    y_t = alpha*x_t + (1-alpha)*y_{t-1})."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    # copy the field list — StructType.add appends in place, and reusing
    # df.schema's own list would mutate the input DataFrame's cached schema
    out_schema = StructType(list(df.schema.fields)).add(out_col, DoubleType())

    def _ewma(pdf):
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return df.groupBy(*key_cols).applyInPandas(_ewma, schema=out_schema)
