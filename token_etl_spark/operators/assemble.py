"""Per-token metric assembly (SURVEY §2.3 J6 replacement).

The reference zips nine 1-row metric DataFrames with a reduce-join on
``monotonically_increasing_id`` (HandleDataframe.scala:7-14,
EnhanceTokenEnricher.scala:66) — a partition-layout-dependent quirk whose
*intent* is "assemble one summary row per token". The engine's canonical
form keys every metric by ``contract_address`` and folds with explicit
equi-joins (deterministic, and for a single-token frame each side is one
row, so the joins are trivially broadcast).

At scale the preferred shape is the single-pass variant: compute all
metrics grouped by contract_address in one aggregation over one shuffle
(see plans/domain.py q_assemble_metrics) — the reduce-join form is kept
for reference parity and as a test oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_on_key(dfs: list[DataFrame], key: str = "contract_address") -> DataFrame:
    """Fold metric frames with inner equi-joins on an explicit key."""
    if not dfs:
        raise ValueError("no metric frames to assemble")
    return reduce(lambda a, b: a.join(b, key, "inner"), dfs)
