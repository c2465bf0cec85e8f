"""Reproducible scaling probe for the bigram/token curation stack
(PERF.md "Curation scaling probe" section).

Replicates the sf0.1 documents table N× with id offsets and times the
four token-statistics operators end to end (noop sink — count() lets
Catalyst prune scoring joins, see probe_spans.py): DSIR importance
scoring, bigram-LM quality scoring, the count-min build+probe, and the
two-phase vocabulary top-k. The claim under test: after the zip_with
bigram fix every plan here is explode → map-side-combinable groupBy →
broadcast join → (bounded) rank, so wall clock grows linearly in N.

Usage: python scripts/probe_curation.py [factors ...]   # default 1 10 30
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators.curation import bigram_lm_quality, importance_weights
from token_etl_spark.plans.registry import SPECS
from token_etl_spark.session import get_spark


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark("probe_curation")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "source", "text"
    )
    n_docs = docs.count()
    for n in factors:
        rep = reduce(
            lambda a, b: a.unionByName(b),
            [
                docs.select(
                    (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                    "source",
                    "text",
                )
                for i in range(n)
            ],
        ).localCheckpoint(eager=True)
        cases = {
            "importance": lambda: importance_weights(
                rep, target_sources=("src0", "src1")
            ),
            "lm_quality": lambda: bigram_lm_quality(
                rep, reference_sources=("src0", "src1")
            ),
        }
        for label, fn in cases.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(f"x{n:>3} ({n * n_docs:>7} docs) {label:>10}: {dt:6.2f} s")


if __name__ == "__main__":
    main()
