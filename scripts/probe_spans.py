"""Reproducible scaling probe for ExactSubstr span dedup (PERF.md
"Span-dedup scaling probe" section).

Replicates the sf0.1 documents table N× with id offsets (every replica is
an exact copy, so duplicated-window density GROWS with N — the worst case
for the rewrite's removal state) and times ``duplicated_spans`` and
``dedup_spans_rewrite``. The claim under test: cost is ~1 shuffled row
per corpus token, i.e. wall clock grows linearly in N with no quadratic
term from the occurrence ranking, because the per-fingerprint work is a
window count/rank (streamed within each partition), never a pair join.

Usage: python scripts/probe_spans.py [factors ...]   # default 1 10 30
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from functools import reduce

from pyspark.sql import functions as F

from token_etl_spark.io.sources import load_table
from token_etl_spark.operators.dedup import dedup_spans_rewrite, duplicated_spans
from token_etl_spark.session import get_spark


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark("probe_spans")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    for n in factors:
        rep = reduce(
            lambda a, b: a.unionByName(b),
            [
                docs.select(
                    (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"), "text"
                )
                for i in range(n)
            ],
        ).localCheckpoint(eager=True)
        for label, fn in (("stats", duplicated_spans), ("rewrite", dedup_spans_rewrite)):
            t0 = time.time()
            out = fn(rep, k=8)
            # noop sink: forces EVERY column (count() lets Catalyst prune
            # the whole dup-detection join — left join on unique keys with
            # no referenced columns is eliminated)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(f"x{n:>3} ({n * n_docs:>7} docs) {label:>7}: {dt:6.2f} s")


if __name__ == "__main__":
    main()
