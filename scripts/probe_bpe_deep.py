"""Deep BPE production-train probe (VERDICT r11 item 5): now that
``bpe_train_checkpointed`` is resumable, measure the 1,000+-merge
regime directly instead of extrapolating from 256 — the measured
counter to PERF.md r6's "0.17 s/merge × 32k ≈ 90 min" estimate.

The corpus vocabulary is md5-derived (each document is a row of md5
hex tokens), so the pair space never exhausts the way the gate
corpus's ~30-word vocabulary does: hex symbols keep yielding frequent
novel pairs for thousands of merges. Segments are measured by RESUMING
the same state (256 → 512 → 1024 → 1536), so each segment's wall clock
is exactly its own merges plus one state read — which simultaneously
re-proves that resume pays only the uncommitted tail.

Usage: python scripts/probe_bpe_deep.py [n_rows] [toks_per_row]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from token_etl_spark.session import get_spark


def main() -> None:
    # 1000 x 4 = 4,000 distinct hex words — the r11 probe's ~5k-word
    # regime (0.58 s/merge), sized so the 1,024-merge target finishes
    # in minutes; per-merge cost follows VOCABULARY size, so a bigger
    # corpus only slows the one up-front word_counts shuffle
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    toks = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from token_etl_spark.operators.bpe import bpe_train_checkpointed

    spark = get_spark("probe-bpe-deep")
    docs = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(f"t{j}")))
                for j in range(toks)
            ],
        ).alias("text"),
    ).localCheckpoint()
    docs.count()  # warm

    state = tempfile.mkdtemp(prefix="bpe_deep_")
    shutil.rmtree(state)
    print(f"corpus: {n_rows} rows x {toks} md5 tokens; checkpoint_every=64")
    print(f"{'segment':>14} {'merges':>7} {'wall_s':>8} {'s/merge':>9}")
    prev = 0
    for target in (256, 512, 1024):
        t0 = time.monotonic()
        got = bpe_train_checkpointed(
            docs, state, n_merges=target, checkpoint_every=64
        ).count()
        dt = time.monotonic() - t0
        seg = got - prev
        if seg <= 0:
            print(f"  vocabulary exhausted at {got} merges")
            break
        print(f"{prev}->{got:>7} {seg:>7} {dt:>8.1f} {dt / seg:>9.3f}")
        prev = got
    # resume-pays-only-the-tail re-check at depth: ask for +32
    t0 = time.monotonic()
    bpe_train_checkpointed(docs, state, n_merges=prev + 32, checkpoint_every=64).count()
    dt = time.monotonic() - t0
    print(f"resume {prev}->{prev + 32}: {dt:.1f}s ({dt / 32:.3f} s/merge incl. state read)")
    shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    main()
