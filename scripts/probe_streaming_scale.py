"""Streaming-ingest scale probe: drain the composed crawl-ingest
runner (run_streaming_ingest — extraction → refresh-aware domain gate →
map-only repetition gate, one foreachBatch sink) over the sf0.1 corpus
and the seeded 10x probe corpus, and report the wall-clock exponent —
the batch probe (probe_scaling.py) covers every batch family; this
covers the streaming twin, whose per-batch costs (reputation-tree
re-load, sink commit) are FIXED per micro-batch and should amortize the
same way the batch tiers' stage overhead does.

The source is written as four parquet files and drained with
maxFilesPerTrigger=2 → two micro-batches, so the probe exercises a real
batch boundary (per-batch gate re-load, two sink commits) at both
scales. Usage: python scripts/probe_streaming_scale.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def drain(spark, sf_dir: str) -> tuple[float, int]:
    from token_etl_spark.operators.curation import fit_and_save_domain_stats
    from token_etl_spark.plans.base import t
    from token_etl_spark.plans.curation import _html_synth, _url_synth
    from token_etl_spark.streaming.curation import run_streaming_ingest

    docs = t(spark, sf_dir, "documents")
    frame = docs.select(
        "doc_id", _html_synth().alias("text"), _url_synth().alias("url")
    )
    base = tempfile.mkdtemp(prefix="stream_scale_")
    try:
        stats_path = f"{base}/rep"
        fit_and_save_domain_stats(spark, frame.select("doc_id", "url"), stats_path)
        src = f"{base}/src"
        frame.repartition(4).write.parquet(src)
        out = f"{base}/out"
        t0 = time.perf_counter()
        run_streaming_ingest(
            spark.readStream.schema(frame.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src),
            stats_path,
            out,
            f"{base}/ckpt",
        )
        elapsed = time.perf_counter() - t0
        n = spark.read.parquet(out).count()
        return elapsed, n
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from token_etl_spark.session import get_spark

    spark = get_spark("probe_streaming_scale")
    repo = Path(__file__).resolve().parent.parent
    big_dir = str(repo / ".probe_data" / f"sf{round(0.1 * args.mult, 4)}")

    drain(spark, "/root/testdata/sf0.001")  # warmup: codegen + sink paths
    t_small, n_small = drain(spark, args.base)
    t_big, n_big = drain(spark, big_dir)
    exp = math.log(t_big / t_small) / math.log(args.mult)
    print(json.dumps({
        "metric": "streaming_ingest_scaling",
        "mult": args.mult,
        "t_small_sec": round(t_small, 3),
        "rows_small": n_small,
        "t_big_sec": round(t_big, 3),
        "rows_big": n_big,
        "exponent": round(exp, 3),
    }))


if __name__ == "__main__":
    main()
