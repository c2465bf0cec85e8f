"""Reproducible scaling probe for the decode-bound multimodal path
(PERF.md "Multimodal decode scaling probe" — VERDICT r9 item 7).

The multimodal family is the ONE operator class where per-row Python
cost is by design (genuine byte decoding inside Arrow-batched
mapInPandas), so its linearity claim deserves a measurement like every
shuffle-bound operator got. Replicates the sf0.1 documents table N×
with id offsets, synthesizes the same in-engine P5 payloads as
``ext_multimodal_pixels`` (header bytes + ``unhex(md5(text))`` as 8×2
pixels), and times:

- ``extract_media_features``: header parse + real pixel decode + luma;
- ``resize_raw_images`` → ``extract_media_features``: decode →
  nearest-resample → re-encode → decode again (the two-pass shape the
  declared query ships).

Also pins that ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
the decode's working set: with the conf set to B, the LARGEST pandas
batch any task materializes is ≤ B (measured through the same
mapInPandas contract, not assumed) — executor memory stays flat in B
regardless of corpus size or payload distribution.

Usage: python scripts/probe_multimodal.py [factors ...]  # default 1 4 16 64
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from token_etl_spark.io.sources import load_table  # noqa: E402
from token_etl_spark.operators.multimodal import (  # noqa: E402
    extract_media_features,
    resize_raw_images,
)
from token_etl_spark.session import get_spark  # noqa: E402


def payload_frame(docs):
    """The ext_multimodal_pixels synthesis: one valid 8×2 P5 per doc."""
    return docs.select(
        "doc_id",
        F.concat(F.lit(bytearray(b"P5\n8 2\n255\n")), F.unhex(F.md5("text"))).alias(
            "payload"
        ),
    )


def replicate(docs, n: int, n_docs: int):
    return reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select((F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"), "text")
            for i in range(n)
        ],
    ).localCheckpoint(eager=True)


def timed(label: str, n: int, n_docs: int, fn) -> None:
    t0 = time.time()
    rows = fn().count()
    dt = time.time() - t0
    print(
        f"x{n:>3} ({n * n_docs:>7} docs) {label:>22}: {dt:6.2f} s  ({rows} rows)",
        flush=True,
    )


def max_arrow_batch(df) -> int:
    """Largest pandas batch the Arrow transfer hands any task, measured
    through the identical mapInPandas contract the decoders use."""

    def _sizes(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    return df.mapInPandas(_sizes, schema="n long").agg(F.max("n")).collect()[0][0]


def main() -> None:
    spark = get_spark("probe-multimodal")
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    for n in factors:
        rep = payload_frame(replicate(docs, n, n_docs)).localCheckpoint(eager=True)
        timed("extract_media_features", n, n_docs, lambda: extract_media_features(rep))
        timed(
            "resize+re-decode", n, n_docs,
            lambda: extract_media_features(
                resize_raw_images(rep, target_w=4, target_h=1).select(
                    "doc_id", "payload"
                )
            ),
        )
        rep.unpersist()

    # Arrow batch bounding: the decode working set is ≤ maxRecordsPerBatch
    # rows per task, independent of corpus size.
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    original = spark.conf.get(conf, None)
    rep = payload_frame(replicate(docs, max(factors), n_docs)).localCheckpoint(
        eager=True
    )
    for bound in (500, 5000):
        spark.conf.set(conf, str(bound))
        biggest = max_arrow_batch(rep)
        ok = "ok" if biggest <= bound else "VIOLATED"
        print(
            f"maxRecordsPerBatch={bound}: largest observed batch {biggest} [{ok}]",
            flush=True,
        )
        assert biggest <= bound
    if original is not None:
        spark.conf.set(conf, original)




def probe_streaming_embedding_neardup() -> None:
    """Growth probe for the streaming embedding near-dup sink: per-batch
    wall clock as the admitted index grows (fixed batch size). Expected
    shape: the batch's candidate set is |batch| × n_probe / n_centroids
    × mean cell size, so per-batch cost grows LINEARLY with index size
    at fixed quantizer — the documented IVF trade; the mitigation at
    100 TB is n_centroids sized to the corpus (cells stay
    bounded), which `ivf_cell_stats` makes observable.

    Run: python scripts/probe_multimodal.py stream
    """
    spark = get_spark("probe-emb-stream")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").localCheckpoint()
    n = emb.count()
    for n_centroids in (16, 64):
        _run_emb_stream_probe(emb, n, n_centroids)


def _run_emb_stream_probe(emb, n, n_centroids) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from token_etl_spark.operators.similarity import spherical_kmeans
    from token_etl_spark.streaming.dedup import _embedding_neardup_sink_batch

    print(f"--- n_centroids={n_centroids} (n_probe=4 fixed) ---", flush=True)
    root = tempfile.mkdtemp(prefix="embstream_")
    index_path = f"{root}/idx"
    cents = spherical_kmeans(emb, n_centroids=n_centroids, n_iters=2)
    cents.write.mode("overwrite").parquet(f"{index_path}/centroids")

    batch_size = 2000
    dim = len(emb.select("embedding").first()[0])
    for g in range(8):
        # rotate the array by g positions: deterministic, and rolled
        # random-ish vectors are near-orthogonal to their originals, so
        # every generation is genuinely NOVEL (a same-vector replay
        # would match its index copy at cosine 1.0 and the index would
        # stop growing after batch 1 — measuring nothing)
        v = F.col("embedding")
        rolled = (
            F.concat(F.slice(v, g + 1, dim - g), F.slice(v, 1, g)) if g else v
        )
        batch = emb.select(
            (F.col("vec_id") + g * n).alias("vec_id"), rolled.alias("embedding")
        ).limit(batch_size).localCheckpoint(eager=True)
        t0 = time.time()
        _embedding_neardup_sink_batch(batch, f"probe000-{g}", index_path)
        dt = time.time() - t0
        print(
            f"batch {g}: index≈{g * batch_size:>6} vectors, sink {dt:5.2f} s",
            flush=True,
        )
    shutil.rmtree(root)


if __name__ == "__main__":
    if sys.argv[1:2] == ["stream"]:
        probe_streaming_embedding_neardup()
    else:
        main()
