"""Streaming curation — ingest-time filtering for a training-data
pipeline: PII redaction and benchmark decontamination applied to a
document stream before it lands in the corpus.

Both are streaming twins of operators/curation.py:

- ``streaming_pii_redact``: stateless narrow projection (regexp count +
  redact) — identical expression tree to the batch ``pii_scan``, so the
  two provably agree row-for-row (tested against the batch op).
- ``streaming_decontaminate``: stream-static join against the *static*
  benchmark shingle set, collapsed to one broadcast array. Stateless —
  no watermark or state store — which is exactly why decontamination
  belongs at ingest: the eval set is fixed, the stream is infinite.

No counterpart exists in the reference (SURVEY §2.9 — batch only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from token_etl_spark.operators.curation import pii_scan
from token_etl_spark.operators.dedup import shingle_array_expr, shingles
from token_etl_spark.operators.text import tokens


def streaming_pii_redact(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + redacted text on a stream. Stateless —
    the batch expression tree applies verbatim."""
    return pii_scan(stream, text_col=text_col, id_col=id_col)


def streaming_line_cleanup(
    stream: DataFrame, text_col: str = "text", dedup_lines: bool = True
) -> DataFrame:
    """Ingest-time line hygiene on a document stream: C4-style line
    filtering (``line_filter``) then intra-document line dedup
    (``line_dedup``) applied SEQUENTIALLY — dedup runs on line_filter's
    ``cleaned`` output, so ``deduped`` holds the filtered-then-deduped
    text (a consumer reading ``deduped`` gets both hygiene stages, not
    just one). Both are stateless narrow projections — the batch
    expression trees apply verbatim, so stream and batch provably agree
    row-for-row (tested). Line-level cleanup belongs at ingest for the
    same reason PII redaction does: it is per-row, needs no state, and
    shrinks every byte that flows downstream."""
    from token_etl_spark.operators.text import line_dedup, line_filter

    out = line_filter(stream, text_col=text_col)
    if dedup_lines:
        out = line_dedup(out, text_col="cleaned")
    return out


def benchmark_shingle_set(
    benchmark: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct shingle set of the static benchmark side: one
    ``(shingle)`` row each, ready to collapse + broadcast."""
    return shingles(benchmark, text_col=text_col, id_col=id_col, k=k).select(
        "shingle"
    ).distinct()


def streaming_decontaminate(
    stream: DataFrame,
    bench_shingles: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "drop",
) -> DataFrame:
    """Drop (``mode='drop'``) or flag (``mode='flag'``) stream documents
    sharing any k-shingle with the benchmark set.

    The stream side computes its shingle array NARROWLY (tokens
    materialized once, no explode → no shuffle, no state); contamination
    is ``arrays_overlap`` against the benchmark set collapsed to a
    single broadcast array — one stateless projection per micro-batch.
    An eval suite's distinct shingles are MBs, well under broadcast
    limits; for a pathologically large benchmark fall back to the batch
    ``ngram_decontaminate`` per micro-batch via ``foreachBatch``.
    """
    bench_arr = bench_shingles.agg(F.collect_set("shingle").alias("_bench"))
    base = stream.withColumn("_toks", tokens(F.col(text_col))).withColumn(
        "_sh", shingle_array_expr(F.col("_toks"), k)
    )
    flagged = (
        base.crossJoin(F.broadcast(bench_arr))
        .withColumn(
            "contaminated",
            F.coalesce(F.arrays_overlap("_sh", "_bench"), F.lit(False)),
        )
        .drop("_toks", "_sh", "_bench")
    )
    if mode == "drop":
        return flagged.where(~F.col("contaminated")).drop("contaminated")
    return flagged
