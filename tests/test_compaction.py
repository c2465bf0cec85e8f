"""Small-files compaction (operators/layout.py compact_files): a
thousand tiny files in, a handful of target-size files out — the
operational fix for streaming-sink and per-batch-upsert fragmentation.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from token_etl_spark.operators.layout import compact_files, dir_size_bytes


def _files(path: str) -> list[str]:
    return glob.glob(path + "/**/*.parquet", recursive=True)


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
    )
    # simulate a fragmented sink: 64 tiny files
    df.repartition(64).write.parquet(src)
    assert len(_files(src)) == 64

    total = dir_size_bytes(spark, src)
    assert total > 0
    # target sized so the rewrite lands at a small handful of files
    target_mb = max(1, (total >> 20) or 1)
    n = compact_files(spark, src, out, target_mb=target_mb)
    got = _files(out)
    assert len(got) == n
    assert len(got) < 64
    # content is preserved exactly
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert b.count() == 20_000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_with_sort_col_restores_clustering(spark, tmp_path):
    src = str(tmp_path / "frag_sorted")
    out = str(tmp_path / "compact_sorted")
    df = (
        spark.range(40_000)
        .select(
            (F.hash("id") % 10_000).alias("x"),
            F.repeat(F.sha1(F.col("id").cast("string")), 4).alias("pad"),
        )
        .filter("x >= 0")
    )
    # round-robin fragmentation destroys any clustering on x
    df.repartition(32).write.parquet(src)

    compact_files(spark, src, out, target_mb=1, sort_col="x")
    files = _files(out)
    assert len(files) >= 2

    def span(f):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(j).name for j in range(md.num_columns)].index("x")
        los = [md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)]
        his = [md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)]
        return min(los), max(his)

    # range-partitioned rewrite → per-file x ranges are disjoint-ish and
    # narrow, so min-max pruning works again after compaction
    spans = sorted(span(f) for f in files)
    full = 10_000.0
    assert all((hi - lo) < 0.8 * full for lo, hi in spans)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert lo_next >= hi_prev - 1  # ordered, non-overlapping (±boundary dup)
