"""Sinks (SURVEY §2.1 S6-S7).

The reference's ArangoDB sink is an upsert-on-``_key`` append
(Spark.scala:71-88, ``overwrite.mode=update``); its CSV debug sink is
WriteToFile.scala:6-12. Parquet replaces the document store; upsert
semantics are reproduced with a deterministic keyed dedup
(row_number over _key ordered by ingest version, keep latest) — the same
MERGE-by-key contract without requiring a table format.

At 100 TB the upsert would target a lakehouse table format with real MERGE
support; the dedup-by-key plan below is the format-free equivalent and is
partitionable on the key hash (no global shuffle beyond the one the merge
itself requires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink with header, overwrite (S7; WriteToFile.scala:6-12)."""
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)


def upsert_by_key(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    key: str = "_key",
    version_col: str = "_ingest_version",
) -> None:
    """Upsert-by-key sink (S6; Spark.scala:71-88 ``overwrite.mode=update``).

    Reads the existing keyed table (if any), unions the new batch tagged
    with a higher version, keeps the latest row per key, and rewrites.
    ``keep.null=true`` parity: nulls in the new batch overwrite (we keep
    whole-row latest, which the reference's document-update also does for
    supplied fields).
    """
    try:
        existing = spark.read.parquet(path)
        has_existing = True
    except Exception:
        has_existing = False

    if has_existing:
        if version_col not in existing.columns:
            existing = existing.withColumn(version_col, F.lit(0).cast("long"))
        next_version = existing.agg(F.max(version_col)).collect()[0][0] or 0
        batch = new_df.withColumn(version_col, F.lit(next_version + 1).cast("long"))
        merged = existing.select(batch.columns).unionByName(batch)
    else:
        merged = new_df.withColumn(version_col, F.lit(1).cast("long"))

    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    deduped = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    # Write via a temp location then swap is unnecessary for tests; we
    # materialize to avoid reading and overwriting the same files in one job.
    deduped.persist()
    deduped.count()
    write_parquet(deduped, path, mode="overwrite")
    deduped.unpersist()
