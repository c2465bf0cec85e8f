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

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _read_existing(spark: SparkSession, path: str) -> DataFrame | None:
    """Read the target table, distinguishing "does not exist yet" (→ None)
    from real failures. A bare ``except Exception`` here would treat a
    transient storage error or corrupt footer as first-write and let the
    subsequent overwrite discard existing rows — only the analyzer's
    path-not-found is a legitimate first-write signal; everything else
    re-raises.
    """
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def _latest_per_key(merged: DataFrame, key: str, version_col: str) -> DataFrame:
    """Keep the highest-version row per key. Duplicate keys WITHIN one
    batch share a version, so break ties deterministically on the row's
    content hash — the winner is arbitrary-but-stable across retries
    (input order inside a shuffled batch is not reproducible; a hash is).
    """
    tiebreak = F.xxhash64(*[F.col(c) for c in merged.columns])
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc(), tiebreak.desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


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
    existing = _read_existing(spark, path)

    if existing is not None:
        if version_col not in existing.columns:
            existing = existing.withColumn(version_col, F.lit(0).cast("long"))
        next_version = existing.agg(F.max(version_col)).collect()[0][0] or 0
        batch = new_df.withColumn(version_col, F.lit(next_version + 1).cast("long"))
        merged = existing.select(batch.columns).unionByName(batch)
    else:
        merged = new_df.withColumn(version_col, F.lit(1).cast("long"))

    deduped = _latest_per_key(merged, key, version_col)

    # Write via a temp location then swap is unnecessary for tests; we
    # materialize to avoid reading and overwriting the same files in one job.
    deduped.persist()
    deduped.count()
    write_parquet(deduped, path, mode="overwrite")
    deduped.unpersist()


def upsert_by_key_incremental(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    key: str = "_key",
    n_buckets: int = 16,
    version_col: str = "_ingest_version",
) -> None:
    """Incremental upsert: hash-bucket the key space into ``n_buckets``
    parquet partitions and rewrite ONLY the buckets the batch touches
    (ROADMAP 3 — the lakehouse-free approximation of MERGE INTO).

    A key lives entirely inside its ``pmod(xxhash64(key), n_buckets)``
    bucket, so per-bucket merge + dynamic partition overwrite preserves
    upsert-by-key semantics while leaving untouched buckets' files alone.
    At 100 TB with a well-sized bucket count, a small batch rewrites
    |touched buckets| / n_buckets of the table instead of all of it; the
    bucket list collected to the driver is bounded by ``n_buckets``, never
    by data size.
    """
    batch = new_df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    existing = _read_existing(spark, path)

    if existing is None:
        merged = batch.withColumn(version_col, F.lit(1).cast("long"))
    else:
        touched = sorted(r[0] for r in batch.select("_bucket").distinct().collect())
        affected = existing.filter(F.col("_bucket").isin(touched))
        next_version = affected.agg(F.max(version_col)).collect()[0][0] or 0
        batch = batch.withColumn(version_col, F.lit(next_version + 1).cast("long"))
        merged = affected.select(batch.columns).unionByName(batch)

    deduped = _latest_per_key(merged, key, version_col)
    # Materialize before overwriting partitions we just read from.
    deduped = deduped.localCheckpoint(eager=True)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        deduped.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def read_upserted(spark: SparkSession, path: str) -> DataFrame:
    """Read an upserted table, hiding the bookkeeping columns."""
    df = spark.read.parquet(path)
    return df.drop(*[c for c in ("_bucket", "_ingest_version") if c in df.columns])


def write_sorted(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 32,
    descending: bool = False,
) -> DataFrame:
    """Globally-sorted parquet export (O1 at scale; the reference's
    ``orderBy`` before its sink, WriteToFile.scala:6-12 — but a bare
    ``orderBy`` + single writer is the 100 TB anti-plan).

    Scale shape: ``repartitionByRange`` samples range boundaries and
    distributes rows so partition i's keys all sort before partition
    i+1's (a RangePartitioning exchange — parallel, no single-task
    global sort); ``sortWithinPartitions`` orders inside each range with
    a per-partition spillable sort. Part-file index == partition id, so
    concatenating files in filename order IS the global order — the
    contract consumers (sequential trainers, mergers) actually need.

    Returns the serving-side pruning manifest: one row per file with
    (file_name, min/max of the leading sort key, n_rows), read back from
    the written footers — the index a reader uses to binary-search files
    without opening them.
    """
    cols = [F.col(c).desc() if descending else F.col(c).asc() for c in sort_cols]
    out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    out.write.mode("overwrite").parquet(path)
    lead = sort_cols[0]
    return (
        spark.read.parquet(path)
        .withColumn("file_name", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .groupBy("file_name")
        .agg(
            F.min(lead).alias("min_key"),
            F.max(lead).alias("max_key"),
            F.count("*").alias("n_rows"),
        )
    )
