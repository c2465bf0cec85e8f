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

import warnings

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Staging-dir suffixes are PER PROTOCOL: the whole-table swap
# (.staging-full — the staged dir is a complete replacement table,
# healing renames it over the final dir) and the per-bucket swap
# (.staging-buckets — the staged dir holds only touched _bucket=N
# subdirs, healing renames them individually). A shared suffix would
# let one protocol's heal consume the other's staging dir — the
# full-swap heal would rename a bucket-only staging over the whole
# table, dropping every untouched bucket (ADVICE r10).
_STAGING_FULL = ".staging-full"
_STAGING_BUCKETS = ".staging-buckets"

#: Touched-bucket fraction above which merge_touched_buckets falls back
#: to one staged full rewrite: the r9 probe measured a uniform batch
#: touching 61/64 buckets at 2.4× the cost of a full rewrite (per-bucket
#: staging renames + the isin filter buy nothing once most buckets are
#: rewritten anyway — PERF.md "touched-bucket merge").
_FULL_REWRITE_FRACTION = 0.75


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

    Commit protocol: the merged table is written to a sibling
    ``.staging`` dir and swapped in via rename — an in-place overwrite
    of the ONLY copy would lose the whole table on a crash mid-write.
    :func:`_heal_full_swap` (run first) finishes a crash-interrupted
    swap (complete staging, ``_SUCCESS`` present) or discards an
    incomplete staging write. Single-writer contract, like every state
    sink in this package.
    """
    _heal_full_swap(spark, path)
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
    _full_swap(spark, deduped, path)


def _full_swap(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    marker_n_buckets: int | None = None,
) -> None:
    """Stage ``df`` as a COMPLETE replacement table at
    ``<path>.staging-full`` and swap it over ``path`` via rename —
    shared by :func:`upsert_by_key` and the saturated-batch fallback in
    :func:`merge_touched_buckets`. An in-place overwrite of the only
    copy would lose the whole table on a crash mid-write.

    ``marker_n_buckets``: when set, the ``_n_buckets`` marker is written
    INTO the staging dir before the rename so it travels with the swap.
    Residual window, stated honestly: a crash between the staging job's
    ``_SUCCESS`` and the driver-side marker write heals (via
    ``_heal_full_swap``, which cannot know the count) into a marker-less
    final dir — that one commit then goes through the VALIDATED
    structural-adoption path of ``_check_bucket_count`` (loud warning,
    bucket-id bounds checked) at the next merge instead of the hard
    marker equality. The bucket-swap protocol closes its equivalent
    window completely by gating completeness on the marker itself
    (see :func:`_heal_bucket_swap`); the full swap cannot, because
    ``upsert_by_key`` legitimately stages marker-less tables."""
    staging = path.rstrip("/") + _STAGING_FULL
    write_parquet(df, staging, mode="overwrite", partition_by=partition_by)
    if marker_n_buckets is not None:
        _write_bucket_marker(spark, staging, marker_n_buckets)
    fs, hpath = _bucket_fs(spark, path)
    if not fs.exists(hpath(staging + "/_SUCCESS")):
        raise IOError(
            f"staging write at {staging} left no _SUCCESS marker — refusing "
            "to swap (set mapreduce.fileoutputcommitter.marksuccessfuljobs)"
        )
    dst = hpath(path)
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(hpath(staging), dst):
        raise IOError(f"upsert swap failed: rename {staging} -> {path}")


def _heal_full_swap(spark: SparkSession, path: str) -> None:
    """Crash recovery for the whole-table staging swap (:func:`_full_swap`):
    a COMPLETE staging dir (``_SUCCESS`` present — the swap only starts
    after the staging write returned) strictly supersedes whatever final
    state exists, so finish the swap; an INCOMPLETE one (crash mid-write)
    is discarded — the caller's retry rewrites it. Only consumes
    ``.staging-full`` dirs: a per-bucket staging (``.staging-buckets``)
    is NOT a complete table and renaming it over the final dir would
    drop every untouched bucket."""
    _heal_legacy_staging(spark, path)
    fs, hpath = _bucket_fs(spark, path)
    staging = path.rstrip("/") + _STAGING_FULL
    sp = hpath(staging)
    if not fs.exists(sp):
        return
    if fs.exists(hpath(staging + "/_SUCCESS")):
        dst = hpath(path)
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(sp, dst):
            raise IOError(f"upsert swap recovery failed: {staging} -> {path}")
    else:
        fs.delete(sp, True)


def _heal_legacy_staging(spark: SparkSession, path: str) -> None:
    """One-time migration heal for PRE-suffix-split ``<path>.staging``
    dirs (both protocols shared that name before r10): without this, a
    crash-interrupted swap from the old code would be orphaned forever —
    worst case the old full-swap crash window (final dir deleted,
    complete ``.staging`` holding the ONLY copy), where ignoring the
    legacy dir makes the next upsert rebuild the table from the new
    batch alone, silently dropping every prior row.

    Protocol is recovered from the staging dir's own layout: the old
    bucket merge staged ``_bucket=N`` partition subdirs, the old full
    upsert staged flat part files — so ``_bucket=`` entries ⇒ bucket
    semantics (rename each staged bucket over its final counterpart),
    otherwise ⇒ full semantics (rename the dir over the table).
    Incomplete legacy staging (no ``_SUCCESS``) is discarded, exactly as
    the old heals did."""
    fs, hpath = _bucket_fs(spark, path)
    staging = path.rstrip("/") + ".staging"
    sp = hpath(staging)
    if not fs.exists(sp):
        return
    if not fs.exists(hpath(staging + "/_SUCCESS")):
        fs.delete(sp, True)
        return
    entries = list(fs.listStatus(sp))
    staged_buckets = [
        st.getPath()
        for st in entries
        if st.getPath().getName().startswith("_bucket=")
    ]
    # data files = anything not underscore-prefixed (part-*.parquet).
    # A _SUCCESS-only staging is the leftover of the OLD bucket heal
    # crashing between its last bucket rename and the staging delete —
    # treating it as a full-swap staging would DELETE the live table
    # and rename an empty dir over it. Data-free staging ⇒ discard.
    has_data_files = any(
        not st.getPath().getName().startswith("_") for st in entries
    )
    if staged_buckets:
        fs.mkdirs(hpath(path))
        for src in staged_buckets:
            dst = hpath(path.rstrip("/") + "/" + src.getName())
            if fs.exists(dst):
                fs.delete(dst, True)
            if not fs.rename(src, dst):
                raise IOError(f"legacy bucket swap failed: {src} -> {path}")
        fs.delete(sp, True)
    elif has_data_files:
        dst = hpath(path)
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(sp, dst):
            raise IOError(f"legacy swap recovery failed: {staging} -> {path}")
    else:
        fs.delete(sp, True)


def _bucket_fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path constructor) for ``path`` — the
    filesystem-agnostic handle (local, HDFS, mounted object store)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path
    return hpath(path).getFileSystem(sc._jsc.hadoopConfiguration()), hpath


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` if it exists (no-op otherwise) —
    the shared stale-staging/partial-write cleanup used by the state
    sinks (streaming dedup, state compaction, checkpointed BPE)."""
    fs, hpath = _bucket_fs(spark, path)
    p = hpath(path)
    if fs.exists(p):
        fs.delete(p, True)


def _write_bucket_marker(spark: SparkSession, path: str, n_buckets: int) -> None:
    """Persist the ``_n_buckets`` marker (overwrites; underscore-prefixed
    so parquet readers ignore it)."""
    fs, hpath = _bucket_fs(spark, path)
    out = fs.create(hpath(path.rstrip("/") + "/_n_buckets"), True)
    try:
        out.write(str(n_buckets).encode())
    finally:
        out.close()


def _check_bucket_count(spark: SparkSession, path: str, n_buckets: int) -> None:
    """Validate ``n_buckets`` against the state's persisted marker: a key
    lives entirely inside its ``pmod(hash, n_buckets)`` bucket, so a
    merge run with a DIFFERENT bucket count would read the wrong touched
    set and silently duplicate keys across buckets. The first write
    records the marker; every later merge must match or gets a loud
    ValueError.

    A legacy dir with NO marker is not trusted blindly (ADVICE r10 —
    one wrong call on a pre-marker dir would both corrupt that merge and
    persist the wrong count as truth): its existing ``_bucket=N``
    partition dirs are validated structurally (every N must be
    < n_buckets) before the current value is adopted, and the adoption
    is warned loudly. The structural check cannot prove the ORIGINAL
    count wasn't a larger one whose high buckets happen to be empty —
    hence the warning rather than silence."""
    fs, hpath = _bucket_fs(spark, path)
    marker = hpath(path.rstrip("/") + "/_n_buckets")
    if fs.exists(marker):
        stream = fs.open(marker)
        try:
            recorded = int(bytes(stream.readAllBytes()).decode().strip())
        finally:
            stream.close()
        if recorded != n_buckets:
            raise ValueError(
                f"bucketed state at {path} was written with n_buckets="
                f"{recorded}, merge called with n_buckets={n_buckets}: "
                "mismatched bucketing silently duplicates keys — pass the "
                "original bucket count"
            )
    elif fs.exists(hpath(path)):
        ids = [
            int(st.getPath().getName().split("=", 1)[1])
            for st in fs.listStatus(hpath(path))
            if st.getPath().getName().startswith("_bucket=")
        ]
        bad = sorted(i for i in ids if i >= n_buckets)
        if bad:
            raise ValueError(
                f"marker-less bucketed state at {path} holds bucket ids "
                f"{bad} >= n_buckets={n_buckets}: it was written with a "
                "larger bucket count — pass the original count"
            )
        warnings.warn(
            f"adopting n_buckets={n_buckets} for marker-less bucketed state "
            f"at {path} (existing bucket ids validated structurally; if the "
            "dir was written with a LARGER count whose high buckets are "
            "empty, this adoption is wrong — verify the original count)",
            stacklevel=3,
        )
        _write_bucket_marker(spark, path, n_buckets)


def _heal_bucket_swap(spark: SparkSession, path: str) -> None:
    """Crash recovery for the per-bucket staging swap: a COMPLETE staging
    dir is finished — every staged bucket replaces its final counterpart;
    an INCOMPLETE one is discarded — the stream's retry of the same batch
    rewrites it. Single-writer contract (one stream per state dir), same
    as every state sink in this package. Only consumes
    ``.staging-buckets`` dirs (see the suffix constants).

    COMPLETE means both ``_SUCCESS`` (the parquet job committed) AND
    ``_n_buckets`` (the driver finished staging the marker) exist: the
    marker is written after the job commit, so gating on both closes the
    crash window between them — a staging with ``_SUCCESS`` but no
    marker is discarded and the batch retried, never healed into a
    committed-but-marker-less final dir (which would silently downgrade
    the hard bucket-count check to warn-only structural adoption)."""
    fs, hpath = _bucket_fs(spark, path)
    staging = path.rstrip("/") + _STAGING_BUCKETS
    sp = hpath(staging)
    if not fs.exists(sp):
        return
    if fs.exists(hpath(staging + "/_SUCCESS")) and fs.exists(
        hpath(staging + "/_n_buckets")
    ):
        fs.mkdirs(hpath(path))
        for st in fs.listStatus(sp):
            name = st.getPath().getName()
            if not name.startswith("_bucket="):
                continue
            dst = hpath(path.rstrip("/") + "/" + name)
            if fs.exists(dst):
                fs.delete(dst, True)
            if not fs.rename(st.getPath(), dst):
                raise IOError(f"bucket swap failed: {name} -> {path}")
        # the marker travels WITH the staged commit (written into staging
        # before the swap): install it if the final dir lacks one, so no
        # crash point leaves a committed-but-marker-less state that would
        # downgrade the hard count check to warn-only adoption. Never
        # overwrites an existing marker — the merge validated it at start.
        smarker = hpath(staging + "/_n_buckets")
        fmarker = hpath(path.rstrip("/") + "/_n_buckets")
        if fs.exists(smarker) and not fs.exists(fmarker):
            if not fs.rename(smarker, fmarker):
                raise IOError(f"bucket marker install failed at {path}")
    fs.delete(sp, True)


def merge_touched_buckets(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    merge,
    n_buckets: int,
    bucket_col: str = "_bucket",
) -> None:
    """The touched-bucket MERGE approximation, shared by the incremental
    upsert sink (keep-latest) and the streaming URL-dedup state
    (keep-best): ``batch`` already carries ``bucket_col``; ``merge(
    affected_or_None, batch) -> DataFrame`` collapses the union to one
    row per key (still carrying ``bucket_col``). Only the buckets the
    batch touches are read, merged, and replaced; the driver-side bucket
    list is bounded by ``n_buckets``, never by data size.

    Commit protocol: the merged buckets are written to a sibling
    ``.staging`` dir first, then each staged bucket dir REPLACES its
    final counterpart via rename — so a crash can never leave a bucket
    half-written, and :func:`_heal_bucket_swap` (run at the start of
    every merge) finishes or discards an interrupted swap using the
    staging write's ``_SUCCESS`` marker as the completeness signal.
    The remaining exposure is bounded to the healed window — unlike a
    dynamic-partition overwrite, whose delete-then-move inside the
    committer can lose a bucket's PRIOR rows with nothing on disk to
    recover from. ``n_buckets`` is validated against the state's
    persisted marker (:func:`_check_bucket_count`).

    Saturation guard (r10): when the batch touches ≥
    ``_FULL_REWRITE_FRACTION`` of all buckets, per-bucket staging buys
    nothing — the r9 probe measured a uniform batch touching 61/64
    buckets at 2.4× a full rewrite's cost — so the merge degrades to ONE
    staged full rewrite (same output: both merge callbacks are
    idempotent per-key folds, so untouched keys pass through unchanged),
    swapped whole-dir and re-marked. Both heal protocols run up front
    because either commit path may have been interrupted."""
    _heal_bucket_swap(spark, path)
    _heal_full_swap(spark, path)
    _check_bucket_count(spark, path, n_buckets)
    existing = _read_existing(spark, path)
    if existing is None:
        merged = merge(None, batch)
    else:
        touched = sorted(
            r[0] for r in batch.select(bucket_col).distinct().collect()
        )
        if len(touched) >= _FULL_REWRITE_FRACTION * n_buckets:
            warnings.warn(
                f"batch touches {len(touched)}/{n_buckets} buckets at {path}: "
                "falling back to one staged full rewrite (per-bucket staging "
                "costs more than a full rewrite once most buckets are touched "
                "— if batches are routinely this uniform, raise n_buckets or "
                "use upsert_by_key)",
                stacklevel=2,
            )
            merged = merge(existing, batch)
            _full_swap(
                spark,
                merged.repartition(n_buckets, bucket_col),
                path,
                partition_by=[bucket_col],
                marker_n_buckets=n_buckets,  # travels atomically with the swap
            )
            return
        affected = existing.filter(F.col(bucket_col).isin(touched))
        merged = merge(affected, batch)
    staging = path.rstrip("/") + _STAGING_BUCKETS
    # co-partition on the bucket before the partitioned write: without it
    # every writing task splays a file into every bucket dir (tasks ×
    # buckets tiny files — measured 5.1 s vs 1.3 s and 4,098 vs 130 files
    # at gate scale). One task per bucket caps write parallelism at
    # n_buckets, which the sizing rule already demands exceed the
    # cluster's parallelism at scale.
    merged = merged.repartition(n_buckets, bucket_col)
    merged.write.mode("overwrite").partitionBy(bucket_col).parquet(staging)
    # the marker rides the staged commit: a bucket staging only counts
    # as COMPLETE once BOTH _SUCCESS and _n_buckets exist (the heal's
    # gate), so a crash before this marker write discards the staging
    # and the batch retries — no crash point heals committed buckets
    # into a marker-less final dir
    _write_bucket_marker(spark, staging, n_buckets)
    fs, hpath = _bucket_fs(spark, path)
    if not fs.exists(hpath(staging + "/_SUCCESS")):
        raise IOError(
            f"staging write at {staging} left no _SUCCESS marker — refusing "
            "to swap (set mapreduce.fileoutputcommitter.marksuccessfuljobs)"
        )
    _heal_bucket_swap(spark, path)  # the swap IS the heal of a complete staging


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
    bucket, so per-bucket merge preserves upsert-by-key semantics while
    leaving untouched buckets' files alone. At 100 TB with a well-sized
    bucket count, a small batch rewrites |touched buckets| / n_buckets
    of the table instead of all of it. Commit + crash recovery + bucket-
    count validation via :func:`merge_touched_buckets`.
    """
    batch = new_df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )

    def _merge(affected: DataFrame | None, b: DataFrame) -> DataFrame:
        if affected is None:
            merged = b.withColumn(version_col, F.lit(1).cast("long"))
        else:
            next_version = affected.agg(F.max(version_col)).collect()[0][0] or 0
            b = b.withColumn(version_col, F.lit(next_version + 1).cast("long"))
            merged = affected.select(b.columns).unionByName(b)
        return _latest_per_key(merged, key, version_col)

    merge_touched_buckets(spark, batch, path, _merge, n_buckets)


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


def export_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    tokens_per_shard: int,
    key_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    seed: str = "s0",
) -> DataFrame:
    """Write a corpus as size-balanced training shards — the export
    last-mile in one call: ``assign_shards`` (deterministic md5-tape
    assignment, two-phase global cumsum) → parquet partitioned by
    ``shard_id`` under ``<path>/data`` → the shard manifest (doc/token
    totals + [first_key, last_key] ranges) under ``<path>/manifest``.
    Returns the manifest frame read back from disk.

    Layout discipline (the r10 partitionBy lesson): rows repartition on
    ``shard_id`` BEFORE ``partitionBy`` — without the co-partition every
    task writes a sliver into every shard directory (tasks × shards tiny
    files; 4,098 vs 130 measured in PERF.md r10); with it each shard's
    rows land in exactly one task, one file per shard. Rows sort within
    partitions by ``ord_key``, so a shard's byte layout is a pure
    function of corpus content — re-exports are bit-comparable and a
    sequential trainer reading file order replays the manifest order.

    Determinism end-to-end: same corpus + same (key_col, seed, budget)
    → same assignment, same manifest, same per-shard file content.
    Incremental follow-ups route by manifest range (``route_to_shards``)
    instead of re-running this.
    """
    from token_etl_spark.operators.curation import assign_shards, shard_manifest

    assigned = assign_shards(
        df,
        tokens_per_shard,
        key_col=key_col,
        token_col=token_col,
        text_col=text_col,
        seed=seed,
    )
    # sort by (shard_id, ord_key), not ord_key alone: the dynamic-
    # partition writer requires ordering by the partition column and
    # would insert its OWN sort on shard_id whose stability is not
    # guaranteed once it spills — satisfying the required ordering
    # ourselves keeps equal-shard rows in ord_key order by construction
    # (review-found r11)
    (
        assigned.repartition("shard_id")
        .sortWithinPartitions("shard_id", "ord_key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(f"{path}/data")
    )
    # manifest derived from the WRITTEN data, not the in-memory frame —
    # what the export audits is what readers will actually see (the
    # partition-path column comes back as int; restore the long contract)
    written = spark.read.parquet(f"{path}/data").withColumn(
        "shard_id", F.col("shard_id").cast("long")
    )
    shard_manifest(written).write.mode("overwrite").parquet(f"{path}/manifest")
    # persist the routing parameters beside the manifest: incremental
    # consumers (route_to_shards / the streaming router) MUST use the
    # same (key_col, seed) or keys land in foreign ranges — recording
    # them makes that mismatch detectable instead of silently corrupting
    # the layout (review-found r11)
    spark.createDataFrame(
        [(key_col, seed, int(tokens_per_shard))],
        "key_col string, seed string, tokens_per_shard long",
    ).write.mode("overwrite").parquet(f"{path}/params")
    return spark.read.parquet(f"{path}/manifest")


# ---------------------------------------------------------------------------
# shard-layout maintenance: split + incremental compaction
#
# Both actions rewrite a SMALL set of shard dirs plus the manifest, so
# they share one staged-commit protocol: stage complete replacement
# shard dirs and a complete replacement manifest under
# ``<path>.staging-shards``, write the ``_LAYOUT_COMMITTED`` marker
# only after every staged write returned, then rename each staged item
# into place and drop the staging root. A crash before the marker
# discards the staging (the caller retries); a crash after it is
# finished by ``_heal_shard_layout`` — run at the start of every
# maintenance action AND by the combined reader, so the one non-atomic
# window (between individual renames) self-heals on next touch, the
# same contract as the IVF index swap. Single-writer, like every state
# sink here.

_STAGING_SHARDS = ".staging-shards"
_SHARD_COMMIT_MARKER = "_LAYOUT_COMMITTED"
_DROP_INCOMING_FLAG = "_DROP_INCOMING"
#: staged tombstone: a file named _DROP_SHARD_ID=<N> in the staging root
#: makes the commit DELETE data/shard_id=<N> (the merge lever retires the
#: absorbed shard's dir; delete-if-exists, so replay stays idempotent)
_DROP_SHARD_PREFIX = "_DROP_SHARD_ID="


def _touch_marker(spark: SparkSession, file_path: str) -> None:
    fs, hpath = _bucket_fs(spark, file_path)
    fs.create(hpath(file_path), True).close()


def _apply_shard_layout(spark: SparkSession, path: str) -> None:
    """Perform (or re-perform, after a crash) the staged shard-layout
    commit: every staged ``shard_id=N`` dir replaces its counterpart
    under ``data/``, the staged manifest replaces ``manifest/``, the
    ``incoming/`` tree drops iff the staging carries the flag, and the
    staging root is removed. Each rename consumes its staged item, so
    re-running after any crash point is idempotent."""
    base = path.rstrip("/")
    root = base + _STAGING_SHARDS
    fs, hpath = _bucket_fs(spark, path)
    sp = hpath(root)
    # tombstones FIRST (the merge lever retires the absorbed shard's
    # dir): delete-if-exists, so a crashed-and-replayed commit is a
    # no-op on the second pass; the absorbed rows live in the staged
    # kept-shard dir, which renames below, so no crash point loses data
    for st in fs.listStatus(sp):
        name = st.getPath().getName()
        if name.startswith(_DROP_SHARD_PREFIX):
            victim = hpath(
                f"{base}/data/shard_id={int(name[len(_DROP_SHARD_PREFIX):])}"
            )
            if fs.exists(victim):
                fs.delete(victim, True)
    for st in fs.listStatus(sp):
        name = st.getPath().getName()
        if name.startswith("shard_id="):
            dst = hpath(f"{base}/data/{name}")
            if fs.exists(dst):
                fs.delete(dst, True)
            if not fs.rename(st.getPath(), dst):
                raise IOError(f"shard layout commit failed: {name} -> {base}/data")
    man_src = hpath(root + "/manifest")
    if fs.exists(man_src):
        dst = hpath(base + "/manifest")
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(man_src, dst):
            raise IOError(f"shard layout commit failed: manifest -> {base}")
    if fs.exists(hpath(root + "/" + _DROP_INCOMING_FLAG)):
        _delete_dir(spark, base + "/incoming")
    fs.delete(sp, True)


def _heal_shard_layout(
    spark: SparkSession, path: str, finish_only: bool = False
) -> None:
    """Crash recovery for the shard-layout commit: a staging root WITH
    the ``_LAYOUT_COMMITTED`` marker is finished (the commit only starts
    after every staged write returned), one without it is discarded —
    the interrupted caller retries from scratch.

    ``finish_only=True`` is the READ-path variant: it finishes a
    marker-present commit but NEVER deletes marker-less staging — a
    routine read racing an in-flight writer must not destroy the
    writer's half-staged work (review-found r12; the full heal is
    safe only under the maintenance actions' single-writer contract)."""
    root = path.rstrip("/") + _STAGING_SHARDS
    fs, hpath = _bucket_fs(spark, path)
    if not fs.exists(hpath(root)):
        return
    if fs.exists(hpath(root + "/" + _SHARD_COMMIT_MARKER)):
        _apply_shard_layout(spark, path)
    elif not finish_only:
        fs.delete(hpath(root), True)


def split_shard(spark: SparkSession, path: str, shard_id: int) -> DataFrame:
    """Split one over-budget shard's key range in two — the maintenance
    lever the range-sharding discipline promises (``route_to_shards``:
    "shards grow until the owner splits them"; a hot range — a crawl
    revisiting one site — would otherwise grow one shard without
    bound). Manifest-local decision, shard-local I/O: ONLY the target
    shard's rows are read and rewritten (two halves, one file each,
    ``ord_key``-sorted — the export layout), every other shard's bytes
    are untouched, and the updated manifest swaps in atomically via the
    staged-commit protocol above.

    The split point is :func:`~token_etl_spark.operators.curation.
    split_shard_rows` (token-balanced, document-count fallback); the
    second half takes ``max(shard_id) + 1`` — routing is by key RANGE
    (greatest ``first_key`` <= key), so shard ids are labels and need
    not stay contiguous. Ranges stay disjoint and ordered by
    construction: the new shard's ``first_key`` is the boundary
    document's key, strictly after every first-half key.

    Contract: quiesced stream, compacted layout — stream increments
    routed under the OLD range carry the old shard label, so splitting
    a shard that still has rows under ``incoming/`` would strand them;
    the call refuses and points at
    :func:`compact_incremental_shards`. Documents OUTSIDE the split
    range route identically before and after (pinned in
    tests/test_sinks.py); documents inside land in the half their key
    falls in.

    Returns the post-split manifest read back from disk.
    """
    from token_etl_spark.operators.curation import shard_manifest, split_shard_rows

    base = path.rstrip("/")
    _heal_shard_layout(spark, path)
    manifest = spark.read.parquet(f"{base}/manifest")
    target = manifest.where(F.col("shard_id") == int(shard_id)).collect()
    if not target:
        raise ValueError(
            f"split_shard: shard {shard_id} is not in the manifest at {path}"
        )
    if target[0]["n_docs"] < 2:
        raise ValueError(
            f"split_shard: shard {shard_id} holds a single document — no "
            "document is ever cut, so a 1-document shard cannot split"
        )
    _refuse_pending_increments(spark, path, [int(shard_id)], "split_shard")
    new_sid = int(manifest.agg(F.max("shard_id")).collect()[0][0]) + 1
    shard_rows = spark.read.parquet(f"{base}/data/shard_id={int(shard_id)}")
    halves = split_shard_rows(shard_rows, int(shard_id), new_sid)

    staging = base + _STAGING_SHARDS
    _delete_dir(spark, staging)
    # ONE job writes both halves (the compact pattern below): the
    # unpartitioned split window over the target shard runs once, not
    # once per half (review-found r12); the manifest then derives from
    # the data actually WRITTEN — the export_shards audit discipline
    (
        halves.repartition("shard_id")
        .sortWithinPartitions("shard_id", "ord_key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(staging)
    )
    staged = spark.read.parquet(staging).withColumn(
        "shard_id", F.col("shard_id").cast("long")
    )
    new_manifest = manifest.where(F.col("shard_id") != int(shard_id)).unionByName(
        shard_manifest(staged).select(manifest.columns)
    )
    new_manifest.write.mode("overwrite").parquet(f"{staging}/manifest")
    _touch_marker(spark, f"{staging}/{_SHARD_COMMIT_MARKER}")
    _apply_shard_layout(spark, path)
    return spark.read.parquet(f"{base}/manifest")


def _refuse_pending_increments(
    spark: SparkSession, path: str, shard_ids: list[int], action: str
) -> None:
    """Refuse a maintenance action while any of ``shard_ids`` still has
    stream increments under ``incoming/`` — increments carry the OLD
    shard label, so re-ranging now would strand them; the caller is
    pointed at :func:`compact_incremental_shards` (the split lever's
    refusal discipline, shared with merge)."""
    base = path.rstrip("/")
    fs, hpath = _bucket_fs(spark, path)
    incp = hpath(f"{base}/incoming")
    if not fs.exists(incp):
        return
    for st in fs.listStatus(incp):
        if not st.isDirectory():
            continue
        for sid in shard_ids:
            if fs.exists(hpath(f"{st.getPath().toString()}/shard_id={int(sid)}")):
                raise ValueError(
                    f"{action}: shard {sid} has stream increments under "
                    "incoming/ — run compact_incremental_shards first "
                    "(re-ranging now would strand their old-range labels)"
                )


def merge_shards(
    spark: SparkSession, path: str, shard_id_a: int, shard_id_b: int
) -> DataFrame:
    """Fold two ADJACENT undersized key ranges into one — the dual of
    :func:`split_shard` and the third leg of the maintenance triad
    (audit observable, compact, split + merge): a corpus that shrinks
    under aggressive dedup, or a split that later proves premature,
    otherwise leaves permanent sliver shards wasting file handles.

    Manifest-local decision, shard-local I/O: ONLY the two shards' rows
    are read and rewritten (one ``ord_key``-sorted file under the
    surviving id — the export layout), every other shard's bytes are
    untouched, and the updated manifest swaps in atomically via the
    staged-commit protocol, with a ``_DROP_SHARD_ID=<N>`` tombstone
    retiring the absorbed shard's dir in the same commit (delete
    happens before the staged rename and is delete-if-exists, so a
    crashed commit replays idempotently and no crash point loses rows —
    the absorbed rows are in the staged kept dir).

    The shard with the SMALLER ``first_key`` survives (the merged range
    starts at its ``first_key``, so routing by greatest-first_key-<=-key
    is unchanged for every document outside the pair and sends the
    absorbed range's documents to the kept shard). The pair must be
    ADJACENT in first_key order — merging across a gap would swallow
    the in-between shard's range and re-route ITS documents too; the
    call refuses. Same quiesced-stream discipline as split: increments
    under ``incoming/`` for either shard refuse and point at
    :func:`compact_incremental_shards`.

    Arithmetic: :func:`~token_etl_spark.operators.curation.
    merge_shard_rows` (counts/tokens add, range is the union) — but the
    committed manifest row derives from the rows actually WRITTEN
    (``shard_manifest`` over the staged read-back, the export audit
    discipline), with the pure arithmetic driver-proven separately
    (``ext_shard_merge``). Size policy is the CALLER's (what counts as
    "undersized" is a layout decision); this lever does the mechanics.

    Returns the post-merge manifest read back from disk.
    """
    from token_etl_spark.operators.curation import shard_manifest

    base = path.rstrip("/")
    _heal_shard_layout(spark, path)
    manifest = spark.read.parquet(f"{base}/manifest")
    rows = {
        r["shard_id"]: r
        for r in manifest.where(
            F.col("shard_id").isin(int(shard_id_a), int(shard_id_b))
        ).collect()
    }
    for sid in (shard_id_a, shard_id_b):
        if int(sid) not in rows:
            raise ValueError(
                f"merge_shards: shard {sid} is not in the manifest at {path}"
            )
    if int(shard_id_a) == int(shard_id_b):
        raise ValueError("merge_shards: cannot merge a shard with itself")
    keep, drop = sorted(rows.values(), key=lambda r: r["first_key"])
    between = manifest.where(
        (F.col("first_key") > keep["first_key"])
        & (F.col("first_key") < drop["first_key"])
    ).count()
    if between:
        raise ValueError(
            f"merge_shards: shards {shard_id_a} and {shard_id_b} are not "
            f"adjacent — {between} shard(s) hold ranges between them, and "
            "merging across a gap would swallow and re-route their ranges"
        )
    _refuse_pending_increments(
        spark, path, [keep["shard_id"], drop["shard_id"]], "merge_shards"
    )

    pair = spark.read.parquet(
        f"{base}/data/shard_id={keep['shard_id']}",
        f"{base}/data/shard_id={drop['shard_id']}",
    ).withColumn("shard_id", F.lit(int(keep["shard_id"])).cast("long"))

    staging = base + _STAGING_SHARDS
    _delete_dir(spark, staging)
    # one job writes the merged shard (the split-lever pattern); the
    # manifest row then derives from the data actually written
    (
        pair.repartition("shard_id")
        .sortWithinPartitions("shard_id", "ord_key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(staging)
    )
    staged = spark.read.parquet(staging).withColumn(
        "shard_id", F.col("shard_id").cast("long")
    )
    new_manifest = manifest.where(
        ~F.col("shard_id").isin(keep["shard_id"], drop["shard_id"])
    ).unionByName(shard_manifest(staged).select(manifest.columns))
    new_manifest.write.mode("overwrite").parquet(f"{staging}/manifest")
    _touch_marker(
        spark, f"{staging}/{_DROP_SHARD_PREFIX}{drop['shard_id']}"
    )
    _touch_marker(spark, f"{staging}/{_SHARD_COMMIT_MARKER}")
    _apply_shard_layout(spark, path)
    return spark.read.parquet(f"{base}/manifest")


def audit_shard_layout(spark: SparkSession, path: str) -> DataFrame:
    """The layout-integrity OBSERVABLE beside the split/compact levers
    (the index-health/retrain pairing discipline): recompute per-shard
    (n_docs, shard_tokens, first_key, last_key) from the data actually
    on disk — base tree plus any stream increments, exactly what
    ``read_incremental_shards`` serves — and compare against the
    manifest. One combinable groupBy at shard cardinality + a full
    outer join of two manifest-sized frames; the corpus rows never
    shuffle beyond the count.

    Emits one row per shard id seen on either side with ``status``:
    'ok' (all four fields agree), 'drift' (same shard, different
    accounting — e.g. un-compacted increments grew it, or a foreign
    writer touched the tree), 'manifest_only' (claimed but no data —
    the lost-dir failure a reader must know about), 'data_only'
    (rows outside any claimed shard). ``pending_increments`` marks
    drift explained by incoming/ batches awaiting
    :func:`compact_incremental_shards` — expected, not corruption.
    """
    from token_etl_spark.operators.curation import shard_manifest
    from token_etl_spark.streaming.curation import read_incremental_shards

    base = path.rstrip("/")
    # finish any committed-but-unfinished staging BEFORE the eager
    # manifest listing (the split/compact discipline): auditing across
    # a later heal would either throw FileNotFoundException when the
    # swap replaces manifest/ under the listed files, or compare the
    # stale pre-heal manifest and report spurious drift (ADVICE r12).
    # finish_only — a routine audit must never destroy an in-flight
    # writer's marker-less staging.
    _heal_shard_layout(spark, path, finish_only=True)
    manifest = spark.read.parquet(f"{base}/manifest")
    actual = shard_manifest(read_incremental_shards(spark, path))
    inc = _read_existing(spark, f"{base}/incoming")
    inc_sids = (
        inc.select(F.col("shard_id").cast("long")).distinct()
        if inc is not None
        else spark.createDataFrame([], "shard_id long")
    ).withColumn("_has_inc", F.lit(True))
    m = manifest.select(
        "shard_id",
        *[F.col(c).alias(f"m_{c}") for c in ("n_docs", "shard_tokens", "first_key", "last_key")],
    )
    a = actual.select(
        "shard_id",
        *[F.col(c).alias(f"d_{c}") for c in ("n_docs", "shard_tokens", "first_key", "last_key")],
    )
    joined = m.join(a, "shard_id", "full_outer").join(
        F.broadcast(inc_sids), "shard_id", "left"
    )
    agree = (
        (F.col("m_n_docs") == F.col("d_n_docs"))
        & (F.col("m_shard_tokens") == F.col("d_shard_tokens"))
        & (F.col("m_first_key") == F.col("d_first_key"))
        & (F.col("m_last_key") == F.col("d_last_key"))
    )
    status = (
        F.when(F.col("d_n_docs").isNull(), F.lit("manifest_only"))
        .when(F.col("m_n_docs").isNull(), F.lit("data_only"))
        .when(agree, F.lit("ok"))
        .otherwise(F.lit("drift"))
    )
    return joined.select(
        "shard_id",
        status.alias("status"),
        F.coalesce("_has_inc", F.lit(False)).alias("pending_increments"),
        "m_n_docs", "d_n_docs", "m_shard_tokens", "d_shard_tokens",
        "m_first_key", "d_first_key", "m_last_key", "d_last_key",
    )


def compact_incremental_shards(spark: SparkSession, path: str) -> DataFrame:
    """Fold every stream-routed increment (``incoming/``, written by
    ``run_streaming_shard_router``) into the base ``data/`` tree: each
    TOUCHED shard's dir rewrites as one ``ord_key``-sorted file holding
    base + increment rows, the manifest rows for touched shards
    recompute (counts, token totals, ranges — a prepend can extend a
    range downward), untouched shards' bytes never move, and the
    ``incoming/`` tree drops in the same staged commit. This is the
    pass that restores the one-file-per-shard export layout after a
    streaming window — and the precondition :func:`split_shard`
    enforces. Quiesced-stream contract: the router must not be writing
    concurrently (single-writer, like every state sink here).

    Returns the post-compaction manifest read back from disk; no-op
    (current manifest) when there are no increments.
    """
    from token_etl_spark.operators.curation import shard_manifest
    from token_etl_spark.streaming.dedup import _read_partitioned_state

    base = path.rstrip("/")
    _heal_shard_layout(spark, path)
    inc = _read_partitioned_state(spark, f"{base}/incoming")
    if inc is None:
        return spark.read.parquet(f"{base}/manifest")
    inc = inc.withColumn("shard_id", F.col("shard_id").cast("long"))
    touched = sorted(r[0] for r in inc.select("shard_id").distinct().collect())
    manifest = spark.read.parquet(f"{base}/manifest")
    base_data = spark.read.parquet(f"{base}/data").withColumn(
        "shard_id", F.col("shard_id").cast("long")
    )
    merged = base_data.where(F.col("shard_id").isin(touched)).unionByName(
        inc.select(*base_data.columns)
    )
    staging = base + _STAGING_SHARDS
    _delete_dir(spark, staging)
    # co-partition before partitionBy (the r10 splay rule): one task —
    # one file — per touched shard, rows in ord_key order
    (
        merged.repartition("shard_id")
        .sortWithinPartitions("shard_id", "ord_key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(staging)
    )
    new_manifest = manifest.where(~F.col("shard_id").isin(touched)).unionByName(
        shard_manifest(merged).select(manifest.columns)
    )
    new_manifest.write.mode("overwrite").parquet(f"{staging}/manifest")
    _touch_marker(spark, f"{staging}/{_DROP_INCOMING_FLAG}")
    _touch_marker(spark, f"{staging}/{_SHARD_COMMIT_MARKER}")
    _apply_shard_layout(spark, path)
    return spark.read.parquet(f"{base}/manifest")


def apply_shard_maintenance(
    spark: SparkSession,
    path: str,
    tokens_per_shard: int | None = None,
    split_factor: int = 2,
    merge_budget_num: int = 1,
    merge_budget_den: int = 1,
    max_actions: int = 16,
) -> tuple[DataFrame, list[dict], str]:
    """Drive plan → lever → re-plan to CONVERGENCE — the composed
    executor the planner-without-executor gap left to the operator
    (VERDICT r13 item 2; the retrain-lever and split-lever closures,
    one more turn of the crank): take
    :func:`~token_etl_spark.operators.curation.plan_shard_maintenance`'s
    recommendations, apply ONE lever, re-plan, repeat, until the plan is
    all-'ok', every remaining recommendation has refused, or the
    ``max_actions`` budget is spent.

    Policy per iteration (apply-one / re-audit / repeat — the planner's
    documented contract): SPLITS FIRST, largest shard first (an
    over-budget shard is the urgent case — it is the one growing), then
    merges, smallest combined pair first (the sliver-fold order the
    ``ext_shard_apply`` driver row replays via
    :func:`~token_etl_spark.operators.curation.merge_min_pair`; the
    executor's per-step merge choice is pinned equal to that arithmetic
    in tests/test_sinks.py). A lever that REFUSES — pending stream
    increments under ``incoming/``, a 1-doc shard — is recorded as
    'skipped' (once per unique action) and the next candidate is tried;
    refusals never wedge the loop and never trigger an implicit
    compact (quiescing the stream is the operator's call, not this
    function's).

    Convergence: merges strictly reduce shard count and a merged pair
    never re-splits as long as ``merge_budget_num / merge_budget_den <=
    split_factor`` (a merged shard holds <= tps·num/den <=
    split_factor·tps tokens — at most the split threshold, never over
    it); a policy violating that inequality could oscillate
    split↔merge forever, so it refuses up front. Splits are bounded by
    total token mass. ``max_actions`` is the hard cap regardless.

    tokens_per_shard=None adopts the budget the export was fit with
    (its ``params`` table — the router's adopt-or-refuse discipline,
    read side).

    Returns ``(post-loop manifest read back from disk, actions log,
    termination reason)`` where each log row is ``{step, action,
    shard_id, next_shard_id, status, reason}`` — status 'ok' for an
    applied lever, 'skipped' for a refusal — and the termination reason
    is one of ``'converged'`` (the plan is all-ok), ``'stalled'``
    (recommendations remain but every one refused — e.g. pending
    ``incoming/`` increments: the layout is still unmaintained) or
    ``'budget_exhausted'`` (``max_actions`` spent with actionable
    recommendations left; a loop whose LAST allowed action reaches an
    all-ok plan re-plans once and reports 'converged'). Inferring
    convergence from the action count was wrong in both directions
    (ADVICE r14). 100 TB shape: each iteration's plan is
    manifest-cardinality arithmetic (milliseconds) and each applied
    lever rewrites ONLY the affected shard's rows — the loop's total
    I/O is proportional to the shards that actually need maintenance,
    never to the corpus."""
    from token_etl_spark.operators.curation import plan_shard_maintenance

    if merge_budget_num > split_factor * merge_budget_den:
        raise ValueError(
            "apply_shard_maintenance: merge budget "
            f"{merge_budget_num}/{merge_budget_den} exceeds split_factor "
            f"{split_factor} — a merged shard could immediately qualify "
            "for split and the loop would oscillate; choose "
            "merge_budget_num/merge_budget_den <= split_factor"
        )
    base = path.rstrip("/")
    _heal_shard_layout(spark, path)
    if tokens_per_shard is None:
        tokens_per_shard = int(
            spark.read.parquet(f"{base}/params")
            .collect()[0]["tokens_per_shard"]
        )
    actions: list[dict] = []
    refused: set[tuple] = set()
    for step in range(int(max_actions)):
        manifest = spark.read.parquet(f"{base}/manifest")
        plan = plan_shard_maintenance(
            manifest,
            tokens_per_shard,
            split_factor=split_factor,
            merge_budget_num=merge_budget_num,
            merge_budget_den=merge_budget_den,
        ).collect()
        splits = sorted(
            (r for r in plan if r["action"] == "split"),
            key=lambda r: (-r["shard_tokens"], r["shard_id"]),
        )
        merge_rows = [r for r in plan if r["action"] == "merge_with_next"]
        if not splits and not merge_rows:
            return spark.read.parquet(f"{base}/manifest"), actions, "converged"
        # merge ties break toward the smaller first_key (the
        # merge_min_pair / ext_shard_merge rule). The plan frame does
        # not carry first_key, but its next_shard_id column IS the
        # range order — rebuild positions by walking the chain from the
        # head (the one shard that is nobody's successor), so the
        # tie-break never depends on collect() row order.
        succ = {r["shard_id"]: r["next_shard_id"] for r in plan}
        heads = set(succ) - {s for s in succ.values() if s is not None}
        pos: dict[int, int] = {}
        if len(heads) == 1:
            cur, i = heads.pop(), 0
            while cur is not None and cur not in pos:
                pos[cur] = i
                cur, i = succ.get(cur), i + 1
        if merge_rows and any(r["shard_id"] not in pos for r in merge_rows):
            # a merge candidate the rebuilt chain cannot place means the
            # manifest's range chain is malformed (no unique head, a
            # cycle, or a disconnected segment) — refusing loudly beats
            # a tie-break that silently degrades to collect() row order
            # (ADVICE r14)
            raise ValueError(
                "apply_shard_maintenance: manifest range chain is "
                f"malformed ({len(heads)} head(s)); cannot order merge "
                "ties deterministically — repair the manifest (audit) "
                "before applying maintenance"
            )
        merges = sorted(
            merge_rows,
            key=lambda r: (r["pair_tokens"], pos.get(r["shard_id"], 0)),
        )
        applied = False
        for r in splits:
            key = ("split", r["shard_id"])
            if key in refused:
                continue
            try:
                split_shard(spark, path, int(r["shard_id"]))
                actions.append({
                    "step": step, "action": "split",
                    "shard_id": int(r["shard_id"]), "next_shard_id": None,
                    "status": "ok", "reason": None,
                })
                applied = True
                break
            except ValueError as e:
                refused.add(key)
                actions.append({
                    "step": step, "action": "split",
                    "shard_id": int(r["shard_id"]), "next_shard_id": None,
                    "status": "skipped", "reason": str(e),
                })
        if not applied:
            for r in merges:
                key = ("merge", r["shard_id"], r["next_shard_id"])
                if key in refused:
                    continue
                try:
                    merge_shards(
                        spark, path, int(r["shard_id"]), int(r["next_shard_id"])
                    )
                    actions.append({
                        "step": step, "action": "merge",
                        "shard_id": int(r["shard_id"]),
                        "next_shard_id": int(r["next_shard_id"]),
                        "status": "ok", "reason": None,
                    })
                    applied = True
                    break
                except ValueError as e:
                    refused.add(key)
                    actions.append({
                        "step": step, "action": "merge",
                        "shard_id": int(r["shard_id"]),
                        "next_shard_id": int(r["next_shard_id"]),
                        "status": "skipped", "reason": str(e),
                    })
        if not applied:
            # candidates existed this step (the all-ok case returned
            # above) but every one refused — the layout is still
            # unmaintained and more budget would not help
            return spark.read.parquet(f"{base}/manifest"), actions, "stalled"
    # budget spent: one more manifest-arithmetic plan decides whether the
    # last action happened to finish the job
    manifest = spark.read.parquet(f"{base}/manifest")
    final_plan = plan_shard_maintenance(
        manifest,
        tokens_per_shard,
        split_factor=split_factor,
        merge_budget_num=merge_budget_num,
        merge_budget_den=merge_budget_den,
    ).collect()
    done = all(r["action"] == "ok" for r in final_plan)
    return manifest, actions, "converged" if done else "budget_exhausted"
