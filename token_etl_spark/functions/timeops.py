"""Time bucketing + changelog collapse (SURVEY §2.8 Math, §2.4 A11).

Canonical time semantics (shared with every DuckDB oracle):
- all timestamps are UTC; domain time is unix **seconds** (LongType);
- bucketing is truncating integer division on positive unix seconds
  (``(ts / 3600).cast(long)`` in the reference, BaseEnricher.scala:89,206,
  241 — truncation == floor for positive inputs, which is all of them);
- a "changelog" is a ``Map<bucket_start_seconds → value>`` column built by
  ``map_from_entries(sort_array(collect_list(struct(ts, value))))``
  (reference pattern ×7, BaseEnricher.scala:162-177 etc. — the reference
  omits the sort; we pin entry order so duplicate-timestamp collisions
  resolve deterministically by last-sorted-entry, and so output hashes are
  stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOUR = 3600
DAY = 86400


def unix_seconds(ts: Column | str) -> Column:
    """TimestampType (or stringified-seconds) → unix seconds as long.

    ``unix_timestamp`` truncates sub-second parts toward zero — identical
    to ``floor(epoch(ts))`` in the DuckDB oracle for positive times.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_timestamp(c).cast("long")


def bucket(ts_seconds: Column | str, width: int) -> Column:
    """Truncating bucket: ``(ts div width) * width`` (bucket start)."""
    c = F.col(ts_seconds) if isinstance(ts_seconds, str) else ts_seconds
    return ((c.cast("long") / width).cast("long") * width).cast("long")


def hour_bucket(ts_seconds: Column | str) -> Column:
    return bucket(ts_seconds, HOUR)


def day_bucket(ts_seconds: Column | str) -> Column:
    return bucket(ts_seconds, DAY)


def changelog_entries(ts: Column | str, value: Column | str) -> Column:
    """Sorted array<struct<ts,value>> — deterministic pre-image of A11."""
    t = F.col(ts) if isinstance(ts, str) else ts
    v = F.col(value) if isinstance(value, str) else value
    return F.sort_array(F.collect_list(F.struct(t.alias("ts"), v.alias("value"))))


def collapse_to_map(
    df: DataFrame,
    ts: str,
    value: str,
    out: str,
    group_by: list[str] | None = None,
) -> DataFrame:
    """A11 collapse-to-map: per-group (or global) ``Map<ts → value>``.

    Reference pattern (BaseEnricher.scala:162-177 and six siblings):
    ``select(collect_list(struct(ts, value)))`` → ``map_from_entries``;
    per-address variant WalletEnricher.scala:42-58. The global form
    produces ONE row holding the whole changelog — fine for a per-token
    summary document, and at scale the per-key grouped form keeps the map
    bounded by the group's bucket count, not the table size.
    """
    entries = F.map_from_entries(changelog_entries(ts, value)).alias(out)
    if group_by:
        return df.groupBy(*group_by).agg(entries)
    return df.select(entries)
