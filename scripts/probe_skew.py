"""Reproducible skew probe (PERF.md "Skew probe" section, ROADMAP 4).

Generates a deliberately skewed aggregation input (n_rows, hot_share of
them on ONE key) and times plain ``groupBy.agg`` vs ``salted_aggregate``.
On local[32] map-side partial aggregation already soaks most of the skew;
on a real cluster the hot key pins a single reducer and the gap widens
with the hot key's share.

Usage: python scripts/probe_skew.py [n_rows] [hot_share] [n_salts]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from token_etl_spark.operators.skew import salted_aggregate
from token_etl_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    n_salts = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark("probe-skew")
    df = (
        spark.range(n_rows)
        .withColumn(
            "key",
            F.when(F.rand(seed=7) < hot_share, F.lit(0)).otherwise(
                (F.col("id") % 1000) + 1
            ),
        )
        .withColumn("value", (F.col("id") % 97).cast("double"))
        .localCheckpoint(eager=True)
    )

    def force(frame) -> None:
        frame.write.format("noop").mode("overwrite").save()

    # warmup both plan shapes
    force(df.limit(1000).groupBy("key").agg(F.sum("value").alias("total")))
    force(
        salted_aggregate(
            df.limit(1000), ["key"], {"total": ("sum", "value")}, n_salts=n_salts
        )
    )

    t0 = time.time()
    force(df.groupBy("key").agg(F.sum("value").alias("total")))
    plain = time.time() - t0

    t0 = time.time()
    force(salted_aggregate(df, ["key"], {"total": ("sum", "value")}, n_salts=n_salts))
    salted = time.time() - t0

    print(
        f"agg : rows={n_rows} hot_share={hot_share} salts={n_salts}: "
        f"plain={plain:.2f}s salted={salted:.2f}s ({plain / salted:.2f}x)"
    )

    # Join skew: hot fact key against a non-broadcastable dim. Broadcast
    # (and AQE skew splitting of broadcastable sides) is disabled to
    # simulate the large-dim regime where salting is the only lever.
    from token_etl_spark.operators.skew import salted_join

    dim = (
        spark.range(1001)
        .select(F.col("id").alias("key"), (F.col("id") * 2.0).alias("weight"))
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        force(df.limit(1000).join(dim, "key"))  # warmup shape
        t0 = time.time()
        force(df.join(dim, "key"))
        plain_j = time.time() - t0

        force(salted_join(df.limit(1000), dim, "key", n_salts=n_salts))
        t0 = time.time()
        force(salted_join(df, dim, "key", n_salts=n_salts))
        salted_j = time.time() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    print(
        f"join: rows={n_rows} hot_share={hot_share} salts={n_salts}: "
        f"plain={plain_j:.2f}s salted={salted_j:.2f}s ({plain_j / salted_j:.2f}x)"
    )


if __name__ == "__main__":
    main()
