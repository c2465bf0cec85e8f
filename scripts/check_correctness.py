"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (floats rounded to 6 decimals,
matching FIXTURES.md canonicalization). Queries without an oracle get a
rows-only smoke check.

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from token_etl_spark.schemas import TESTDATA_TABLES
from token_etl_spark.session import get_spark


def canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, dict):
        return tuple(sorted((canon_value(k), canon_value(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if hasattr(v, "asDict"):
        return tuple(sorted((k, canon_value(x)) for k, x in v.asDict().items()))
    return v


def canon_rows(rows, columns):
    out = [tuple(canon_value(v) for v in row) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    from token_etl_spark.plans.registry import SPECS

    failures = []
    for name, spec in SPECS.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if spec.oracle is None:
            print(f"ok*   {name}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            res = con.execute(spec.oracle)
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue

        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns spark={spark_cols} duck={duck_cols}")
        if not problems:
            order = [duck_cols.index(c) for c in spark_cols]
            duck_reordered = [tuple(row[i] for i in order) for row in duck_rows]
            cs = canon_rows(spark_rows, spark_cols)
            cd = canon_rows(duck_reordered, spark_cols)
            if cs != cd:
                diff = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"ok    {name}: {len(spark_rows)} rows match")

    print(f"\n{len(failures)} failures / {len(SPECS)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
