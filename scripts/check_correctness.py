"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values. The value compare is pandas-frame
based and **dtype-sensitive**, mirroring the driver's hasher: both sides
are materialized as pandas frames (Spark ``toPandas()``, DuckDB
``.df()``), columns sorted by name, floats rounded to 6 decimals
(FIXTURES.md canonicalization), rows sorted, then dtype *kinds* and
values compared. This reproduces the r3 ``ext_token_budget`` red (DuckDB
HUGEINT → float64 vs Spark int64) that the old Python-level canon could
not see — local green now implies driver green for dtype asymmetries
too. On mismatch, a Python-level value diff is printed for detail.

Queries without an oracle get a rows-only smoke check.

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


def canon_frame(pdf):
    """Driver-style canonicalization of a pandas frame: columns sorted by
    name, floats rounded to 6dp (−0.0 normalized), rows sorted by all
    columns. Widths are normalized *within* a dtype kind (int32→int64,
    float32→float64, datetime units→us, object NaN→None) so the compare
    is exactly kind-sensitive — the driver's observed sensitivity level
    (r3: int64 vs float64 red; int32 vs int64 never red)."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        kind = pdf[c].dtype.kind
        if kind == "f":
            pdf[c] = pdf[c].astype("float64").round(6) + 0.0
        elif kind in ("i", "u"):
            pdf[c] = pdf[c].astype("int64")
        elif kind == "M":
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif kind == "b":
            pdf[c] = pdf[c].astype("bool")
        elif kind == "O":
            pdf[c] = pdf[c].where(pdf[c].notna(), None)
    if len(pdf):
        pdf = pdf.sort_values(
            list(pdf.columns), kind="mergesort", na_position="last",
            key=lambda s: s.astype(str) if s.dtype.kind == "O" else s,
        )
    return pdf.reset_index(drop=True)


def frames_match(spark_pdf, duck_pdf):
    """Dtype-sensitive equality of canonicalized frames. Returns a list
    of problem strings (empty → match)."""
    a, b = canon_frame(spark_pdf), canon_frame(duck_pdf)
    problems = []
    kinds_a = {c: a[c].dtype.kind for c in a.columns}
    kinds_b = {c: b[c].dtype.kind for c in b.columns}
    if kinds_a != kinds_b:
        diff = {c: (kinds_a.get(c), kinds_b.get(c))
                for c in set(kinds_a) | set(kinds_b)
                if kinds_a.get(c) != kinds_b.get(c)}
        problems.append(f"dtype kinds differ (spark, duck): {diff}")
    if not problems and not a.equals(b):
        problems.append("pandas frames differ")
    return problems


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
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if spec.oracle is None:
            print(f"ok*   {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue

        spark_cols = sorted(c.lower() for c in spark_pdf.columns)
        duck_cols = sorted(c.lower() for c in duck_pdf.columns)
        problems = []
        if len(spark_pdf) != len(duck_pdf):
            problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        if spark_cols != duck_cols:
            problems.append(f"columns spark={spark_cols} duck={duck_cols}")
        if not problems:
            problems = frames_match(spark_pdf, duck_pdf)
            if any("differ" in p for p in problems):
                # Python-level diff detail (dtype-insensitive) for debugging
                sp, dp = spark_pdf.copy(), duck_pdf.copy()
                sp.columns = [c.lower() for c in sp.columns]
                dp.columns = [c.lower() for c in dp.columns]
                dp = dp[list(sp.columns)]
                cs = canon_rows([tuple(r) for r in sp.itertuples(index=False)], spark_cols)
                cd = canon_rows([tuple(r) for r in dp.itertuples(index=False)], spark_cols)
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"first python-level diffs: {diff}" if diff else "values equal python-level (dtype-only mismatch)")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows match")

    print(f"\n{len(failures)} failures / {len(SPECS)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
