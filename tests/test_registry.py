"""Registry sanity: every oracle parses and type-checks in DuckDB against
the real table schemas — catches SQL typos or dialect slips in seconds,
without a Spark run.
"""

from __future__ import annotations

import duckdb
import pytest

from token_etl_spark.plans.registry import ORACLES, QUERIES, SPECS
from token_etl_spark.schemas import TESTDATA_TABLES


def test_names_and_oracle_keys_consistent():
    assert len(SPECS) == len(QUERIES)
    assert set(ORACLES) <= set(QUERIES)
    assert all(name.isidentifier() for name in SPECS)


def test_every_oracle_compiles_in_duckdb():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{name}.parquet')"
        )
    failures = []
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)[:160]))
    assert not failures, failures


def test_bench_set_is_subset_of_queries():
    from token_etl_spark.plans.registry import BENCH_SET

    assert set(BENCH_SET) <= set(QUERIES)
    assert len(BENCH_SET) >= 10


def test_window_queries_emit_only_hashable_scalars(spark):
    """The driver's value hasher canonicalizes through a pandas hash
    table, which rejects list/map/struct cells (r2: evt_daily_event_types
    and rel_array_ops went red with "unhashable type: 'list'"). Every
    query inside the 50-entry correctness window must therefore emit only
    scalar columns; complex-typed forms belong in pytest-only siblings.
    Schema-only check (no execution), so it covers all 50 fast."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in list(SPECS)[:50]:
        df = SPECS[name].fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_oracle_dtype_parity_with_spark_schema(spark):
    """The driver's value hasher is dtype-sensitive at the pandas level:
    DuckDB silently widens integer window/group sums (sum(BIGINT) →
    HUGEINT → pandas float64) while Spark emits int64, redding a row even
    when every value matches (r3 ext_token_budget). Guard: materialize
    every oracle via .df() at sf0.001 and assert each column's pandas
    dtype *kind* matches the kind implied by the Spark plan's schema
    (analysis-only — no Spark job). A float kind is accepted for an
    integral Spark column only when the duck column actually contains
    nulls (then Spark's toPandas widens identically)."""
    import duckdb
    from pyspark.sql import types as T

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{name}.parquet')"
        )

    def expected_kinds(dt, has_nulls):
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return {"i", "u", "f"} if has_nulls else {"i", "u"}
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return {"f"}
        if isinstance(dt, T.BooleanType):
            return {"b", "O"} if has_nulls else {"b"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return {"M", "O"}
        if isinstance(dt, T.StringType):
            return {"O"}
        return {"O"}

    offenders = []
    for name, spec in SPECS.items():
        if spec.oracle is None:
            continue
        sdf = spec.fn(spark, "/root/testdata/sf0.001")
        spark_types = {f.name.lower(): f.dataType for f in sdf.schema.fields}
        pdf = con.execute(spec.oracle).df()
        pdf.columns = [c.lower() for c in pdf.columns]
        for col in pdf.columns:
            st = spark_types.get(col)
            if st is None:
                offenders.append((name, col, "missing-on-spark-side"))
                continue
            kind = pdf[col].dtype.kind
            if kind not in expected_kinds(st, bool(pdf[col].isna().any())):
                offenders.append(
                    (name, col, f"spark={st.simpleString()} duck_kind={kind}")
                )
    assert not offenders, offenders


def test_all_queries_have_oracles():
    """108/108 since round 3 — a regression here silently downgrades a
    query to the driver's weaker rows-only check."""
    assert set(ORACLES) == set(QUERIES)


def test_ivf_serving_oracles_unchanged_by_refactor():
    """The r10 dedup of the two IVF serving oracles into one
    parameterized builder (_ann_ivf_serving_sql) regenerates BOTH SQL
    strings byte-identically (md5 of the pre-refactor builders' output,
    captured before the change): the in-window ext_ann_ivf_kmeans /
    ext_ann_ivf_search rows carry provably the same oracle text.

    The r11 corpus_sql parameter on _kmeans_cte_members (added for the
    retrain oracle) must likewise leave every PRE-EXISTING consumer's
    SQL untouched — SQL_IVF_CELL_BALANCE joins the pin (md5 captured
    from the pre-parameter builder at commit a0ba275)."""
    import hashlib

    from token_etl_spark.plans.extensions import (
        SQL_ANN_IVF_KMEANS,
        SQL_ANN_IVF_SEARCH,
        SQL_IVF_CELL_BALANCE,
    )

    assert (
        hashlib.md5(SQL_ANN_IVF_KMEANS.encode()).hexdigest()
        == "833d76c4b5d7bf3ee9eefd300bdd1510"
    )
    assert (
        hashlib.md5(SQL_ANN_IVF_SEARCH.encode()).hexdigest()
        == "2be5459194d19c77fb8ff232f4b5872e"
    )
    assert (
        hashlib.md5(SQL_IVF_CELL_BALANCE.encode()).hexdigest()
        == "19505eaf88d298ef45e9ac416c645184"
    )
