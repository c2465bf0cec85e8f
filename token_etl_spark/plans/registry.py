"""Declared query set: name → QuerySpec (Spark plan + DuckDB oracle).

This is the single source of truth consumed by ``__spark_entry__.py``
(the driver contract), ``bench.py``, and the local correctness runner
(``scripts/check_correctness.py``).
"""

from __future__ import annotations

from token_etl_spark.plans import domain, extensions, relational, tpch, tpch2, tpch3
from token_etl_spark.plans.base import QuerySpec

_ALL: list[QuerySpec] = [
    *tpch.SPECS,
    *tpch2.SPECS,
    *tpch3.SPECS,
    *relational.SPECS,
    *domain.SPECS,
    *extensions.SPECS,
]

_names = [s.name for s in _ALL]
assert len(_names) == len(set(_names)), f"duplicate query names: {_names}"

SPECS: dict[str, QuerySpec] = {s.name: s for s in _ALL}

QUERIES = {name: spec.fn for name, spec in SPECS.items()}
ORACLES = {name: spec.oracle for name, spec in SPECS.items() if spec.oracle is not None}
BENCH_SET = [name for name, spec in SPECS.items() if spec.bench]
