from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from token_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("token_etl_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
