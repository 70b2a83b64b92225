from __future__ import annotations

import os

import pytest

# smaller local parallelism for test startup speed; production entry
# points size from SPARK_GRAFT_CPUS themselves
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from queryengine_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("queryengine-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
