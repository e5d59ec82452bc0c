import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from vector_db_from_scratch_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s
    from vector_db_from_scratch_spark.operators import _memo

    _memo.clear()
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
