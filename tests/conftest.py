import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bigarrays_jl_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("bigarrays-tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
