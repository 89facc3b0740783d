from __future__ import annotations

import pytest

from udacitycapstonedataengineer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
