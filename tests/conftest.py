import pytest

from proteofav_spark.session import get_spark

REFDATA = "/root/reference/tests/testdata"
TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("proteofav_spark_tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def refdata():
    return REFDATA


@pytest.fixture(scope="session")
def testdata():
    return TESTDATA
