import pytest


@pytest.fixture(scope="session")
def spark():
    from mongo_analyser_spark import get_spark

    s = get_spark("mongo_analyser_spark_tests", cpus=8)
    yield s
