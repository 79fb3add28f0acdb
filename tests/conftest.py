import pytest

from kgcompass_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgcompass-tests", shuffle_partitions=8)
    yield s
