import pytest

from language_identification_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8, arrow_batch_rows=256)
    yield s
    s.stop()
