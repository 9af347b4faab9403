import pytest


@pytest.fixture(scope="session")
def spark():
    from weak_supervision_for_ner_spark.config import get_spark

    spark = get_spark("wsner-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
