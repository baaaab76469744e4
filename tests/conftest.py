import pytest


@pytest.fixture(scope="session")
def spark():
    from smoldocling_ocr_spark.session import get_spark

    spark = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield spark
    spark.stop()
