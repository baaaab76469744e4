import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


@pytest.fixture(scope="module")
def cc_docs(spark):
    from smoldocling_ocr_spark.sources.documents import read_cc_documents

    return read_cc_documents(spark, "/root/testdata/sf0.001").cache()


@pytest.fixture(scope="session")
def spark():
    from smoldocling_ocr_spark.session import get_spark

    spark = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield spark
    spark.stop()
