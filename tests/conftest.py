import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.plans.session import build_session

    s = build_session(app_name="ocr_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
