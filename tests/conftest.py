import pytest

from onnxocr_ray_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="onnxocr_ray_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
