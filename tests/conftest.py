import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from martial_arts_ocr_spark.engine.session import build_session

    s = build_session(master="local[2]", shuffle_partitions=4,
                      app_name="pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
