import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import pytest


@pytest.fixture(scope="session")
def spark():
    from stumpy_spark.session import get_spark
    s = get_spark(app_name="stumpy-spark-tests", cpus=4,
                  shuffle_partitions=8)
    yield s
    s.stop()
