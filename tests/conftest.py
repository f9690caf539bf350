from __future__ import annotations

import pytest

from distributedmapreduce_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, driver_memory="8g")
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"
