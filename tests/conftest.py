from __future__ import annotations

import pytest

from distributedmapreduce_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # ansi=True: correctness runs should fail loudly on int64
    # wraparound instead of silently corrupting (ADVICE r04)
    s = get_spark(app_name="tests", cpus=8, driver_memory="8g", ansi=True)
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"
