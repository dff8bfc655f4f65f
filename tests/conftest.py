from __future__ import annotations

import pytest

from seo_crawler_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[8]/shuffle=4: engine waves are dozens of tiny jobs — more
    # concurrent tasks and fewer shuffle partitions both cut the
    # per-job constant that dominates the suite's wall time
    s = get_spark("tests", master="local[8]", shuffle_partitions=4)
    yield s
    s.stop()
