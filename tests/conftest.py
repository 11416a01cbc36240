from __future__ import annotations

import pytest

from parquet_generator_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pgs-tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    yield s
    s.stop()
