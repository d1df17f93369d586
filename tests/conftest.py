from __future__ import annotations

import pytest

from kg_curation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kgcs-tests", parallelism=8, shuffle_partitions=32)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
