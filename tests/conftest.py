import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scylla_cdc_rust_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cdc-tests",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
