from __future__ import annotations

import pytest

from etl_framework_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="etl_framework_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running soak tests")
    config.addinivalue_line(
        "markers",
        "jdbc: full-path integration against a real JDBC driver jar "
        "(skips when none is present)",
    )
    config.addinivalue_line(
        "markers", "performance: reference throughput-floor parity tests"
    )
    config.addinivalue_line(
        "markers",
        "iceberg: conformance run of the IcebergTable adapter against a "
        "real iceberg-spark-runtime jar (skips when none is present)",
    )
