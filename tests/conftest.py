import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from mc2skos_spark.plans.session import build_session
    session = build_session(app_name="mc2skos-tests", master="local[4]",
                            shuffle_partitions=8)
    yield session
    session.stop()
