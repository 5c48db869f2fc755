from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiment_flink_cdc_connectors_postgres_datastream_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=8)
    yield s
    s.stop()
