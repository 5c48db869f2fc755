from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# fresh warehouse per test session (static conf — must be set before
# the SparkSession exists; avoids LOCATION_ALREADY_EXISTS on reruns)
os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", tempfile.mkdtemp(prefix="spark_wh_"))

from experiment_flink_cdc_connectors_postgres_datastream_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=8)
    yield s
    s.stop()
