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


def pytest_addoption(parser):
    parser.addoption(
        "--soak",
        action="store",
        type=int,
        default=0,
        metavar="N",
        help="run participating hypothesis model properties with N examples "
        "instead of their per-test defaults (VERDICT r16 #7b); equivalent "
        "to SPARK_GRAFT_SOAK=N",
    )


def pytest_configure(config):
    n = config.getoption("--soak")
    if n:
        # @settings decorators evaluate at import time, which happens
        # during collection — after this hook — so the env var is the
        # carrier (see tests/soakopt.py)
        os.environ["SPARK_GRAFT_SOAK"] = str(n)


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=8)
    yield s
    s.stop()
