from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# executor python workers must resolve repo + test modules (pickled lambdas)
import os

os.environ["PYTHONPATH"] = f"{REPO}:{REPO / 'tests'}:" + os.environ.get("PYTHONPATH", "")

from usajobs_etl_service_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001
