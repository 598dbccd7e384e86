from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from astarte_data_updater_plant_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    """Scale factor for the parity suite. Defaults to sf0.001 for
    speed; set SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 to run
    the exact gate the driver runs (documented in README)."""
    return os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", SF_SMOKE)
