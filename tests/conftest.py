from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamandbatchprocessing_spark.session import build_spark

SF_DIR = os.environ.get("SBP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = build_spark(
        app_name="sbp-tests",
        master="local[4]",
        shuffle_partitions=8,
        enable_fair_scheduler=False,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
