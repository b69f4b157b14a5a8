"""Shared fixtures: one session-scoped SparkSession (startup ~15 s)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def queries():
    """Driver-contract queries plus the pytest-pinned production twins
    (the twins are excluded from the driver's oracle gate but tests still
    address them by name through this one map)."""
    import __spark_entry__ as m

    return {**m.queries(), **m.production_queries()}


@pytest.fixture(scope="session")
def spark():
    from aind_hcr_data_transformation_spark.session import get_spark

    spark = get_spark("tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
