from __future__ import annotations

import pytest

from meta_morph_etl_databricks_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from meta_morph_etl_databricks_spark.plans.operator_queries import (
        prune_bucketed_scratch,
    )

    prune_bucketed_scratch()  # scratch housekeeping lives in harnesses, not queries
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
