import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "oracle_full: full 207-query DuckDB oracle sweep at sf0.01 "
        "(~4 min); deselected unless -m oracle_full is passed",
    )


def pytest_collection_modifyitems(config, items):
    if config.option.markexpr:
        return  # the caller chose markers explicitly (e.g. -m oracle_full)
    skip = pytest.mark.skip(
        reason="full sf0.01 oracle sweep; opt in with -m oracle_full"
    )
    for item in items:
        if "oracle_full" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from plda_spark.session import get_spark

    spark = get_spark("plda-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
