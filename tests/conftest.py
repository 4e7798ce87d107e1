from __future__ import annotations

import pytest

from symat_hbase_tools_spark.session import get_spark
from symat_hbase_tools_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("symat-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def customer(spark):
    return load_table(spark, SF_DIR, "customer").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="session")
def events(spark):
    return load_table(spark, SF_DIR, "events").cache()
