import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from elastic_freight_spark.session import get_spark

    s = get_spark(app_name="efs_tests", extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from elastic_freight_spark.session import load_tables

    return load_tables(spark, SF_DIR)
