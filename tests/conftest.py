from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from boxoffice_spark.session import get_spark

    spark = get_spark("boxoffice_spark_tests")
    yield spark
    from boxoffice_spark.functions.caching import release_all

    release_all()  # drop scoped operator caches before the JVM goes away
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from boxoffice_spark.testing import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()
