import os
import shutil

import pytest

from dbpedia_spotlight_spark.fixtures.generator import (
    FixtureConfig,
    generate,
    write_parquet,
)
from dbpedia_spotlight_spark.fixtures.stats import build_stats

FIXTURE_DIR = "/tmp/spotlight_fixtures/n200"


@pytest.fixture(scope="session")
def spark():
    from dbpedia_spotlight_spark.session import get_spark

    s = get_spark(
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "12g",
            # caches/localCheckpoints accumulate across the session-scoped
            # SparkSession; periodic GC lets the ContextCleaner drop them
            "spark.cleaner.periodicGC.interval": "1min",
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse-test",
        },
    )
    yield s


@pytest.fixture(autouse=True, scope="module")
def _clear_spark_cache():
    """Drop cached DataFrames between test modules — annotate()/resolve()
    cache intermediates per call, and a dozen pipeline runs in one JVM
    otherwise fill the old gen and stall the suite in full GCs."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()


@pytest.fixture(scope="session")
def fx():
    return generate(FixtureConfig(n_docs=200))


@pytest.fixture(scope="session")
def stats(fx):
    return build_stats(fx)


@pytest.fixture(scope="session")
def fixture_dir(fx):
    if not os.path.exists(f"{FIXTURE_DIR}/documents.parquet"):
        shutil.rmtree(FIXTURE_DIR, ignore_errors=True)
        write_parquet(fx, FIXTURE_DIR)
    return FIXTURE_DIR
