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

    s = get_spark(master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s


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
