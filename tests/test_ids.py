"""dense_ids must equal the global-window row_number while avoiding the
single-partition exchange."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.ids import dense_ids


def _keys(n, seed):
    rng = random.Random(seed)
    ks = {f"k{rng.randrange(10**9):09d}" for _ in range(n)}
    return sorted(ks)


def test_dense_ids_equal_global_rank(spark):
    keys = _keys(5000, 11)
    df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(16)
    got = {
        r["key"]: r["kid"] for r in dense_ids(df, "key", "kid").collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_dense_ids_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(k,) for k in _keys(500, 3)], "key string"
    )
    out = dense_ids(df, "key", "kid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_dense_ids_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "key string")
    assert dense_ids(empty, "key", "kid").count() == 0
    one = spark.createDataFrame([("z",)], "key string")
    assert dense_ids(one, "key", "kid").collect()[0]["kid"] == 0
