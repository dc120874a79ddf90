"""Bucketed co-located joins: no shuffle Exchange on the join key."""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.sources.bucketing import (
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf, set in conftest's session builder
    mentions = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id")).alias("mention_key"),
        (F.col("id") % 37).alias("block"),
    )
    cands = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id")).alias("mention_key"),
        (F.col("id") % 11).alias("res_id"),
    )
    write_bucketed(mentions, "b_mentions", ["mention_key"], 8)
    write_bucketed(cands, "b_cands", ["mention_key"], 8)
    yield "b_mentions", "b_cands"
    spark.sql("DROP TABLE IF EXISTS b_mentions")
    spark.sql("DROP TABLE IF EXISTS b_cands")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    a, b = read_bucketed(spark, t1), read_bucketed(spark, t2)
    joined = a.join(b, "mention_key")
    assert joined.count() == 2000
    assert not plan_has_exchange(joined), (
        "bucketed equi-join should not shuffle"
    )


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join over plain DataFrames (broadcast disabled)
    needs an Exchange — proves the bucketing is what removes it."""
    a = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id")).alias("mention_key")
    )
    b = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id")).alias("mention_key"),
        (F.col("id") % 11).alias("res_id"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "mention_key")
        joined.count()
        assert plan_has_exchange(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
