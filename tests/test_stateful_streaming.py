"""applyInPandasWithState: running entity counts across micro-batches
and across restarts (state store in the checkpoint)."""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.streaming.stateful import (
    start_entity_count_stream,
)


def test_running_entity_counts_accumulate_across_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "mentions")
    out_dir = str(tmp_path / "counts")
    ck = str(tmp_path / "ck")

    spark.createDataFrame(
        [("U1",), ("U1",), ("U2",)], "uri string"
    ).write.mode("append").parquet(in_dir)

    q = start_entity_count_stream(spark, in_dir, out_dir, ck)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    got = {
        r["uri"]: (r["total_mentions"], r["batches"])
        for r in first.collect()
    }
    assert got["U1"][0] == 2 and got["U2"][0] == 1
    n_first = first.count()

    # new data arrives; a fresh run resumes state from the checkpoint
    spark.createDataFrame(
        [("U1",), ("U3",)], "uri string"
    ).write.mode("append").parquet(in_dir)
    q2 = start_entity_count_stream(spark, in_dir, out_dir, ck)
    q2.awaitTermination(120)
    updates = spark.read.parquet(out_dir)
    # update mode only emits touched groups; U1 accumulated across runs
    latest = {
        r["uri"]: r["total_mentions"]
        for r in updates.orderBy("batch_id").collect()
    }
    assert latest["U1"] == 3          # 2 from run 1 + 1 new (state kept)
    assert latest["U3"] == 1
    assert latest["U2"] == 1          # untouched in run 2, row from run 1
    assert updates.count() == n_first + 2
