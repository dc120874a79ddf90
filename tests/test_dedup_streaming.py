"""Streaming exact dedup: first arrival kept, duplicates dropped within
the watermark, checkpoint resume does not re-emit."""

from datetime import datetime

from dbpedia_spotlight_spark.streaming.dedup_stream import (
    start_dedup_stream,
)


def _rows(spark, rows):
    return spark.createDataFrame(
        [(d, datetime(2024, 1, 1, 10, m), t) for d, m, t in rows],
        "doc_id string, ts timestamp, text string",
    )


def test_dedup_stream_drops_duplicates_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "deduped")
    ck = str(tmp_path / "ck")

    _rows(spark, [
        ("d1", 0, "alpha text"),
        ("d2", 1, "alpha text"),     # duplicate content
        ("d3", 2, "beta text"),
    ]).write.mode("append").parquet(in_dir)

    q = start_dedup_stream(spark, in_dir, out_dir, ck)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    texts = sorted(r["text"] for r in first.collect())
    assert texts == ["alpha text", "beta text"]

    # second batch: one more duplicate (within watermark) + one new doc;
    # resume from checkpoint must not re-emit batch-1 rows
    _rows(spark, [
        ("d4", 3, "alpha text"),     # still a duplicate
        ("d5", 4, "gamma text"),
    ]).write.mode("append").parquet(in_dir)
    q2 = start_dedup_stream(spark, in_dir, out_dir, ck)
    q2.awaitTermination(120)
    final = spark.read.parquet(out_dir)
    texts = sorted(r["text"] for r in final.collect())
    assert texts == ["alpha text", "beta text", "gamma text"]
    # exactly ONE alpha row, and it is from batch 1 (the second batch's
    # duplicate d4 was dropped against the state store); WITHIN a batch
    # the retained representative is arbitrary (d1 or d2) — that is the
    # operator's documented contract
    alpha = [r for r in final.collect() if r["text"] == "alpha text"]
    assert len(alpha) == 1 and alpha[0]["doc_id"] in ("d1", "d2")


def test_dedup_stream_batch_twin(spark, tmp_path):
    """Stream output covers exactly the batch exact_dedup GROUPS (one
    representative per content hash; the within-batch representative
    choice is arbitrary, so groups — not ids — are the contract)."""
    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.operators.dedup import exact_dedup

    in_dir = str(tmp_path / "docs2")
    rows = [("a", 0, "t1"), ("b", 1, "t1"), ("c", 2, "t2"),
            ("d", 3, "t3"), ("e", 4, "t2")]
    _rows(spark, rows).write.mode("append").parquet(in_dir)
    q = start_dedup_stream(spark, in_dir, str(tmp_path / "out2"),
                           str(tmp_path / "ck2"))
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out2"))
    stream_hashes = [r["content_hash"] for r in out.collect()]
    assert len(stream_hashes) == len(set(stream_hashes))  # one per group
    batch = exact_dedup(spark.read.parquet(in_dir))
    batch_groups = {
        r["content_hash"]
        for r in batch.filter(~F.col("is_duplicate")).collect()
    }
    assert set(stream_hashes) == batch_groups
