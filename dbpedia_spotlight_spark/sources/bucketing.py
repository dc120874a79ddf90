"""Bucketed tables for co-located (shuffle-free) joins.

At 10^12 documents, the repeated equi-joins on `mention_key` /
`block_key` / `res_id` each shuffle the fact side. Writing the
intermediate tables bucketed by the join key (Spark `bucketBy` +
`sortBy`) makes every subsequent equi-join on that key exchange-free:
both sides arrive pre-partitioned and pre-sorted, so Catalyst plans a
sort-merge join with no Exchange under it.

The reference's analog is its presorted-by-URI index build
(bin/index.sh:31-33 — sorting occurrence files so the indexer can merge
sequentially, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed managed table (saveAsTable — bucketing
    metadata lives in the catalog, which plain parquet paths lack)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
    )
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the
    assertion primitive for co-location tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
