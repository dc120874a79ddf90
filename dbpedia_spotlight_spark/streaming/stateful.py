"""Custom stateful streaming operator: running per-entity mention counts.

The reference is batch-only; this is the engine's Structured-Streaming
extension for incremental corpora: as annotated mention batches stream
in, a grouped applyInPandasWithState keeps a running (count, last_seen)
per resolved URI across micro-batches — the building block for
streaming cluster-size monitoring and hot-key (skew) detection feeding
the salting thresholds.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "uri string, total_mentions long, batches long"
STATE_SCHEMA = "count long, batches long"


def _update_counts(key, pdfs, state: GroupState):
    new = 0
    for pdf in pdfs:
        new += len(pdf)
    if state.exists:
        count, batches = state.get
    else:
        count, batches = 0, 0
    count += new
    batches += 1
    state.update((count, batches))
    yield pd.DataFrame(
        {"uri": [key[0]], "total_mentions": [count], "batches": [batches]}
    )


def running_entity_counts(
    mention_stream: DataFrame,
) -> DataFrame:
    """streaming mentions(uri, ...) -> running totals per uri (update mode)."""
    return (
        mention_stream.groupBy("uri")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_entity_count_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Parquet mention stream -> running-count updates appended to
    parquet via foreachBatch (the memory sink cannot recover from a
    checkpoint; foreachBatch can — availableNow drains the backlog and
    stops, state persists in the checkpoint's state store across runs)."""
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    counts = running_entity_counts(stream.select("uri"))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_dir)

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
