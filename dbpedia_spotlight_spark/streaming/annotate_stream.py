"""Streaming annotation.

The reference is batch-only (SURVEY.md §2.12 — no watermarks, windows,
or stateful operators exist in it); this module is the Spark-native
extension for continuously-arriving documents: a Structured Streaming
source over the documents table feeding the SAME batch pipeline through
foreachBatch (the standard reuse pattern — per micro-batch, the full
annotate DAG runs with the broadcast automaton and dimension tables).

`trigger=availableNow` drains the backlog and stops — the shape used by
incremental 10^12-doc ingestion jobs (each run processes new files only,
checkpointed in the stream's offset log, which composes with the
engine's own stage checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import DEFAULT_PARAMS, PipelineParams
from ..plans.model_build import ModelTables
from ..plans.pipeline import annotate


def annotate_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    model: ModelTables,
    stopwords: list[str],
    params: PipelineParams = DEFAULT_PARAMS,
    available_now: bool = True,
):
    """documents parquet dir (streaming source) -> resolved mentions sink.

    Returns the StreamingQuery; callers await .awaitTermination().
    """
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)

    # build the dictionary ONCE for the stream's lifetime, matching the
    # spotter annotate() will route to (a mismatched broadcast type is a
    # worker-side AttributeError)
    if params.spotter == "fsa":
        from ..operators.fsa_spotting import (
            broadcast_fsa_dictionary,
            build_fsa_dictionary,
        )

        automaton_bc = broadcast_fsa_dictionary(
            spark,
            build_fsa_dictionary(model.surface_form_stats,
                                 case_sensitive=params.case_sensitive,
                                 on_boundary="ac"),
        )
    else:
        from ..operators.spotting import (
            broadcast_automaton,
            build_automaton,
        )

        automaton_bc = broadcast_automaton(
            spark,
            build_automaton(model.surface_form_stats,
                            case_sensitive=params.case_sensitive),
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = annotate(
            batch_df, model, stopwords, params, automaton_bc=automaton_bc
        )
        result.resolved.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
