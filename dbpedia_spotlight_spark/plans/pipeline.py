"""End-to-end pipeline orchestration.

One lazily-composed DataFrame DAG (SURVEY.md §3.1 recast):

    documents --(AC pandas UDF)--> mentions
              --(dim joins)------> mention_candidates
              --(token joins+agg)-> ctx_scores
              --(window)---------> linked mentions
              --(blocking+pairs+CC)--> clusters

Each named stage can checkpoint through sources/checkpoint.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_PARAMS, PipelineParams
from ..operators import disambiguate as D
from ..operators.candidates import generate_candidates, with_mention_key
from ..operators.scoring import context_scores
from ..operators.spotting import (
    broadcast_automaton,
    build_automaton,
    doc_token_arrays,
    spot_documents,
)
from .model_build import ModelTables


@dataclass
class AnnotateResult:
    mentions: DataFrame
    candidates: DataFrame
    scored: DataFrame
    resolved: DataFrame   # every mention, NULL uri = NIL


def annotate(
    documents: DataFrame,
    model: ModelTables,
    stopwords: list[str],
    params: PipelineParams = DEFAULT_PARAMS,
    automaton_bc=None,
) -> AnnotateResult:
    spark = documents.sparkSession
    if automaton_bc is None:
        automaton = build_automaton(
            model.surface_form_stats, case_sensitive=params.case_sensitive
        )
        automaton_bc = broadcast_automaton(spark, automaton)

    mentions = with_mention_key(
        spot_documents(documents, automaton_bc, params)
    )
    cands = generate_candidates(mentions, model, params)
    doc_tokens = doc_token_arrays(documents, stopwords)
    ctx, nil = context_scores(cands, doc_tokens, model, params)
    scored = D.disambiguate(cands, ctx, nil, model, params)
    resolved = D.resolve_all_mentions(mentions, scored)
    return AnnotateResult(
        mentions=mentions, candidates=cands, scored=scored, resolved=resolved
    )


def clusters_by_uri(resolved: DataFrame) -> DataFrame:
    """Trivial clustering: cluster id = resolved URI; NIL mentions are
    singletons (cluster id = their own mention key). The reference
    equivalence: clusters ≡ groups of mentions linked to one DBpedia URI."""
    return resolved.select(
        "mention_key",
        "doc_id",
        "begin",
        "sf",
        "uri",
        F.when(
            F.col("uri").isNotNull(), F.concat(F.lit("uri:"), F.col("uri"))
        )
        .otherwise(F.concat(F.lit("nil:"), F.col("mention_key")))
        .alias("cluster_id"),
    )
