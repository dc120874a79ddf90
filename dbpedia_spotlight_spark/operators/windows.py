"""Context-window slicing for long documents.

Mirrors db/DBTwoStepDisambiguator.scala:46,49-93: documents longer than
MAX_CONTEXT (200) tokens are disambiguated per sliding window; windows
accumulate sentence units until the token count reaches MAX_CONTEXT,
then flush. Spans are the engine's sentence analog (the reference
tokenizes sentences; our documents arrive pre-segmented into spans).

Fast path: documents at or under the cap take window 0 with pure column
math — no Python. Only over-cap documents run the (inherently
sequential) greedy accumulation, per-doc in applyInPandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_expr, tokenize_py

_SPAN_WINDOW_SCHEMA = "doc_id string, span_idx int, window_id int"


def assign_windows_py(span_token_counts: list[int], max_context: int) -> list[int]:
    """Greedy accumulate-and-flush (DBTwoStepDisambiguator.scala:69-88):
    window advances after the span that pushes the running count to
    >= max_context."""
    out = []
    window = 0
    running = 0
    for n in span_token_counts:
        out.append(window)
        running += n
        if running >= max_context:
            window += 1
            running = 0
    return out


def span_windows(
    documents: DataFrame, stopwords: list[str], max_context: int
) -> DataFrame:
    """-> (doc_id, span_idx, window_id) for every TEXT span."""
    toks_per_span = documents.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "s"),
    ).filter(F.col("s.kind") == "text").select(
        "doc_id",
        "span_idx",
        F.size(_span_tokens(F.col("s.text"), stopwords)).alias("n_tok"),
    )
    doc_totals = toks_per_span.groupBy("doc_id").agg(
        F.sum("n_tok").alias("total")
    )
    with_total = toks_per_span.join(doc_totals, "doc_id")

    short = with_total.filter(F.col("total") < max_context).select(
        "doc_id", "span_idx", F.lit(0).alias("window_id")
    )

    def slice_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("span_idx").reset_index(drop=True)
        wins = assign_windows_py(list(pdf["n_tok"]), max_context)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "window_id": wins,
            }
        )

    long = (
        with_total.filter(F.col("total") >= max_context)
        .select("doc_id", "span_idx", "n_tok")
        .groupBy("doc_id")
        .applyInPandas(lambda _k, pdf: slice_doc(pdf), _SPAN_WINDOW_SCHEMA)
    )
    return short.unionByName(long)


def _span_tokens(text_col, stopwords: list[str]):
    toks = tokenize_expr(text_col)
    if stopwords:
        toks = F.filter(toks, lambda t: ~t.isin(*stopwords))
    return toks


def window_token_arrays(
    documents: DataFrame, stopwords: list[str], max_context: int,
    stemmer: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (window_tokens(doc_id, window_id, query_tokens),
                span_map(doc_id, span_idx, window_id)).

    query_tokens = distinct sorted context tokens of the window —
    the reference's per-window `tokensDistinct`
    (DBTwoStepDisambiguator.scala:126). With a stemmer, the flat token
    stream is Porter2-stemmed (stopword filter first, like the model
    build) before the distinct-set aggregation."""
    span_map = span_windows(documents, stopwords, max_context)
    span_toks = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "s")
    ).filter(F.col("s.kind") == "text").select(
        "doc_id",
        "span_idx",
        _span_tokens(F.col("s.text"), stopwords).alias("toks"),
    )
    flat = (
        span_toks.join(span_map, ["doc_id", "span_idx"])
        .select("doc_id", "window_id", F.explode("toks").alias("token"))
    )
    if stemmer == "english":
        from ..functions.stem import stem_tokens

        flat = stem_tokens(flat, "token")
    elif stemmer is not None:
        raise ValueError(f"unsupported stemmer: {stemmer!r}")
    win_tokens = flat.groupBy("doc_id", "window_id").agg(
        F.array_sort(F.collect_set("token")).alias("query_tokens")
    )
    return win_tokens, span_map
