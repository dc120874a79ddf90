"""Wikipedia corpus ingestion.

Two reference paths re-expressed Spark-first:

  * tiny.corpus.tsv (live/src/main/resources/tiny.corpus.tsv): one page
    per line, ``category \\t uri \\t text``; the text interleaves prose
    with ``File:<name>.<ext>`` media references. Parsed into the
    engine's mandated interleaved span schema (kind/text/media_ref/
    offset) — media refs become opaque media spans, everything else
    text spans, offsets into the original line text.
  * Wiki page markup -> occurrences (index/.../io/WikiOccurrenceSource
    .scala:84-128 + string/WikiMarkupStripper.scala): strip everything
    but links (JVM regex cascade in functions/markup.py), split into
    paragraphs (:35 splitDocumentRegex), then per paragraph extract
    ``[[Target|anchor]]`` links with clean-text offset re-arithmetic
    (same kernel as the MilneWitten corpus parser — the formats share
    the wiki-link syntax). Redirect and disambiguation pages are
    excluded (:106).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.markup import (
    clean_uri_expr,
    split_paragraphs_expr,
    strip_wiki_markup_expr,
)
from .eval_corpora import parse_milne_witten

# filenames may contain spaces ("File:Chi-rho mensa Louvre Ma 3023.jpg")
# but never '|' (caption separator) or newlines
_MEDIA_RE = re.compile(
    r"File:[^|\n]+?\.(?:jpe?g|png|gif|svg|ogg|ogv|webm|tiff?|pdf|mid)",
    re.IGNORECASE,
)

SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def read_tiny_corpus(spark: SparkSession, path: str) -> DataFrame:
    """-> (category, uri, text), one page per line."""
    return (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .schema("category string, uri string, text string")
        .csv(path)
    )


def spans_from_text_py(text: str) -> list[dict]:
    """Interleave (text | media) spans; offsets index the original text."""
    spans = []
    last = 0
    for m in _MEDIA_RE.finditer(text):
        if m.start() > last:
            seg = text[last:m.start()]
            if seg.strip():
                spans.append(
                    {"kind": "text", "text": seg, "media_ref": "",
                     "offset": last}
                )
        spans.append(
            {"kind": "image", "text": "", "media_ref": m.group(),
             "offset": m.start()}
        )
        last = m.end()
    if last < len(text) and text[last:].strip():
        spans.append(
            {"kind": "text", "text": text[last:], "media_ref": "",
             "offset": last}
        )
    return spans


def tiny_corpus_documents(pages: DataFrame) -> DataFrame:
    """(category, uri, text) -> documents(doc_id, spans) in the mandated
    interleaved schema (doc_id = page uri)."""

    def to_spans(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["uri"],
                    "spans": [
                        spans_from_text_py(t if t is not None else "")
                        for t in pdf["text"]
                    ],
                }
            )

    return pages.mapInPandas(to_spans, schema=SPANS_SCHEMA)


_REDIRECT_RE = r"(?is)^\s*#redirect"
_DISAMBIG_RE = r"(?is)\{\{\s*(disambig|dab\b|hndis)"


def wiki_page_occurrences(
    pages: DataFrame,
    uri_col: str = "uri",
    markup_col: str = "markup",
) -> tuple[DataFrame, DataFrame]:
    """pages(uri, markup) -> (documents(doc_id, text),
                              occurrences(occ_id, doc_id, uri, sf, offset)).

    doc_id = ``<page>-p<i>`` (WikiOccurrenceSource.scala:106 idBase).
    Markup stripping and paragraph splitting stay JVM-side; only the
    per-paragraph link/offset extraction runs in an Arrow kernel."""
    paras = (
        pages.filter(~F.col(markup_col).rlike(_REDIRECT_RE))
        .filter(~F.col(markup_col).rlike(_DISAMBIG_RE))
        .select(
            clean_uri_expr(F.col(uri_col)).alias("page"),
            F.posexplode(
                split_paragraphs_expr(
                    strip_wiki_markup_expr(F.col(markup_col))
                )
            ).alias("pidx", "paragraph"),
        )
        .select(
            F.concat(F.col("page"), F.lit("-p"),
                     (F.col("pidx") + 1).cast("string")).alias("doc_id"),
            "paragraph",
        )
    )

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["paragraph"]):
                occs, clean = parse_milne_witten(p)
                rows.append(
                    (
                        doc_id,
                        clean,
                        [
                            (f"{doc_id}-{off}", doc_id,
                             uri.replace(" ", "_"), sf, off)
                            for uri, sf, off, _conf in occs
                        ],
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "text", "occs"])

    parsed = paras.mapInPandas(
        extract,
        schema=(
            "doc_id string, text string, occs array<struct<"
            "occ_id:string,doc_id:string,uri:string,sf:string,offset:int>>"
        ),
    ).cache()
    documents = parsed.select("doc_id", "text")
    occurrences = parsed.select(F.explode("occs").alias("o")).select("o.*")
    return documents, occurrences
