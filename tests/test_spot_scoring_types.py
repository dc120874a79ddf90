"""DBSpotter spot scoring, context narrowing, type filter e2e, language
normalization, Wortschatz reader, annotated output."""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.normalize import (
    language_normalize_py,
)
from dbpedia_spotlight_spark.operators.spot_scoring import (
    doc_tokens_with_offsets,
    narrow_context,
    spot_score_filter,
)
from dbpedia_spotlight_spark.operators.filters import type_filter
from dbpedia_spotlight_spark.sources.corpora import (
    read_wortschatz_words,
    to_annotated_output,
)


def test_spot_score_filter_no_weights(spark):
    """No-weights path: annotationProbability with the 0.25 floor
    (DBSpotter.scala:147-157)."""
    m = spark.createDataFrame(
        [("m1", "Berlin", 30, 100), ("m2", "table", 10, 100),
         ("m3", "Rare", 5, -1)],
        "mention_key string, sf string, annotated_count long,"
        " total_count long",
    ).withColumn(
        "total_count",
        F.when(F.col("total_count") < 0, F.lit(0)).otherwise(
            F.col("total_count")
        ),
    )
    out = spot_score_filter(m, confidence=0.0, weights=None)
    got = {r["mention_key"]: r["spot_score"] for r in out.collect()}
    assert got == {"m1": pytest.approx(0.3), "m3": 1.0}  # m2 below floor


def test_spot_score_filter_weighted_features(spark):
    """Feature vector semantics (DBSpotter.scala:225-237): abbreviation
    and number indicators."""
    m = spark.createDataFrame(
        [("a", "NASA", 1, 2), ("n", "1984", 1, 2), ("w", "Berlin", 1, 2)],
        "mention_key string, sf string, annotated_count long,"
        " total_count long",
    )
    out = spot_score_filter(
        m, confidence=-10.0, weights=(0.0, 1.0, 10.0, 0.0)
    )
    got = {r["mention_key"]: r["spot_score"] for r in out.collect()}
    assert got["a"] == 1.0    # abbreviation (upper, len<5, not numeric)
    assert got["n"] == 10.0   # number
    assert got["w"] == 0.0


def test_narrow_context(spark):
    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {"kind": "text",
                     "text": "aa bb cc dd ee ff gg hh",
                     "media_ref": "", "offset": 0}
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    toks = doc_tokens_with_offsets(docs)
    row = toks.collect()[0]
    assert [t["token"] for t in row["tokens"]][:3] == ["aa", "bb", "cc"]
    assert [t["begin"] for t in row["tokens"]][:3] == [0, 3, 6]

    mentions = spark.createDataFrame(
        [("d1:9", "d1", 9)], "mention_key string, doc_id string, begin int"
    )
    out = narrow_context(toks, mentions, max_context_words=4).collect()[0]
    # mention at token index 3 ('dd'); window of 4 starting 2 back
    assert out["context_tokens"] == ["bb", "cc", "dd", "ee"]


def test_type_filter_e2e(spark, fixture_dir, fx):
    from dbpedia_spotlight_spark.config import PipelineParams
    from dbpedia_spotlight_spark.plans.model_build import (
        model_from_fixture_dir,
    )
    from dbpedia_spotlight_spark.plans.pipeline import annotate

    model = model_from_fixture_dir(spark, fixture_dir)
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet").limit(60)
    res = annotate(docs, model, stopwords=list(fx.stopwords.word))
    all_rows = res.scored.filter("rank = 1")
    typed = type_filter(
        all_rows, whitelist=("DBpedia:Person",), keep_untyped=False
    )
    n_all, n_typed = all_rows.count(), typed.count()
    assert 0 < n_typed < n_all
    for r in typed.collect()[:10]:
        assert "DBpedia:Person" in list(r["types"])
    # untyped policy: keep_untyped=True admits empty-type resources
    typed_or_unknown = type_filter(
        all_rows, whitelist=("DBpedia:Person",), keep_untyped=True
    )
    assert typed_or_unknown.count() >= n_typed


def test_language_normalize():
    assert language_normalize_py("Berlin's wall") == "Berlin s wall"
    assert language_normalize_py("l’homme", "fr") == "l' homme"
    assert language_normalize_py("nothing here") == "nothing here"


def test_wortschatz_reader(spark, tmp_path):
    f = tmp_path / "words.tsv"
    f.write_text("1\tthe\t5000\n2\tof\t4000\n3\tzorvel\t3\n")
    words = read_wortschatz_words(spark, str(f), min_count=100)
    assert {r["word"] for r in words.collect()} == {"the", "of"}


def test_annotated_output(spark):
    resolved = spark.createDataFrame(
        [
            ("d1:5", "d1", 5, "Berlin", "Berlin", 0.9, -1.0),
            ("d1:0", "d1", 0, "Paris", "Paris", 0.8, 0.5),
            ("d2:0", "d2", 0, "x", None, None, None),
        ],
        "mention_key string, doc_id string, begin int, sf string,"
        " uri string, final_score double, pct_second_rank double",
    )
    out = {r["doc_id"]: r["Resources"] for r in
           to_annotated_output(resolved).collect()}
    assert [x["URI"] for x in out["d1"]] == ["Paris", "Berlin"]  # offset order
    assert "d2" not in out  # NIL-only docs drop out
