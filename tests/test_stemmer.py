"""Porter2 (Snowball English) stemmer: algorithm vectors + Spark wiring.

Vector table: dbpedia_spotlight_spark/fixtures/porter2_vectors.py — 339
hand-derived pairs from the published Snowball English algorithm (and the
reference's SnowballStemmerTest.scala), shared with the porter2_vectors
driver gate so the DuckDB oracle discriminates over the same table.
"""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.fixtures.porter2_vectors import VECTORS
from dbpedia_spotlight_spark.functions.stem import (
    porter2_stem,
    porter2_udf,
    stem_map,
    stem_tokens,
)


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_porter2_vectors(word, expected):
    assert porter2_stem(word) == expected


def test_porter2_consecutive_y_marking():
    """Snowball marks y->Y left to right against the REWRITTEN string: in
    a vowel-y-y run the first y becomes consonant Y, so the second y stays
    a vowel. 'sayydize' discriminates: correct marking 'saYydize' puts R2
    at 5 so step 4 strips 'ize' -> 'sayyd'; marking both y's consonant
    leaves R2 at 7 and the word unstemmed."""
    assert porter2_stem("sayydize") == "sayyd"
    assert porter2_stem("sayyid") == "sayyid"
    # vowel-y at word end after consonant-Y still step-1c's to i
    assert porter2_stem("sayy") == "sayi"


def test_porter2_uppercase_and_edge_inputs():
    assert porter2_stem("BUYING") == "buy"  # reference lowercases first
    assert porter2_stem("") == ""
    assert porter2_stem("x") == "x"
    assert porter2_stem("'cause") == porter2_stem("cause")


def test_stem_udf_matches_pure_python(spark):
    words = sorted(VECTORS)
    df = spark.createDataFrame([(w,) for w in words], "token string")
    got = {
        r["token"]: r["stem"]
        for r in df.select(
            "token", porter2_udf(F.col("token")).alias("stem")
        ).collect()
    }
    assert got == {w: porter2_stem(w) for w in words}


def test_stem_tokens_distinct_map_path(spark):
    """stem_tokens (distinct-vocab + join scale path) == direct stemming."""
    rows = [(i, w) for i, w in enumerate(list(VECTORS) * 3)]
    df = spark.createDataFrame(rows, "row_id int, token string")
    got = {
        (r["row_id"], r["token"])
        for r in stem_tokens(df, "token").collect()
    }
    want = {
        (i, porter2_stem(w)) for i, w in rows
    }
    assert got == want


def test_stem_map_covers_distinct_only(spark):
    df = spark.createDataFrame(
        [("running",), ("running",), ("flies",)], "token string"
    )
    m = stem_map(df, "token").collect()
    assert len(m) == 2
    assert {r["token"]: r["stem"] for r in m} == {
        "running": "run", "flies": "fli"
    }
