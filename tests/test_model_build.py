"""Spark model build must match the pure-Python stats builder bit-for-bit."""

import pandas as pd
import pytest

from dbpedia_spotlight_spark.plans.model_build import model_from_fixture_dir


@pytest.fixture(scope="module")
def model(spark, fixture_dir):
    return model_from_fixture_dir(spark, fixture_dir)


def _cmp(spark_df, pandas_df, sort_cols):
    got = (
        spark_df.toPandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    want = pandas_df.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, rtol=1e-12
    )


def test_surface_form_stats(model, stats):
    _cmp(model.surface_form_stats, stats.surface_form_stats, ["sf_id"])


def test_resources(model, stats):
    _cmp(
        model.resources.drop("types"),
        stats.resources.drop(columns=["types"]),
        ["res_id"],
    )
    got = {
        r["uri"]: list(r["types"]) for r in model.resources.collect()
    }
    want = {
        r.uri: list(r.types) for r in stats.resources.itertuples(index=False)
    }
    assert got == want
    assert any(got.values()), "expected some typed resources"
    assert any(not v for v in got.values()), "expected some untyped"


def test_candidate_map(model, stats):
    _cmp(model.candidate_map, stats.candidate_map, ["sf_id", "res_id"])


def test_tokens(model, stats):
    _cmp(model.tokens, stats.tokens, ["token_id"])


def test_context_counts(model, stats):
    _cmp(model.context_counts, stats.context_counts, ["res_id", "token_id"])


def test_totals(model, stats):
    assert model.total_annotated_count == stats.total_annotated_count
    assert model.total_token_count == stats.total_token_count
    assert model.vocab_size == stats.vocab_size
