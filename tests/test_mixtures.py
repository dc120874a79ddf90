"""Selectable score mixtures (disambiguate/mixtures/*.scala)."""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.config import PipelineParams
from dbpedia_spotlight_spark.plans.model_build import model_from_fixture_dir
from dbpedia_spotlight_spark.plans.pipeline import annotate


@pytest.fixture(scope="module")
def model(spark, fixture_dir):
    return model_from_fixture_dir(spark, fixture_dir)


@pytest.fixture(scope="module")
def docs(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/documents.parquet")


def _scored(docs, model, fx, mixture):
    res = annotate(
        docs, model, stopwords=list(fx.stopwords.word),
        params=PipelineParams(mixture=mixture),
    )
    return res.scored


def test_onlysim_ranks_by_context_alone(docs, model, fx):
    rows = _scored(docs, model, fx, "onlysim").collect()
    assert rows
    by_mention = {}
    for r in rows:
        by_mention.setdefault(r["mention_key"], []).append(r)
    for ms in by_mention.values():
        ranked = sorted(ms, key=lambda r: r["rank"])
        raws = [r["raw_score"] for r in ranked]
        assert raws == sorted(raws, reverse=True)
        # raw score IS the (unnormalized log) context score channel:
        # independent of prior ordering


def test_linreg_formula_exact(spark):
    """Active LinearRegressionMixture.scala:49-53 body, verified against
    hand-computed values: 1234.3989·P(e) + 0.9968·raw_ctx − 0.0275, with a
    constant NIL score from the reference's constructor defaults
    (prior 0.0, contextualScore −1)."""
    import types as _t

    from dbpedia_spotlight_spark.operators.disambiguate import disambiguate
    from dbpedia_spotlight_spark.operators.mixtures import LINREG_NIL_SCORE

    cands = spark.createDataFrame(
        [
            ("d1", "m1", 1, 0, 3, "foo", "Foo", 10, None, "foo", 0.9, 0.001),
            ("d1", "m1", 2, 0, 3, "foo", "Bar", 5, None, "foo", 0.1, 0.01),
        ],
        "doc_id string, mention_key string, res_id long, begin int, "
        "end int, sf string, uri string, support long, types string, "
        "cand_sf string, cand_prior double, res_prior double",
    )
    ctx = spark.createDataFrame(
        [("d1", 1, -0.5), ("d1", 2, -0.9)],
        "doc_id string, res_id long, ctx_score double",
    )
    nil = spark.createDataFrame(
        [("d1", -40.0)], "doc_id string, nil_ctx_score double"
    )
    model = _t.SimpleNamespace(total_annotated_count=1000)
    from dbpedia_spotlight_spark.config import PipelineParams as P

    rows = {
        r["uri"]: r
        for r in disambiguate(
            cands, ctx, nil, model, P(mixture="linreg")
        ).collect()
    }
    assert abs(LINREG_NIL_SCORE - (-1.0243)) < 1e-9
    exp_foo = 1234.3989 * 0.001 + 0.9968 * (-0.5) - 0.0275
    exp_bar = 1234.3989 * 0.01 + 0.9968 * (-0.9) - 0.0275
    assert abs(rows["Foo"]["raw_score"] - exp_foo) < 1e-9
    assert abs(rows["Bar"]["raw_score"] - exp_bar) < 1e-9
    assert all(abs(r["nil_score"] - LINREG_NIL_SCORE) < 1e-12
               for r in rows.values())
    assert rows["Bar"]["rank"] == 1 and rows["Foo"]["rank"] == 2


def test_linreg_pipeline_runs(docs, model, fx):
    scored = _scored(docs, model, fx, "linreg")
    from dbpedia_spotlight_spark.operators.mixtures import LINREG_NIL_SCORE

    rows = scored.collect()
    # survivors (if any) beat the constant NIL score; the gate itself may
    # legitimately drop everything when raw ln context scores are large
    # negative and priors small — that IS the reference behavior
    assert all(r["raw_score"] > LINREG_NIL_SCORE for r in rows)
    assert all(abs(r["nil_score"] - LINREG_NIL_SCORE) < 1e-12 for r in rows)


def test_default_mixture_unchanged(docs, model, fx):
    a = {
        (r["mention_key"], r["uri"], r["rank"])
        for r in _scored(docs, model, fx, "unweighted").collect()
    }
    res_default = annotate(docs, model, stopwords=list(fx.stopwords.word))
    b = {
        (r["mention_key"], r["uri"], r["rank"])
        for r in res_default.scored.collect()
    }
    assert a == b


def test_unknown_mixture_rejected(docs, model, fx):
    with pytest.raises(Exception):
        _scored(docs, model, fx, "nonsense").collect()


def test_combined_options_smoke(spark, fixture_dir, fx):
    """All selectable options at once: FSA spotter + Porter2 stemming +
    linear-regression mixture, through the full resolve() path."""
    from dbpedia_spotlight_spark.plans.pipeline import resolve

    model = model_from_fixture_dir(spark, fixture_dir, stemmer="english")
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    res = resolve(
        docs,
        model,
        stopwords=list(fx.stopwords.word),
        params=PipelineParams(
            spotter="fsa", stemmer="english", mixture="linreg"
        ),
    )
    clusters = res.clusters.collect()
    assert clusters
    # every mention gets exactly one cluster id
    assert len({c["mention_key"] for c in clusters}) == len(clusters)
