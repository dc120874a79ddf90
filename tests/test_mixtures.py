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


def test_linreg_formula(docs, model, fx):
    rows = _scored(docs, model, fx, "linreg").collect()
    assert rows
    # spot check: raw = 6617.888*prior + 0.7886*ctx_norm + 0.2214 with
    # ctx_norm in (0, 1]; so raw >= 0.2214 always
    assert all(r["raw_score"] >= 0.2214 for r in rows)


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
