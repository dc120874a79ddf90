"""Full resolve() pipeline: clusters vs oracle (incl. coref), checkpoints,
kill/resume semantics, scaling counters in the manifest."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.fixtures import oracle as O
from dbpedia_spotlight_spark.plans.model_build import model_from_fixture_dir
from dbpedia_spotlight_spark.plans.pipeline import resolve
from dbpedia_spotlight_spark.sources.checkpoint import CheckpointStore


@pytest.fixture(scope="module")
def model(spark, fixture_dir):
    return model_from_fixture_dir(spark, fixture_dir)


@pytest.fixture(scope="module")
def oracle_clusters(fx, stats):
    mentions = O.spot_documents(
        fx.documents, list(stats.surface_form_stats.sf)
    )
    om = O.OracleModel(stats, set(fx.stopwords.word))
    links = O.link_mentions(mentions, fx.documents, om)
    links = O.coreference_links(mentions, links)
    return O.cluster_mentions(links)


def _cluster_map(clusters_df):
    return {
        r["mention_key"]: r["cluster_id"] for r in clusters_df.collect()
    }


def test_resolve_clusters_match_oracle(spark, fixture_dir, model, fx,
                                       oracle_clusters):
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    result = resolve(docs, model, stopwords=list(fx.stopwords.word))
    got = _cluster_map(result.clusters)
    # same partition of mentions into clusters (ids differ: CC uses min
    # mention key, oracle uses the URI)
    assert set(got) == set(oracle_clusters)
    by_got: dict[str, set] = {}
    by_want: dict[str, set] = {}
    for k, c in got.items():
        by_got.setdefault(c, set()).add(k)
    for k, c in oracle_clusters.items():
        by_want.setdefault(c, set()).add(k)
    assert sorted(map(sorted, by_got.values())) == sorted(
        map(sorted, by_want.values())
    )
    assert O.pairwise_f1(got, fx.eval_pairs) >= 0.99
    assert result.counters["blocking"]["n_blocks"] > 0


def test_resume_skips_completed_stages(spark, fixture_dir, model, fx,
                                       tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    store = CheckpointStore(spark, ckpt)
    r1 = resolve(docs, model, stopwords=list(fx.stopwords.word), store=store)
    full = _cluster_map(r1.clusters)

    manifest = store.manifest()
    stages = set(manifest["stages"])
    assert {"mentions", "scored", "resolved", "edges", "clusters"} <= stages
    assert any(s.startswith("cc_step_") for s in stages)
    # per-partition lineage counters present
    assert all("partitions" in v for v in manifest["stages"].values())

    # simulate a kill after 'resolved': drop later stages from the manifest
    manifest["stages"] = {
        k: v
        for k, v in manifest["stages"].items()
        if k in ("mentions", "scored", "resolved")
    }
    store._commit_manifest(manifest)

    # resume with a poisoned annotate: if the engine recomputes the early
    # stages the poison pill raises
    import dbpedia_spotlight_spark.plans.pipeline as P

    orig = P.annotate

    def poisoned(*a, **kw):
        raise AssertionError("resume recomputed a completed stage")

    P.annotate = poisoned
    try:
        store2 = CheckpointStore(spark, ckpt)
        r2 = resolve(
            docs, model, stopwords=list(fx.stopwords.word), store=store2
        )
        assert _cluster_map(r2.clusters) == full
    finally:
        P.annotate = orig


def test_cc_superstep_resume(spark, fixture_dir, model, fx,
                             tmp_path_factory):
    """Killing inside the CC loop resumes from the last superstep."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_cc"))
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    store = CheckpointStore(spark, ckpt)
    r1 = resolve(docs, model, stopwords=list(fx.stopwords.word), store=store)
    full = _cluster_map(r1.clusters)

    manifest = store.manifest()
    cc_steps = sorted(
        s for s in manifest["stages"] if s.startswith("cc_step_")
    )
    assert cc_steps, "expected checkpointed CC supersteps"
    # keep only the first superstep + upstream stages; drop the rest
    keep = {"mentions", "scored", "resolved", "edges", cc_steps[0]}
    manifest["stages"] = {
        k: v for k, v in manifest["stages"].items() if k in keep
    }
    store._commit_manifest(manifest)

    r2 = resolve(
        docs, model, stopwords=list(fx.stopwords.word),
        store=CheckpointStore(spark, ckpt),
    )
    assert _cluster_map(r2.clusters) == full
