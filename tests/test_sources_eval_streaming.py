"""Selectors, corpus sources round-trips, eval harness, streaming, CLI."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.selectors import (
    chained_selector,
    common_word_blacklist,
    short_sf_selector,
    whitelist_selector,
)
from dbpedia_spotlight_spark.plans import evaluation as E
from dbpedia_spotlight_spark.sources.corpora import (
    occurrences_to_paragraphs,
    read_nt_pairs,
    read_occurrence_tsv,
    read_sf_counts_tsv,
    write_occurrence_tsv,
)


def test_selectors(spark):
    mentions = spark.createDataFrame(
        [("m1", "Berlin"), ("m2", "the"), ("m3", "ab"), ("m4", "Paris")],
        "mention_key string, sf string",
    )
    common = spark.createDataFrame([("the",)], "word string")
    allow = spark.createDataFrame([("Berlin",), ("the",)], "sf string")
    out = chained_selector(
        mentions,
        lambda m: common_word_blacklist(m, common),
        lambda m: short_sf_selector(m, 3),
    )
    assert {r["sf"] for r in out.collect()} == {"Berlin", "Paris"}
    out2 = whitelist_selector(mentions, allow)
    assert {r["sf"] for r in out2.collect()} == {"Berlin", "the"}


def test_occurrence_tsv_roundtrip(spark, tmp_path):
    occs = spark.createDataFrame(
        [
            ("o1", "Berlin", "Berlin", "we saw Berlin today", 7),
            ("o2", "Paris", "Paris", "Paris is lovely", 0),
            ("o3", "Berlin", "berlin", "we saw Berlin today", 7),
        ],
        "occ_id string, uri string, sf string, text string, offset int",
    )
    path = str(tmp_path / "occs.tsv")
    write_occurrence_tsv(occs, path)
    back = read_occurrence_tsv(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, occs.collect()))
    paras = occurrences_to_paragraphs(back)
    assert paras.count() == 2
    row = paras.filter(F.col("text") == "we saw Berlin today").collect()[0]
    assert len(row["occurrences"]) == 2


def test_nt_reader(spark, tmp_path):
    nt = tmp_path / "redirects.nt"
    nt.write_text(
        "<http://dbpedia.org/resource/Old_Berlin> "
        "<http://dbpedia.org/ontology/wikiPageRedirects> "
        "<http://dbpedia.org/resource/Berlin> .\n"
        "# comment line\n"
    )
    rows = read_nt_pairs(spark, str(nt)).collect()
    assert [(r["src_uri"], r["dst_uri"]) for r in rows] == [
        ("Old_Berlin", "Berlin")
    ]


def test_sf_counts_reader(spark, tmp_path):
    f = tmp_path / "sfAndTotalCounts.tsv"
    f.write_text("Berlin\t10\t20\nberlin\t-1\t5\nParis\t3\t\n")
    sf, lower = read_sf_counts_tsv(spark, str(f))
    got = {r["sf"]: (r["annotated_count"], r["total_count"]) for r in sf.collect()}
    assert got["Berlin"] == (10, 20)
    assert got["Paris"][0] == 3
    low = {r["sf_lower"]: r["lowercase_count"] for r in lower.collect()}
    assert low == {"berlin": 5}


# ---------------------------------------------------------------------------


def test_spotting_pr_and_disambiguation_metrics(spark):
    pred = spark.createDataFrame(
        [("d1", 0, "A"), ("d1", 10, "B"), ("d2", 0, "C")],
        "doc_id string, begin int, sf string",
    )
    gold = spark.createDataFrame(
        [("d1", 0, "A"), ("d1", 10, "B"), ("d2", 5, "D")],
        "doc_id string, offset int, sf string",
    )
    pr = E.spotting_pr(pred, gold)
    assert pr["tp"] == 2 and pr["fp"] == 1 and pr["fn"] == 1

    scored = spark.createDataFrame(
        [
            ("d1:0", "U1", 1), ("d1:0", "U2", 2),
            ("d1:10", "U9", 1),
        ],
        "mention_key string, uri string, rank int",
    )
    gold_uris = spark.createDataFrame(
        [("d1", 0, "U2"), ("d1", 10, "U5")],
        "doc_id string, offset int, uri string",
    )
    m = E.disambiguation_metrics(scored, gold_uris)
    assert m["accuracy"] == 0.0  # U2 is rank 2, U5 not found
    assert m["mrr"] == pytest.approx(0.25)  # 1/2 for U2, 0 for U5
    assert m["not_found_rate"] == 0.5


def test_pairwise_prf(spark):
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2")],
        "mention_key string, cluster_id string",
    )
    pairs = spark.createDataFrame(
        [("a", "b", "k", True), ("a", "c", "k", True), ("b", "c", "k", False)],
        "mention_a string, mention_b string, block_key string,"
        " same_entity boolean",
    )
    m = E.pairwise_prf(clusters, pairs)
    assert m["tp"] == 1 and m["fn"] == 1 and m["fp"] == 0
    assert m["f1"] == pytest.approx(2 / 3)


# ---------------------------------------------------------------------------


def test_annotate_stream(spark, fixture_dir, fx, tmp_path):
    from dbpedia_spotlight_spark.plans.model_build import (
        model_from_fixture_dir,
    )
    from dbpedia_spotlight_spark.streaming.annotate_stream import (
        annotate_stream,
    )

    model = model_from_fixture_dir(spark, fixture_dir)
    in_dir = str(tmp_path / "in")
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet").limit(20)
    docs.write.parquet(in_dir)
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    q = annotate_stream(
        spark, in_dir, out_dir, ck_dir, model,
        stopwords=list(fx.stopwords.word),
    )
    q.awaitTermination(120)
    result = spark.read.parquet(out_dir)
    assert result.count() > 0
    assert "uri" in result.columns
    # restart with no new data: offset log prevents reprocessing
    n1 = result.count()
    q2 = annotate_stream(
        spark, in_dir, out_dir, ck_dir, model,
        stopwords=list(fx.stopwords.word),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1


# ---------------------------------------------------------------------------


def test_cli_end_to_end(fixture_dir, tmp_path):
    """model-build then resolve via the packaged CLI (subprocess, the real
    spark-submit surface minus the cluster)."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    model_dir = str(tmp_path / "model")
    r = subprocess.run(
        [sys.executable, "-m", "dbpedia_spotlight_spark.cli", "model-build",
         "--fixture-dir", fixture_dir, "--output", model_dir,
         "--master", "local[2]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["status"] == "ok"

    out = str(tmp_path / "clusters")
    r2 = subprocess.run(
        [sys.executable, "-m", "dbpedia_spotlight_spark.cli", "resolve",
         "--documents", f"{fixture_dir}/documents.parquet",
         "--model-dir", model_dir, "--output", out,
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--master", "local[2]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    info = json.loads(r2.stdout.strip().splitlines()[-1])
    assert info["status"] == "ok" and info["clusters"] > 0

    # annotate with the FSA spotter + XML output rendering
    out_xml = str(tmp_path / "annotated_xml")
    r3 = subprocess.run(
        [sys.executable, "-m", "dbpedia_spotlight_spark.cli", "annotate",
         "--documents", f"{fixture_dir}/documents.parquet",
         "--model-dir", model_dir, "--output", out_xml,
         "--spotter", "fsa", "--format", "xml",
         "--master", "local[2]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    import pyarrow.parquet as pq

    tbl = pq.read_table(out_xml)
    outs = tbl.column("output").to_pylist()
    assert outs and all(o.startswith("<?xml") for o in outs)
    assert any("<Resource " in o for o in outs)


def test_package_zip(tmp_path):
    from dbpedia_spotlight_spark.package import build

    zip_path = build(str(tmp_path / "dist"))
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    assert "dbpedia_spotlight_spark/cli.py" in names
    assert "dbpedia_spotlight_spark/operators/spotting.py" in names
    assert os.path.exists(str(tmp_path / "dist" / "cli.py"))
