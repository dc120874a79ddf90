"""Incremental streaming entity resolution (streaming/er_stream.py).

The operator's contract is CHUNKING INVARIANCE: maintaining the cluster
state over any split of the edge stream must yield exactly batch CC over
the union of all edges (min-member cluster ids). These tests check the
pure merge step against batch CC under random chunkings, the URI-star
form against the batch ER pipeline's min-hub clusters, and the
Structured-Streaming wiring end to end including checkpoint resume and
per-batch idempotence.
"""

import random

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.cc import connected_components
from dbpedia_spotlight_spark.sources.checkpoint import CheckpointStore
from dbpedia_spotlight_spark.streaming.er_stream import (
    current_clusters,
    incremental_cc_update,
    run_er_stream,
    update_er_state,
    uri_star_edges,
)


def _assignments(df):
    return {r[0]: r[1] for r in df.collect()}


def test_incremental_cc_matches_batch_any_chunking(spark):
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(40)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    batch = connected_components(
        spark.createDataFrame(edges, "src string, dst string")
    )
    expected = _assignments(batch)
    for n_chunks, seed in [(1, 0), (3, 1), (5, 2), (7, 3)]:
        rng2 = random.Random(seed)
        chunks = [[] for _ in range(n_chunks)]
        for e in edges:
            chunks[rng2.randrange(n_chunks)].append(e)
        state = None
        for chunk in chunks:
            if not chunk:
                continue
            state = incremental_cc_update(
                state,
                spark.createDataFrame(chunk, "src string, dst string"),
            ).localCheckpoint()
        got = {
            r["node"]: r["root"] for r in state.collect()
        }
        # batch CC omits isolated/self-loop-only nodes; so does the
        # incremental state — the dicts must be identical
        assert got == expected, f"chunking {n_chunks}/{seed} diverged"


def test_uri_star_incremental_matches_batch_er(spark):
    rows = [
        (f"{d}:{b}", f"uri{u}")
        for d, b, u in [
            (1, 0, 1), (1, 5, 2), (2, 0, 1), (3, 0, 3),
            (4, 2, 2), (5, 0, 1), (6, 1, 4), (7, 0, 4), (8, 3, 5),
        ]
    ]
    linked = spark.createDataFrame(rows, "mention_key string, uri string")
    # batch contract: clusters are uri groups, id = min mention_key
    expected = {}
    mins = {}
    for mk, uri in rows:
        mins[uri] = min(mins.get(uri, mk), mk)
    for mk, uri in rows:
        expected[mk] = mins[uri]

    state = None
    for k in range(3):
        chunk = linked.filter(
            F.pmod(F.crc32(F.col("mention_key")), F.lit(3)) == k
        )
        state = incremental_cc_update(
            state, uri_star_edges(chunk)
        ).localCheckpoint()
    got = _assignments(current_clusters(state))
    assert got == expected
    # synthetic URI anchors never leak and never win the min
    assert all(not v.startswith("~uri:") for v in got.values())


def test_empty_batch_is_a_noop(spark):
    linked = spark.createDataFrame(
        [("1:0", "uriA"), ("2:0", "uriA")],
        "mention_key string, uri string",
    )
    state = incremental_cc_update(None, uri_star_edges(linked))
    before = sorted(map(tuple, state.collect()))
    empty = spark.createDataFrame([], "mention_key string, uri string")
    after = incremental_cc_update(state, uri_star_edges(empty))
    assert sorted(map(tuple, after.collect())) == before


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id string, text string"
    ).coalesce(1).write.mode("append").parquet(path)


def _link_fn(dict_df):
    def link(batch):
        toks = batch.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "sf"),
        )
        return toks.join(F.broadcast(dict_df), "sf").select(
            F.concat_ws(":", "doc_id", "pos").alias("mention_key"), "uri"
        )
    return link


def test_run_er_stream_end_to_end_resume_and_idempotence(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    store = CheckpointStore(spark, str(tmp_path / "state"))
    dict_df = spark.createDataFrame(
        [("berlin", "uriB"), ("paris", "uriP"), ("tokyo", "uriT")],
        "sf string, uri string",
    )
    _write_docs(spark, in_dir, [("1", "visit berlin now"),
                                ("2", "paris and berlin")])
    _write_docs(spark, in_dir, [("3", "tokyo berlin"),
                                ("4", "only paris")])

    q = run_er_stream(spark, in_dir, store, ck, _link_fn(dict_df),
                      max_files_per_trigger=1)
    q.awaitTermination(180)
    stages = [s for s in store.manifest()["stages"]
              if s.startswith("er_state_v")]
    assert len(stages) >= 2  # one file per trigger -> >=2 micro-batches
    v = max(int(s.rsplit("v", 1)[1]) for s in stages)
    state = store.read(f"er_state_v{v}")
    got = _assignments(current_clusters(state))
    # uriB mentions: 1:1, 2:2, 3:1 -> min 1:1; uriP: 2:0, 4:1 -> 2:0;
    # uriT: 3:0 -> singleton
    assert got == {
        "1:1": "1:1", "2:2": "1:1", "3:1": "1:1",
        "2:0": "2:0", "4:1": "2:0",
        "3:0": "3:0",
    }
    # counters + lineage present on every committed stage
    man = store.manifest()["stages"]
    for s in stages:
        assert "n_edges" in man[s]["counters"]
    assert man[f"er_state_v{v}"]["lineage"], "later stages carry lineage"

    # idempotence: re-applying the last batch id returns the committed
    # stage untouched (foreachBatch retry semantics)
    before = sorted(map(tuple, state.collect()))
    again = update_er_state(
        store, v,
        spark.createDataFrame([("9:9", "uriB")],
                              "mention_key string, uri string"),
    )
    assert sorted(map(tuple, again.collect())) == before

    # resume: new file arrives, SAME checkpoint + store -> state advances
    # without reprocessing old batches ('berlin' doc merges into uriB)
    _write_docs(spark, in_dir, [("0", "berlin again")])
    q2 = run_er_stream(spark, in_dir, store, ck, _link_fn(dict_df),
                       max_files_per_trigger=1)
    q2.awaitTermination(180)
    v2 = max(int(s.rsplit("v", 1)[1])
             for s in store.manifest()["stages"]
             if s.startswith("er_state_v"))
    assert v2 > v
    got2 = _assignments(current_clusters(store.read(f"er_state_v{v2}")))
    # doc 0's mention 0:0 is the new global min of the uriB cluster
    assert got2["0:0"] == "0:0"
    assert got2["1:1"] == "0:0" and got2["3:1"] == "0:0"
    assert got2["2:0"] == "2:0"  # uriP cluster untouched
