"""Distributed redirect closure must equal the driver chase exactly —
long chains, trees into chains, cycles, trees into cycles, self-loops."""

import random

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.redirects import (
    close_redirects,
    close_redirects_distributed,
    resolve_redirects_df,
)


def _random_functional_graph(n_nodes: int, seed: int) -> dict[str, str]:
    """Functional graph with chains, shared suffixes, cycles, self-loops."""
    rng = random.Random(seed)
    nodes = [f"n{i:06d}" for i in range(n_nodes)]
    pairs: dict[str, str] = {}
    # ~60% of nodes redirect somewhere (the rest are terminals)
    for node in nodes:
        r = rng.random()
        if r < 0.55:
            pairs[node] = nodes[rng.randrange(n_nodes)]
        elif r < 0.60:
            pairs[node] = node  # self-loop cycle
    # a few long deterministic chains (depth >> log2 n per-step sanity)
    for c in range(3):
        chain = [f"c{c}_{i:04d}" for i in range(500)]
        for a, b in zip(chain, chain[1:]):
            pairs[a] = b
    # one explicit multi-node cycle with a tree hanging into it
    pairs["cycA"] = "cycB"
    pairs["cycB"] = "cycC"
    pairs["cycC"] = "cycA"
    pairs["treeX"] = "cycB"
    pairs["treeY"] = "treeX"
    return pairs


def _to_df(spark, pairs):
    return spark.createDataFrame(
        sorted(pairs.items()), "src_uri string, dst_uri string"
    )


def test_distributed_equals_driver_chase(spark):
    pairs = _random_functional_graph(2000, seed=9)
    got = {
        r["src_uri"]: r["final_uri"]
        for r in close_redirects_distributed(_to_df(spark, pairs)).collect()
    }
    want = close_redirects(pairs)
    assert got == want


def test_distributed_pure_chains(spark):
    pairs = {f"src{i}": f"src{i-1}" for i in range(1, 40)}
    got = {
        r["src_uri"]: r["final_uri"]
        for r in close_redirects_distributed(_to_df(spark, pairs)).collect()
    }
    assert got == {f"src{i}": "src0" for i in range(1, 40)}


def test_distributed_cycles_resolve_to_min(spark):
    pairs = {"b": "c", "c": "d", "d": "b", "a": "b", "z": "z"}
    got = {
        r["src_uri"]: r["final_uri"]
        for r in close_redirects_distributed(_to_df(spark, pairs)).collect()
    }
    assert got == close_redirects(pairs)
    assert got["b"] == got["c"] == got["d"] == got["a"] == "b"
    assert got["z"] == "z"


def test_resolve_redirects_df_gated_paths_agree(spark):
    pairs = _random_functional_graph(500, seed=4)
    redirects = _to_df(spark, pairs)
    occs = spark.createDataFrame(
        [(u,) for u in sorted({*pairs, *pairs.values()})][:300],
        "uri_raw string",
    )
    via_driver = resolve_redirects_df(occs, redirects)
    via_dist = resolve_redirects_df(occs, redirects, max_driver_edges=0)
    a = {r["uri_raw"]: r["uri"] for r in via_driver.collect()}
    b = {r["uri_raw"]: r["uri"] for r in via_dist.collect()}
    assert a == b


def test_duplicate_src_rows_deterministic_min_dst(spark):
    """A src with multiple dst rows must canonicalize to min(dst) in BOTH
    the driver and distributed strategies (the driver path previously did
    last-row-wins over a nondeterministic collect order)."""
    rows = [("a", "z1"), ("a", "b"), ("a", "m"), ("b", "c"), ("z1", "zz")]
    redirects = spark.createDataFrame(rows, "src_uri string, dst_uri string")
    occs = spark.createDataFrame([("a",), ("b",)], "uri_raw string")
    # min dst for 'a' is 'b' -> chases b -> c
    for max_edges in (10_000, 0):
        got = {
            r["uri_raw"]: r["uri"]
            for r in resolve_redirects_df(
                occs, redirects, max_driver_edges=max_edges
            ).collect()
        }
        assert got == {"a": "c", "b": "c"}, f"max_edges={max_edges}: {got}"


def test_distributed_empty(spark):
    empty = spark.createDataFrame([], "src_uri string, dst_uri string")
    assert close_redirects_distributed(empty).count() == 0
