"""Pure-Python core: generator invariants, oracle pipeline, AC automaton."""

import math

import pytest

from dbpedia_spotlight_spark.fixtures import oracle as O
from dbpedia_spotlight_spark.fixtures.generator import FixtureConfig, generate
from dbpedia_spotlight_spark.fixtures.stats import build_stats
from dbpedia_spotlight_spark.functions.normalize import sf_normalize_py
from dbpedia_spotlight_spark.functions.similarity import (
    edit_distance_score_py,
    jaro_winkler_py,
)
from dbpedia_spotlight_spark.operators.ahocorasick import (
    AhoCorasick,
    greedy_filter,
    spot_text,
)
from dbpedia_spotlight_spark.operators.redirects import close_redirects


@pytest.fixture(scope="module")
def fx():
    return generate(FixtureConfig(n_docs=120))


@pytest.fixture(scope="module")
def stats(fx):
    return build_stats(fx)


def test_generator_deterministic(fx):
    fx2 = generate(FixtureConfig(n_docs=120))
    assert fx.documents.equals(fx2.documents)
    assert fx.training_occurrences.equals(fx2.training_occurrences)


def test_stats_invariants(fx, stats):
    # annotated_count(sf) == Σ_r pair_count(sf, r)  (FIXTURES.md §3)
    merged = stats.candidate_map.groupby("sf_id").pair_count.sum()
    for r in stats.surface_form_stats.itertuples(index=False):
        assert merged[r.sf_id] == r.annotated_count
        assert r.total_count >= r.annotated_count
    # support(r) == Σ_sf pair_count(sf, r)
    by_res = stats.candidate_map.groupby("res_id").pair_count.sum()
    for r in stats.resources.itertuples(index=False):
        assert by_res.get(r.res_id, 0) <= r.support
    assert abs(stats.resources.prior.sum() - 1.0) < 1e-9


def test_span_offsets_consistent(fx):
    """Span offsets must be the char offset in the concatenated doc text."""
    for row in fx.documents.itertuples(index=False):
        pos = 0
        for span in row.spans:
            assert span["offset"] == pos
            pos += len(span["text"]) + 1


def test_oracle_spots_exactly_the_planted_mentions(fx, stats):
    mentions = O.spot_documents(fx.documents, list(stats.surface_form_stats.sf))
    gold_keys = {
        f"{r.doc_id}:{r.offset}"
        for r in fx.gold_occurrences.itertuples(index=False)
    }
    assert {m.key for m in mentions} == gold_keys


def test_oracle_f1_meets_target(fx, stats):
    mentions = O.spot_documents(fx.documents, list(stats.surface_form_stats.sf))
    model = O.OracleModel(stats, set(fx.stopwords.word))
    links = O.link_mentions(mentions, fx.documents, model)
    clusters = O.cluster_mentions(links)
    assert O.pairwise_f1(clusters, fx.eval_pairs) >= 0.99


# ---- Aho-Corasick vs reference-documented behavior -------------------------


def test_ac_dilma_scenario():
    """AhoCorasickSpotter.scala:81-110 scenario: keep leftmost-longest."""
    ac = AhoCorasick(["Dilma", "Dilma Rousseff", "Rousseff"])
    text = "President Dilma Rousseff spoke."
    assert spot_text(ac, text) == [(10, 14)]


def test_ac_word_boundaries():
    ac = AhoCorasick(["Berlin"])
    assert spot_text(ac, "in Berlin,") == [(3, 6)]
    assert spot_text(ac, "Berlinx") == []
    assert spot_text(ac, "xBerlin") == []
    assert spot_text(ac, "(Berlin)") == [(1, 6)]
    assert spot_text(ac, "Berlin") == [(0, 6)]


def test_ac_case_insensitive_reports_actual_text():
    ac = AhoCorasick(["Berlin"], case_sensitive=False)
    text = "we saw berlin today"
    spots = spot_text(ac, text)
    assert spots == [(7, 6)]
    assert text[7:13] == "berlin"


def test_ac_overlap_true_returns_all():
    ac = AhoCorasick(["ab", "b"], case_sensitive=True)
    assert spot_text(ac, "ab", overlap=True) == [(0, 2), (1, 1)]


def test_ac_adjacent_matches_need_gap():
    """Greedy filter: next match must start strictly after previous end
    (AhoCorasickSpotter.scala:135-145)."""
    ac = AhoCorasick(["aa", "bb"], case_sensitive=True)
    assert spot_text(ac, "aa bb") == [(0, 2), (3, 2)]


def test_ac_find_all_counts():
    ac = AhoCorasick(["na"], case_sensitive=True)
    assert ac.find_all("banana") == [(2, 2), (4, 2)]


# ---- scalar functions -------------------------------------------------------


def test_sf_normalize():
    # MemorySurfaceFormStore.scala:43 semantics
    assert sf_normalize_py("The United-States!") == "united states"
    assert sf_normalize_py("An O’Neill") == "o neill"
    assert sf_normalize_py("a the an") == ""


def test_edit_distance_score():
    # MemorySurfaceFormStore.scala:127-137
    assert edit_distance_score_py("Berlin", "Berlin") == 1.0
    # the case-only rule is asymmetric: data.upper()==real or data.lower()==real
    assert edit_distance_score_py("Berlin", "berlin") == 0.85
    assert edit_distance_score_py("Berlin", "BERLIN") == 0.85
    assert math.isclose(
        edit_distance_score_py("berlin", "Berlin"), 0.85 * (1 - 1 / 6)
    )
    assert math.isclose(
        edit_distance_score_py("Barlin", "Berlin"), 0.85 * (1 - 1 / 6)
    )


def test_jaro_winkler_known_values():
    assert jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.8400, abs=1e-4)
    assert jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert jaro_winkler_py("abc", "abc") == 1.0
    assert jaro_winkler_py("abc", "xyz") == 0.0


def test_jaro_winkler_matches_duckdb():
    import duckdb

    pairs = [
        ("MARTHA", "MARHTA"), ("Dilma Rousseff", "Dilma"),
        ("kamar", "Kamar"), ("zorvel dun", "zorvel dunbar"),
        ("", "x"), ("same", "same"),
    ]
    con = duckdb.connect()
    for a, b in pairs:
        got = jaro_winkler_py(a, b)
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert got == pytest.approx(want, abs=1e-12), (a, b)


def test_redirect_closure_chains_and_cycle():
    closed = close_redirects(
        {"a": "b", "b": "c", "x": "y", "y": "x", "q": "x"}
    )
    assert closed["a"] == "c" and closed["b"] == "c"
    assert closed["x"] == "x" and closed["y"] == "x"  # cycle -> min member
    assert closed["q"] == "x"
