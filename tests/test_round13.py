"""Round-4 query-surface block: simple_query_string (the +/-/"phrase"/
trailing-* flag subset) and Damerau-Levenshtein fuzzy transpositions.
Brute-force oracles here; the hard DuckDB gates are the driver entries
bm25_simple_query_string and bm25_fuzzy_dl."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.analyze import parse_simple_query_string
from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import (
    IndexSearcher, _damerau_levenshtein_vec,
)
from opensearch_jvector_ray.query_dsl import execute_query
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

CFG = EngineConfig(num_segments=3)

TEXTS = ["alpha beta sort merge", "alpha gamma merge sort",
         "beta gamma sort merge scan", "alpha beta gamma",
         "gamma delta sort", "alpha scan", "beta merge sort",
         "delta eps sort merge", "alpha delta merge", "beta delta"] * 4
N = len(TEXTS)


def _corpus() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r13") / "idx")
    build_index(rd.from_arrow(_corpus()), out, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    return out


# -- parser ---------------------------------------------------------------

def test_parse_clause_kinds():
    cls = parse_simple_query_string(
        '+data -filter "sort merge" quer* plain', CFG)
    assert [(c["occur"], c["kind"]) for c in cls] == [
        ("must", "terms"), ("must_not", "terms"), ("should", "phrase"),
        ("should", "prefix"), ("should", "terms")]
    assert cls[2]["words"] == ["sort", "merge"]
    assert cls[3]["prefix"] == "quer"


def test_parse_one_word_phrase_collapses_to_term():
    cls = parse_simple_query_string('"merge"', CFG)
    assert cls == [{"occur": "should", "kind": "terms",
                    "tw": [("merge", 1)]}]


def test_parse_stopword_only_unit_dropped():
    assert parse_simple_query_string('the "the a"', CFG) == []


def test_parse_bare_star_rejected():
    with pytest.raises(ValueError):
        parse_simple_query_string("data *", CFG)


def test_parse_quoted_unit_keeps_occur_prefix():
    cls = parse_simple_query_string('-"sort merge"', CFG)
    assert cls[0]["occur"] == "must_not" and cls[0]["kind"] == "phrase"


# -- engine semantics -----------------------------------------------------

def _tok(t: str) -> list[str]:
    from opensearch_jvector_ray.analyze import analyze_query
    return analyze_query(t, CFG)


def test_sqs_must_and_must_not(idx):
    s = IndexSearcher(idx)
    out = s.simple_query_string({"q": "+alpha -scan merge"}, k=N)
    got = set(out["doc_id"])
    for i, t in enumerate(TEXTS):
        toks = _tok(t)
        expect = "alpha" in toks and "scan" not in toks
        assert (i in got) == expect, (i, t)


def test_sqs_phrase_clause_requires_adjacency(idx):
    s = IndexSearcher(idx)
    out = s.simple_query_string({"q": '+"sort merge"'}, k=N)
    got = set(out["doc_id"])
    for i, t in enumerate(TEXTS):
        toks = _tok(t)
        adj = any(toks[j] == "sort" and toks[j + 1] == "merge"
                  for j in range(len(toks) - 1))
        assert (i in got) == adj, (i, t)


def test_sqs_must_not_phrase(idx):
    s = IndexSearcher(idx)
    out = s.simple_query_string({"q": 'alpha -"sort merge"'}, k=N)
    got = set(out["doc_id"])
    for i, t in enumerate(TEXTS):
        toks = _tok(t)
        adj = any(toks[j] == "sort" and toks[j + 1] == "merge"
                  for j in range(len(toks) - 1))
        assert (i in got) == ("alpha" in toks and not adj), (i, t)


def test_sqs_score_is_sum_of_clause_scores(idx):
    # a pure-should two-term sqs equals the plain match query (same
    # clause sum, same ranking)
    s = IndexSearcher(idx)
    a = s.simple_query_string({"q": "alpha merge"}, k=N)
    b = s.search({"q": "alpha merge"}, k=N)
    pd.testing.assert_frame_equal(a, b)


def test_sqs_prefix_clause_expands(idx):
    s = IndexSearcher(idx)
    a = s.simple_query_string({"q": "mer*"}, k=N)
    b = s.prefix_search({"q": "mer*"}, k=N)
    pd.testing.assert_frame_equal(a, b)


def test_sqs_dsl_round_trip(idx):
    s = IndexSearcher(idx)
    pd.testing.assert_frame_equal(
        execute_query({"simple_query_string":
                       {"query": '+alpha -scan "sort merge"',
                        "k": 7}}, searcher=s),
        s.simple_query_string({"q": '+alpha -scan "sort merge"'}, k=7))


# -- damerau fuzzy --------------------------------------------------------

def test_damerau_dp_matches_duckdb_property():
    import random
    random.seed(11)
    al = "abcdef"
    cands = ["".join(random.choice(al)
                     for _ in range(random.randint(0, 8)))
             for _ in range(300)]
    con = duckdb.connect()
    for q in ["", "ab", "bca", "fedab", "aabb"]:
        got = _damerau_levenshtein_vec(cands, q)
        exp = [con.sql("select damerau_levenshtein(?, ?)",
                       params=[c, q]).fetchone()[0] for c in cands]
        assert list(got) == exp


def test_transpositions_reach_swapped_terms(idx):
    s = IndexSearcher(idx)
    # "mrege" is a swap away from "merge": DL 1, plain levenshtein 2
    assert "merge" in s.expand_fuzzy("mrege", max_edits=1,
                                     transpositions=True)
    assert "merge" not in s.expand_fuzzy("mrege", max_edits=1,
                                         transpositions=False)


def test_fuzzy_dsl_transpositions_flag(idx):
    s = IndexSearcher(idx)
    pd.testing.assert_frame_equal(
        execute_query({"fuzzy": {"query": "mrege", "k": 5,
                                 "max_edits": 1,
                                 "transpositions": True}}, searcher=s),
        s.fuzzy_search({"q": "mrege"}, k=5, max_edits=1,
                       transpositions=True))
