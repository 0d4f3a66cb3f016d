"""Round-3 continuation: sort-by-field search, structured filter-context
DSL (term/terms/range/exists/bool), and function_score (field_value_factor
+ decay) — brute-force oracles on a purpose-built corpus; the hard
DuckDB gates live in the driver entries (bm25_sorted / bm25_dsl_filter /
bm25_function_score / bm25_decay_recency)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.query_dsl import (
    compile_filter, execute_query, parse_query,
)
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

TEXTS = ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
         "gamma delta", "alpha", "beta", "delta eps", "alpha delta",
         "beta delta"] * 4
N = len(TEXTS)


def _corpus() -> pa.Table:
    return pa.table({
        "conv_id": [f"c{i:05d}" for i in range(N)],
        "turn_idx": pa.array([0] * N, type=pa.int32()),
        "role": [("user", "assistant", "tool")[i % 3] for i in range(N)],
        "text": pa.array(TEXTS, type=pa.string()),
        "tool": [("", "search", "python")[i % 3] for i in range(N)],
        # deliberately NON-monotone in conv_id so field order != key order
        "ts": pa.array([((i * 7) % N) * 1000 for i in range(N)],
                       type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r7") / "idx")
    build_index(rd.from_arrow(_corpus()), out,
                EngineConfig(num_segments=3), IndexSpec())
    return out


def _match_set(s: IndexSearcher, q: str) -> pd.DataFrame:
    """All matching docs with raw scores (uncapped radial)."""
    return s.search({"q": q}, min_score=1e-300)


# ---------------------------------------------------------------------------
# sort-by-field
# ---------------------------------------------------------------------------

def test_sort_by_ts_desc_and_asc(idx):
    s = IndexSearcher(idx)
    base = _match_set(s, "alpha gamma")
    tbl = _corpus().to_pandas()
    m = base.merge(tbl[["conv_id", "turn_idx", "ts"]],
                   on=["conv_id", "turn_idx"])
    for order, asc in (("desc", False), ("asc", True)):
        got = s.search({"q": "alpha gamma"}, k=7, sort=("ts", order))
        exp = (m.sort_values(["ts", "conv_id", "turn_idx"],
                             ascending=[asc, True, True])
                .head(7).reset_index(drop=True))
        assert list(got["conv_id"]) == list(exp["conv_id"])
        assert list(got["ts"]) == list(exp["ts"])
        # scores still the BM25 scores of those docs
        assert np.allclose(got["score"], exp["score"], rtol=0, atol=0)
        assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_sort_by_string_field(idx):
    # per-segment uniq codes must still produce the global string order
    s = IndexSearcher(idx)
    base = _match_set(s, "delta")
    tbl = _corpus().to_pandas()
    m = base.merge(tbl[["conv_id", "turn_idx", "role"]],
                   on=["conv_id", "turn_idx"])
    got = s.search({"q": "delta"}, k=9, sort=("role", "desc"))
    exp = (m.sort_values(["role", "conv_id", "turn_idx"],
                         ascending=[False, True, True])
            .head(9).reset_index(drop=True))
    assert list(got["conv_id"]) == list(exp["conv_id"])
    assert list(got["role"]) == list(exp["role"])


def test_sort_with_filter(idx):
    s = IndexSearcher(idx)
    flt = compile_filter({"term": {"role": "user"}})
    got = s.search({"q": "beta"}, k=50, sort=("ts", "asc"), filter=flt)
    tbl = _corpus().to_pandas()
    roles = dict(zip(tbl["conv_id"], tbl["role"]))
    assert len(got) and all(roles[c] == "user" for c in got["conv_id"])
    assert list(got["ts"]) == sorted(got["ts"])


def test_sort_validation(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="sort requires plain taat"):
        s.search({"q": "alpha"}, k=5, sort=("ts", "desc"), mode="wand")
    with pytest.raises(ValueError, match="asc\\|desc"):
        s.search({"q": "alpha"}, k=5, sort=("ts", "down"))
    with pytest.raises(ValueError, match="non-key"):
        s.search({"q": "alpha"}, k=5, sort=("conv_id", "asc"))
    with pytest.raises(ValueError, match="not a stored column"):
        s.search({"q": "alpha"}, k=5, sort=("nope", "asc"))


def test_sort_key_rejects_nulls():
    # defined contract: sort fields must be non-null (otherwise
    # np.unique raises an opaque TypeError inside the Ray task and
    # numeric NaN placement is unspecified vs the oracle)
    from opensearch_jvector_ray.query import _sort_key_numeric
    t = pa.table({"f": pa.array(["a", None, "b"], type=pa.string())})
    with pytest.raises(ValueError, match="null"):
        _sort_key_numeric(t, "f")
    t2 = pa.table({"g": pa.array([1.0, None, 3.0], type=pa.float64())})
    with pytest.raises(ValueError, match="null"):
        _sort_key_numeric(t2, "g")


# ---------------------------------------------------------------------------
# structured filters
# ---------------------------------------------------------------------------

def test_filter_clauses_semantics(idx):
    s = IndexSearcher(idx)
    tbl = _corpus().to_pandas()
    meta = tbl.set_index("conv_id")

    def hit_ids(spec):
        out = s.search({"q": "alpha beta gamma delta"}, k=N,
                       filter=compile_filter(spec))
        return set(out["conv_id"])

    all_ids = hit_ids({"exists": {"field": "role"}})
    assert all_ids  # every doc matches some term; role never null

    t = hit_ids({"terms": {"role": ["tool", "assistant"]}})
    assert t == {c for c in all_ids
                 if meta.loc[c, "role"] in ("tool", "assistant")}

    r = hit_ids({"range": {"ts": {"gte": pd.Timestamp(0, unit="us"),
                                  "lt": pd.Timestamp(10_000, unit="us")}}})
    assert r == {c for c in all_ids
                 if meta.loc[c, "ts"] < pd.Timestamp(10_000, unit="us")}

    b = hit_ids({"bool": {
        "must": [{"term": {"role": "user"}}],
        "must_not": [{"term": {"tool": "search"}}],
        "should": [{"term": {"role": "user"}},
                   {"term": {"role": "tool"}}],
    }})
    assert b == {c for c in all_ids
                 if meta.loc[c, "role"] == "user"
                 and meta.loc[c, "tool"] != "search"}


def test_filter_validation():
    for bad in (
        {"term": {"a": 1, "b": 2}},
        {"terms": {"a": []}},
        {"range": {"a": {"ge": 1}}},
        {"range": {"a": {}}},
        {"exists": {}},
        {"bool": {}},
        {"bool": {"mustnt": []}},
        {"nope": {"a": 1}},
        {"term": {"a": 1}, "terms": {"b": [1]}},
    ):
        with pytest.raises(ValueError):
            compile_filter(bad)


def test_filter_sql_mirrors_spec():
    """filter_spec_sql is generated from the SAME spec; spot-check the
    emitted predicate text."""
    from opensearch_jvector_ray.oracles import filter_spec_sql
    sql = filter_spec_sql({"bool": {
        "must": [{"terms": {"lang": ["en", "de"]}},
                 {"range": {"n": {"gte": 2, "lt": 5}}}],
        "must_not": [{"term": {"src": "x"}}],
    }})
    assert "__f.lang IN ('en', 'de')" in sql
    assert "__f.n >= 2 AND __f.n < 5" in sql
    assert "NOT (__f.src = 'x')" in sql


# ---------------------------------------------------------------------------
# function_score
# ---------------------------------------------------------------------------

def _expected_fscore(s, q, mult_of, k=8):
    base = _match_set(s, q)
    tbl = _corpus().to_pandas()
    m = base.merge(tbl, on=["conv_id", "turn_idx"])
    m["fs"] = m["score"] * mult_of(m)
    m = m[m["fs"] > 0]
    return (m.sort_values(["fs", "conv_id", "turn_idx"],
                          ascending=[False, True, True])
             .head(k).reset_index(drop=True))


def test_fvf_modifiers(idx):
    s = IndexSearcher(idx)
    ts_f = lambda m: m["ts"].astype("int64").astype(np.float64)
    for modifier, fn in (("none", lambda v: v),
                         ("sqrt", np.sqrt),
                         ("log1p", np.log1p)):
        spec = {"kind": "field_value_factor", "field": "ts",
                "factor": 0.5, "modifier": modifier}
        got = s.search({"q": "alpha beta"}, k=8, score_fn=spec)
        exp = _expected_fscore(s, "alpha beta",
                               lambda m: 0.5 * fn(ts_f(m)))
        assert list(got["conv_id"]) == list(exp["conv_id"])
        assert np.allclose(got["score"], exp["fs"], rtol=0, atol=0)


def test_decay_fns_match_bruteforce(idx):
    s = IndexSearcher(idx)
    origin, scale, decay = 20_000.0, 9_000.0, 0.5

    def dist(m):
        v = m["ts"].astype("int64").astype(np.float64)
        return np.maximum(np.abs(v - origin), 0.0)

    mults = {
        "linear": lambda m: np.maximum(
            0.0, (scale / (1 - decay) - dist(m)) / (scale / (1 - decay))),
        "exp": lambda m: np.exp(math.log(decay) / scale * dist(m)),
        "gauss": lambda m: np.exp(
            -(dist(m) ** 2)
            / (2.0 * -(scale * scale) / (2.0 * math.log(decay)))),
    }
    for fn, mult in mults.items():
        spec = {"kind": "decay", "decay_fn": fn, "field": "ts",
                "origin": origin, "scale": scale, "decay": decay}
        got = s.search({"q": "gamma delta"}, k=10, score_fn=spec)
        exp = _expected_fscore(s, "gamma delta", mult, k=10)
        assert list(got["conv_id"]) == list(exp["conv_id"]), fn
        assert np.allclose(got["score"], exp["fs"], rtol=0, atol=0), fn


def test_linear_decay_drops_out_of_reach(idx):
    """Docs past the linear reach (multiplier 0) are dropped — the
    score>0 match predicate, not a rank-last tail."""
    s = IndexSearcher(idx)
    spec = {"kind": "decay", "decay_fn": "linear", "field": "ts",
            "origin": 0.0, "scale": 2_000.0, "decay": 0.5}
    got = s.search({"q": "alpha beta gamma delta eps"}, k=N,
                   score_fn=spec)
    tbl = _corpus().to_pandas()
    ts_of = dict(zip(tbl["conv_id"], tbl["ts"].astype("int64")))
    assert len(got)
    assert all(ts_of[c] < 4_000 for c in got["conv_id"])


def test_score_fn_validation(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="requires plain taat"):
        s.search({"q": "alpha"}, k=5, mode="wand",
                 score_fn={"kind": "field_value_factor", "field": "ts"})
    with pytest.raises(ValueError, match="unknown modifier"):
        s.search({"q": "alpha"}, k=5,
                 score_fn={"kind": "field_value_factor", "field": "ts",
                           "modifier": "sq"})
    with pytest.raises(ValueError, match="scale > 0"):
        s.search({"q": "alpha"}, k=5,
                 score_fn={"kind": "decay", "field": "ts", "origin": 0,
                           "scale": -1})
    with pytest.raises(ValueError, match="not a stored"):
        s.search({"q": "alpha"}, k=5,
                 score_fn={"kind": "field_value_factor", "field": "zz"})


# ---------------------------------------------------------------------------
# DSL plumbing
# ---------------------------------------------------------------------------

def test_dsl_match_filter_and_sort(idx):
    s = IndexSearcher(idx)
    body = {"match": {"query": "beta", "k": 6,
                      "filter": {"term": {"role": "user"}},
                      "sort": {"field": "ts", "order": "asc"}}}
    got = execute_query(body, searcher=s)
    direct = s.search({"q": "beta"}, k=6, sort=("ts", "asc"),
                      filter=compile_filter({"term": {"role": "user"}}))
    direct["score"] = direct["score"].round(6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  direct.reset_index(drop=True))


def test_dsl_function_score(idx):
    s = IndexSearcher(idx)
    body = {"function_score": {
        "query": "alpha beta", "k": 5,
        "field_value_factor": {"field": "ts", "factor": 0.5,
                               "modifier": "sqrt"}}}
    got = execute_query(body, searcher=s)
    direct = s.search({"q": "alpha beta"}, k=5,
                      score_fn={"kind": "field_value_factor",
                                "field": "ts", "factor": 0.5,
                                "modifier": "sqrt", "missing": 1.0})
    direct["score"] = direct["score"].round(6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  direct.reset_index(drop=True))


def test_dsl_strictness():
    for bad in (
        {"match": {"query": "a", "sorts": {}}},
        {"match": {"query": "a", "sort": {"field": "ts",
                                          "order": "down"}}},
        {"match": {"query": "a", "sort": {"order": "asc"}}},
        {"match": {"query": "a", "filter": {"nope": {}}}},
        {"function_score": {"query": "a"}},
        {"function_score": {"query": "a",
                            "field_value_factor": {"field": "f"},
                            "decay": {"field": "f", "origin": 0,
                                      "scale": 1}}},
        {"function_score": {"query": "a",
                            "field_value_factor": {"fld": "f"}}},
        {"function_score": {"query": "a",
                            "decay": {"field": "f", "origin": 0}}},
    ):
        with pytest.raises(ValueError):
            parse_query(bad)
