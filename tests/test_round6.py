"""Round-3 continuation query surface: minimum_should_match boolean
queries, range / top-hits aggregations, cardinality (exact + HLL),
date_histogram.

Driver-gate parity vs DuckDB covers the SQL-expressible rules at
sf0.001/0.01/0.1; these tests cover the semantics directly against
brute-force containment oracles on purpose-built corpora.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index


def _corpus(texts: list[str]) -> pa.Table:
    n = len(texts)
    return pa.table({
        "conv_id": [f"c{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": ["user"] * n,
        "text": pa.array(texts, type=pa.string()),
        "tool": [""] * n,
        "ts": pa.array(list(range(n)), type=pa.timestamp("us")),
    })


MSM_TEXTS = ["alpha beta", "alpha gamma", "beta gamma",
             "alpha beta gamma", "gamma delta", "alpha", "beta",
             "delta eps", "alpha delta", "beta delta"] * 5


@pytest.fixture(scope="module")
def msm_index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("r6msm") / "idx")
    build_index(rd.from_arrow(_corpus(MSM_TEXTS)), idx,
                EngineConfig(num_segments=4), IndexSpec())
    return idx


def test_minimum_should_match_containment(msm_index):
    """msm=2 keeps exactly the docs matching >= 2 distinct should terms,
    ranked identically to the unfiltered boolean ranking on that set."""
    s = IndexSearcher(msm_index)
    out = s.search({"q": "alpha beta gamma"}, k=100, mode="boolean",
                   minimum_should_match=2)
    hit = {MSM_TEXTS[int(c[1:])] for c in out["conv_id"]}
    want = {t for t in set(MSM_TEXTS)
            if len({"alpha", "beta", "gamma"} & set(t.split())) >= 2}
    assert hit == want
    # scores are the plain should-sum: same docs rank the same as the
    # unfiltered query restricted to the qualifying set
    full = s.search({"q": "alpha beta gamma"}, k=100, mode="boolean")
    sub = full[full["conv_id"].isin(out["conv_id"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.drop(columns="rank"), sub.drop(columns="rank"))


def test_minimum_should_match_edges(msm_index):
    s = IndexSearcher(msm_index)
    # msm > number of should terms: matches nothing
    assert s.search({"q": "alpha"}, k=10, mode="boolean",
                    minimum_should_match=2).empty
    # must doesn't count toward msm: '+alpha beta' msm=2 needs beta AND
    # one more distinct should match — only beta exists, so empty
    assert s.search({"q": "+alpha beta"}, k=10, mode="boolean",
                    minimum_should_match=2).empty
    # msm=1 with must: doc must contain alpha (must) and beta (the one
    # should term)
    out = s.search({"q": "+alpha beta"}, k=100, mode="boolean",
                   minimum_should_match=1)
    hit = {MSM_TEXTS[int(c[1:])] for c in out["conv_id"]}
    assert hit == {"alpha beta", "alpha beta gamma"}
    # msm=0 is a no-op
    a = s.search({"q": "alpha beta"}, k=100, mode="boolean",
                 minimum_should_match=0)
    b = s.search({"q": "alpha beta"}, k=100, mode="boolean")
    pd.testing.assert_frame_equal(a, b)
    # validation: boolean mode only, non-negative
    with pytest.raises(ValueError, match="mode='boolean'"):
        s.search({"q": "alpha"}, k=10, minimum_should_match=1)
    with pytest.raises(ValueError, match=">= 0"):
        s.search({"q": "alpha"}, k=10, mode="boolean",
                 minimum_should_match=-1)


AGG_TEXTS = ["alpha beta word extra", "alpha beta", "alpha gamma beta",
             "beta gamma", "alpha delta", "alpha beta gamma delta",
             "gamma delta", "alpha", "beta delta word", "alpha word"] * 8


@pytest.fixture(scope="module")
def agg_index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("r6agg") / "idx")
    tbl = _corpus(AGG_TEXTS)
    # role column becomes the facet bucket; ts strides 90 minutes so
    # hour/day truncation produce several buckets
    n = tbl.num_rows
    tbl = tbl.set_column(tbl.schema.get_field_index("role"), "role",
                         pa.array([f"r{i % 3}" for i in range(n)]))
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts",
        pa.array(np.arange(n, dtype=np.int64) * 5_400_000_000
                 + 1_700_000_000_000_000, type=pa.timestamp("us")))
    build_index(rd.from_arrow(tbl), idx, EngineConfig(num_segments=4),
                IndexSpec())
    return idx, tbl


def _radial_hits(s, q, min_score):
    out = s.search({"q": q}, min_score=min_score)
    return out


def test_range_agg_bruteforce(agg_index):
    idx, tbl = agg_index
    s = IndexSearcher(idx)
    # value col = turn_idx is constant; use ts microseconds? store_cols
    # include role/tool/ts — range over ts is awkward; instead aggregate
    # over turn_idx is constant... use the n-th doc's ts converted is not
    # a stored int.  The documents-table driver entry covers real ints;
    # here exercise zero-fill + overlap on turn_idx (all zero).
    ranges = [("zero", -1.0, 1.0), ("pos", 1.0, None), ("all", None, None)]
    out = s.range_agg({"q": "alpha beta"}, value_col="turn_idx",
                      ranges=ranges, min_score=0.0)
    hits = _radial_hits(s, "alpha beta", 0.0)
    nh = len(hits)
    got = dict(zip(out["range_key"], out["doc_count"]))
    assert got == {"zero": nh, "pos": 0, "all": nh}
    with pytest.raises(ValueError, match="unique"):
        s.range_agg({"q": "alpha"}, value_col="turn_idx",
                    ranges=[("a", None, None), ("a", 0, 1)], min_score=0.0)


def test_top_hits_matches_bruteforce(agg_index):
    idx, tbl = agg_index
    s = IndexSearcher(idx)
    n = 2
    out = s.top_hits_agg({"q": "alpha beta"}, group_col="role", n=n,
                         min_score=0.0)
    # brute force: radial hits joined to role, per-bucket head(n) by
    # (score desc, key asc)
    hits = _radial_hits(s, "alpha beta", 0.0)
    roles = {cid: f"r{int(cid[1:]) % 3}" for cid in hits["conv_id"]}
    hits = hits.assign(role=[roles[c] for c in hits["conv_id"]])
    exp = (hits.sort_values(["role", "score", "conv_id", "turn_idx"],
                            ascending=[True, False, True, True],
                            kind="mergesort")
               .groupby("role", sort=False).head(n))
    exp = exp.reset_index(drop=True)
    got = out.sort_values(["role", "bucket_rank"]).reset_index(drop=True)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert (got.groupby("role")["bucket_rank"].apply(list)
               .map(lambda v: v == list(range(1, len(v) + 1))).all())
    np.testing.assert_allclose(got["score"], np.round(exp["score"], 6))


def test_date_histogram_bruteforce(agg_index):
    idx, tbl = agg_index
    s = IndexSearcher(idx)
    out = s.date_histogram_agg({"q": "alpha beta"}, ts_col="ts",
                               calendar_interval="hour", min_score=0.0)
    hits = _radial_hits(s, "alpha beta", 0.0)
    ts = {tbl["conv_id"][i].as_py(): tbl["ts"][i].as_py()
          for i in range(tbl.num_rows)}
    vals = np.array([ts[c] for c in hits["conv_id"]],
                    dtype="datetime64[us]")
    b = vals.astype("datetime64[h]").astype("datetime64[us]")
    ub, cnt = np.unique(b, return_counts=True)
    assert list(out["bucket"].astype("datetime64[us]")) == list(ub)
    assert out["doc_count"].tolist() == cnt.tolist()
    assert len(out) > 3          # the stride actually spreads buckets
    with pytest.raises(ValueError, match="month|day|hour"):
        s.date_histogram_agg({"q": "a"}, ts_col="ts",
                             calendar_interval="week", min_score=0.0)


def test_new_agg_dsl_clauses(agg_index):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    idx, _ = agg_index
    s = IndexSearcher(idx)
    a = execute_query({"range_agg": {"query": "alpha beta",
                                     "field": "turn_idx", "min_score": 0.0,
                                     "ranges": [["zero", -1, 1],
                                                ["pos", 1, None]]}},
                      searcher=s)
    b = s.range_agg({"q": "alpha beta"}, value_col="turn_idx",
                    ranges=[("zero", -1, 1), ("pos", 1, None)],
                    min_score=0.0)
    pd.testing.assert_frame_equal(a, b)
    a = execute_query({"date_histogram": {"query": "alpha beta",
                                          "field": "ts", "min_score": 0.0,
                                          "calendar_interval": "hour"}},
                      searcher=s)
    b = s.date_histogram_agg({"q": "alpha beta"}, ts_col="ts",
                             calendar_interval="hour", min_score=0.0)
    pd.testing.assert_frame_equal(a, b)
    a = execute_query({"date_histogram": {"query": "alpha beta",
                                          "field": "ts", "min_score": 0.0,
                                          "calendar_interval": "hour",
                                          "pipeline": "moving_avg",
                                          "window": 2}}, searcher=s)
    b = s.date_histogram_agg({"q": "alpha beta"}, ts_col="ts",
                             calendar_interval="hour", min_score=0.0,
                             pipeline="moving_avg", pipeline_window=2)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="pipeline"):
        parse_query({"date_histogram": {"query": "x", "field": "ts",
                                        "min_score": 0.0,
                                        "calendar_interval": "hour",
                                        "pipeline": "nope"}})
    a = execute_query({"top_hits": {"query": "alpha beta", "field": "role",
                                    "min_score": 0.0, "n": 2}}, searcher=s)
    b = s.top_hits_agg({"q": "alpha beta"}, group_col="role", n=2,
                       min_score=0.0)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="ranges"):
        parse_query({"range_agg": {"query": "x", "field": "c",
                                   "min_score": 0.0, "ranges": []}})
    with pytest.raises(ValueError, match="calendar_interval"):
        parse_query({"date_histogram": {"query": "x", "field": "ts",
                                        "min_score": 0.0,
                                        "calendar_interval": "week"}})


def test_minimum_should_match_dsl(msm_index):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    s = IndexSearcher(msm_index)
    a = execute_query({"bool": {"should": ["alpha", "beta", "gamma"],
                                "k": 100, "minimum_should_match": 2}},
                      searcher=s)
    b = s.search({"q": "alpha beta gamma"}, k=100, mode="boolean",
                 minimum_should_match=2)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    with pytest.raises(ValueError, match="non-negative integer"):
        parse_query({"bool": {"should": ["a"],
                              "minimum_should_match": -1}})
