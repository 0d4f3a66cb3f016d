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
