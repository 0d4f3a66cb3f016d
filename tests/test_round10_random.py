"""Seeded randomized property tests for the round-4-continuation
aggregation/query surface (multi_terms, rare_terms, extended_stats,
weighted_avg, adjacency_matrix, string_stats, matrix_stats, date_range,
top_metrics, percentile_ranks, bucket metrics, dis_max, span_first,
match_bool_prefix) — every check against an obviously-correct
pandas/numpy reference over one random corpus with deliberate edge
cases: empty docs, NULL key fields, duplicated sort values, zero-match
queries, single-bucket date ranges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

SEED = 77
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the",
         "kappa", "mu", "nu"]
N = 160


def _mk():
    rng = np.random.default_rng(SEED)
    texts, langs, srcs, nch, tss = [], [], [], [], []
    for i in range(N):
        L = int(rng.integers(0, 12))            # includes empty docs
        texts.append(" ".join(rng.choice(VOCAB, size=L)))
        langs.append((None, "en", "de", "fr")[int(rng.integers(4))])
        srcs.append(f"s{int(rng.integers(6))}")
        nch.append(int(rng.integers(5, 40)))    # many duplicate values
        tss.append(int(rng.integers(0, 30)) * 600_000_000)
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
        "n_chars": pa.array(nch, type=pa.int64()),
        "ts": pa.array(tss, type=pa.timestamp("us")),
    })


CORPUS = _mk()
CFG = EngineConfig(num_segments=5)
MS = 1e-9


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r10r") / "idx")
    build_index(rd.from_arrow(CORPUS), out, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("lang", "source", "n_chars", "ts"),
                          ts_col=""))
    return out


QUERIES = ["alpha delta", "gamma", "zeta kappa mu", "nosuchterm"]


def _match(s, q):
    hit = s.search({"q": q}, min_score=MS)
    base = CORPUS.to_pandas()
    return base[base["doc_id"].isin(hit["doc_id"])]


@pytest.mark.parametrize("q", QUERIES)
def test_random_bucket_agg_family(idx, q):
    s = IndexSearcher(idx)
    m = _match(s, q)
    qs = {"q": q}
    # multi_terms
    mt = s.multi_terms_agg(qs, fields=["lang", "source"], min_score=MS)
    want = (m.dropna(subset=["lang", "source"])
             .groupby(["lang", "source"]).size())
    got = {(r.lang, r.source): int(r.doc_count)
           for r in mt.itertuples()}
    assert got == dict(want) if len(m) else mt.empty
    # rare_terms at the median count
    if len(m):
        counts = m.groupby("source").size()
        thr = max(1, int(counts.median()))
        rt = s.rare_terms_agg(qs, field="source", max_doc_count=thr,
                              min_score=MS)
        assert set(rt["source"]) == set(counts[counts <= thr].index)
    # extended_stats / weighted_avg / matrix_stats pinned chains
    if len(m):
        v = m["n_chars"].to_numpy(np.int64)
        w = m["doc_id"].to_numpy(np.int64)
        n = float(len(v))
        es = s.extended_stats_agg(qs, value_col="n_chars", min_score=MS)
        avg = float(v.sum()) / n
        var = float(np.dot(v, v)) / n - avg * avg
        assert es["v_avg"][0] == avg and es["v_variance"][0] == var
        if int(w.sum()):
            wa = s.weighted_avg_agg(qs, value_col="n_chars",
                                    weight_col="doc_id", min_score=MS)
            assert wa["weighted_avg"][0] == \
                float(np.dot(v, w)) / float(w.sum())
        mx = float(w.sum()) / n
        cov = float(np.dot(v, w)) / n - avg * mx
        ms_ = s.matrix_stats_agg(qs, x_col="n_chars", y_col="doc_id",
                                 min_score=MS)
        assert ms_["covariance"][0] == cov
    # percentile_ranks at random probes
    if len(m):
        v = m["n_chars"].to_numpy(np.int64)
        rng = np.random.default_rng(SEED + 1)
        probes = sorted(set(float(x) for x in rng.integers(0, 45, 3)))
        pr = s.percentile_ranks_agg(qs, value_col="n_chars",
                                    values=probes, min_score=MS)
        for p in probes:
            got_r = float(pr[pr["value"] == p]["pct_rank"].iloc[0])
            assert got_r == float(int((v <= p).sum())) / float(len(v))


@pytest.mark.parametrize("q", QUERIES)
def test_random_top_metrics_and_date_range(idx, q):
    s = IndexSearcher(idx)
    m = _match(s, q)
    qs = {"q": q}
    tm = s.top_metrics_agg(qs, sort_col="n_chars",
                           metric_cols=["source"], min_score=MS,
                           size=5, sort_order="asc")
    if len(m):
        want = m.sort_values(["n_chars", "doc_id"]).head(5)
        assert list(tm["doc_id"]) == list(want["doc_id"])
        assert list(tm["source"]) == list(want["source"])
    else:
        assert tm.empty
    ranges = [("a", None, "1970-01-01T02:00:00"),
              ("b", "1970-01-01T02:00:00", None)]
    dr = s.date_range_agg(qs, ts_col="ts", ranges=ranges, min_score=MS)
    if len(m):
        ts = pd.to_datetime(m["ts"])
        cut = pd.Timestamp("1970-01-01T02:00:00")
        got = dict(zip(dr["range_key"], dr["doc_count"]))
        assert got["a"] == int((ts < cut).sum())
        assert got["b"] == int((ts >= cut).sum())


def test_random_dis_max_vs_single(idx):
    # dis_max of ONE subquery must equal the plain search frame
    s = IndexSearcher(idx)
    one = s.dis_max({"q": ["alpha delta"]}, k=30, tie_breaker=0.7)
    plain = s.search({"q": "alpha delta"}, k=30)
    pd.testing.assert_frame_equal(one, plain)
    # order-invariance: subquery list order must not change results
    a = s.dis_max({"q": ["gamma", "zeta kappa"]}, k=30, tie_breaker=0.4)
    b = s.dis_max({"q": ["zeta kappa", "gamma"]}, k=30, tie_breaker=0.4)
    assert list(a["doc_id"]) == list(b["doc_id"])
    np.testing.assert_allclose(a["score"], b["score"], rtol=0, atol=1e-12)


def test_random_span_first_monotone(idx):
    # widening the window can only grow the match set; end-> inf == plain
    s = IndexSearcher(idx)
    prev: set = set()
    for end in (1, 2, 4, 8, 64):
        out = s.search({"q": "alpha gamma"}, k=N, mode="span_first",
                       span_end=end)
        ids = set(out["doc_id"])
        assert prev <= ids
        prev = ids
    plain = s.search({"q": "alpha gamma"}, k=N)
    assert prev == set(plain["doc_id"])


def test_random_match_bool_prefix_superset(idx):
    # 'alpha ze' must match every doc the exact terms match, plus
    # ze-prefixed expansions
    s = IndexSearcher(idx)
    mbp = s.match_bool_prefix({"q": "alpha ze"}, k=N)
    exact = s.search({"q": "alpha zeta"}, k=N)
    assert set(exact["doc_id"]) <= set(mbp["doc_id"])
