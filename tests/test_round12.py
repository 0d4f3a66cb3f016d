"""Round-4 statistical/pipeline aggregations (mad, boxplot, t_test,
bucket_sort, moving_percentiles, rate): brute-force oracles on a
purpose-built corpus; the hard DuckDB gates live in the driver entries
(bm25_mad, bm25_boxplot, bm25_t_test, bm25_bucket_sort,
bm25_moving_percentiles, bm25_rate)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.query_dsl import execute_query
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

TEXTS = ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
         "gamma delta", "alpha", "beta", "delta eps", "alpha delta",
         "beta delta"] * 5
N = len(TEXTS)
LANGS = [("en", "de", "fr", "es")[i % 4] for i in range(N)]
NCHARS = [len(t) * (1 + i % 7) for i, t in enumerate(TEXTS)]
# 2 days x 5 hour-slots, uneven multiplicity (non-trivial rank orders)
TS = [(i % 2) * 86_400_000_000 + ((i * 7) % 5) * 3_600_000_000
      for i in range(N)]


def _corpus() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
        "lang": pa.array(LANGS, type=pa.string()),
        "n_chars": pa.array(NCHARS, type=pa.int64()),
        "ts": pa.array(TS, type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r12") / "idx")
    build_index(rd.from_arrow(_corpus()), out,
                EngineConfig(num_segments=3),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("lang", "n_chars", "ts"),
                          ts_col=""))
    return out


MS = 1e-9
Q = {"q": "alpha delta"}


def _match_vals(s: IndexSearcher, col: str = "n_chars") -> np.ndarray:
    hit = s.search(Q, min_score=MS)
    base = _corpus().to_pandas()
    return (base[base["doc_id"].isin(hit["doc_id"])][col]
            .to_numpy(dtype=np.int64))


def _qdisc_brute(v: np.ndarray, q: float) -> int:
    sv = np.sort(v)
    return int(sv[max(1, math.ceil(q * len(sv))) - 1])


def test_mad_agg_brute_force(idx):
    s = IndexSearcher(idx)
    out = s.mad_agg(Q, value_col="n_chars", min_score=MS)
    v = _match_vals(s)
    m = _qdisc_brute(v, 0.5)
    mad = _qdisc_brute(np.abs(v - m), 0.5)
    assert len(out) == 1
    assert out["median"].iloc[0] == float(m)
    assert out["mad"].iloc[0] == float(mad)
    assert mad > 0        # non-degenerate fixture


def test_boxplot_agg_brute_force(idx):
    s = IndexSearcher(idx)
    out = s.boxplot_agg(Q, value_col="n_chars", min_score=MS)
    v = _match_vals(s)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["v_min"] == float(v.min())
    assert row["v_max"] == float(v.max())
    for c, q in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
        assert row[c] == float(_qdisc_brute(v, q))
    assert row["q1"] < row["q3"]        # non-degenerate quartiles


def test_t_test_agg_welch_brute_force(idx):
    s = IndexSearcher(idx)
    fa = {"term": {"lang": "en"}}
    fb = {"terms": {"lang": ["fr", "es"]}}
    out = s.t_test_agg(Q, value_col="n_chars", filter_a=fa, filter_b=fb,
                       min_score=MS)
    hit = s.search(Q, min_score=MS)
    base = _corpus().to_pandas()
    m = base[base["doc_id"].isin(hit["doc_id"])]
    va = m[m["lang"] == "en"]["n_chars"].to_numpy(dtype=np.float64)
    vb = m[m["lang"].isin(["fr", "es"])]["n_chars"] \
        .to_numpy(dtype=np.float64)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_a"] == len(va) and row["n_b"] == len(vb)
    # Welch t (numpy ddof=1 variance) — the engine's pinned chain must
    # agree to float tolerance (exact bit-identity is vs the SQL twin)
    t = ((va.mean() - vb.mean())
         / math.sqrt(va.var(ddof=1) / len(va)
                     + vb.var(ddof=1) / len(vb)))
    assert row["t_value"] == pytest.approx(t, rel=1e-12)


def test_t_test_small_side_drops_row(idx):
    s = IndexSearcher(idx)
    # filter_b matches nothing -> n_b == 0 -> the query's row drops
    out = s.t_test_agg(Q, value_col="n_chars",
                       filter_a={"term": {"lang": "en"}},
                       filter_b={"term": {"lang": "xx"}}, min_score=MS)
    assert out.empty and list(out.columns) == [
        "query_id", "n_a", "n_b", "avg_a", "avg_b", "t_value"]


def _dh(s: IndexSearcher, **kw) -> pd.DataFrame:
    return s.date_histogram_agg(Q, ts_col="ts", calendar_interval="hour",
                                min_score=MS, **kw)


def test_bucket_sort_rank_and_truncate(idx):
    s = IndexSearcher(idx)
    base = _dh(s)
    out = _dh(s, pipeline="bucket_sort", sort_from=1, sort_size=3)
    exp = base.sort_values(["doc_count", "bucket"],
                           ascending=[False, True], kind="mergesort")
    exp = exp.iloc[1:4].reset_index(drop=True)
    assert list(out["bucket"]) == list(exp["bucket"])
    assert list(out["doc_count"]) == list(exp["doc_count"])
    assert list(out["sort_rank"]) == [2, 3, 4]


def test_moving_percentiles_window_median(idx):
    s = IndexSearcher(idx)
    base = _dh(s)
    out = _dh(s, pipeline="moving_percentiles", pipeline_window=3,
              pipeline_percent=0.5)
    cnts = base["doc_count"].to_numpy()
    exp = [float(_qdisc_brute(cnts[max(0, i - 2):i + 1], 0.5))
           for i in range(len(cnts))]
    assert list(out["moving_percentiles"]) == exp
    # partial windows (first two buckets) exercise min_periods
    assert out["moving_percentiles"].iloc[0] == float(cnts[0])


def test_rate_agg_unit_division(idx):
    s = IndexSearcher(idx)
    base = _dh(s)
    out = _dh(s, pipeline="rate", rate_unit="minute")
    assert np.array_equal(out["rate"].to_numpy(),
                          base["doc_count"].to_numpy() / 60.0)
    with pytest.raises(ValueError):
        _dh(s, pipeline="rate", rate_unit="day")   # upscale rejected


def test_dsl_round_trip_new_aggs(idx):
    s = IndexSearcher(idx)
    pd.testing.assert_frame_equal(
        execute_query({"mad": {"query": Q["q"], "field": "n_chars",
                               "min_score": MS}}, searcher=s),
        s.mad_agg({"q": Q["q"]}, value_col="n_chars", min_score=MS))
    pd.testing.assert_frame_equal(
        execute_query({"boxplot": {"query": Q["q"], "field": "n_chars",
                                   "min_score": MS}}, searcher=s),
        s.boxplot_agg({"q": Q["q"]}, value_col="n_chars", min_score=MS))
    fa = {"term": {"lang": "en"}}
    fb = {"term": {"lang": "de"}}
    pd.testing.assert_frame_equal(
        execute_query({"t_test": {"query": Q["q"], "field": "n_chars",
                                  "min_score": MS, "filter_a": fa,
                                  "filter_b": fb}}, searcher=s),
        s.t_test_agg({"q": Q["q"]}, value_col="n_chars", filter_a=fa,
                     filter_b=fb, min_score=MS))
    pd.testing.assert_frame_equal(
        execute_query({"date_histogram": {
            "query": Q["q"], "field": "ts", "min_score": MS,
            "calendar_interval": "hour", "pipeline": "bucket_sort",
            "sort_from": 1, "sort_size": 3}}, searcher=s),
        _dh(s, pipeline="bucket_sort", sort_from=1, sort_size=3))


def test_warm_facade_round12_frame_identity(idx):
    pytest.importorskip("ray")
    from opensearch_jvector_ray.serve import SearchService
    svc = SearchService(idx, num_shards=2)
    try:
        a = svc.agg
        s = IndexSearcher(idx)
        pd.testing.assert_frame_equal(
            a.mad_agg(Q, value_col="n_chars", min_score=MS),
            s.mad_agg(Q, value_col="n_chars", min_score=MS))
        pd.testing.assert_frame_equal(
            a.boxplot_agg(Q, value_col="n_chars", min_score=MS),
            s.boxplot_agg(Q, value_col="n_chars", min_score=MS))
        fa = {"term": {"lang": "en"}}
        fb = {"terms": {"lang": ["fr", "es"]}}
        pd.testing.assert_frame_equal(
            a.t_test_agg(Q, value_col="n_chars", filter_a=fa,
                         filter_b=fb, min_score=MS),
            s.t_test_agg(Q, value_col="n_chars", filter_a=fa,
                         filter_b=fb, min_score=MS))
        pd.testing.assert_frame_equal(
            a.date_histogram_agg(Q, ts_col="ts",
                                 calendar_interval="hour", min_score=MS,
                                 pipeline="moving_percentiles",
                                 pipeline_window=3),
            s.date_histogram_agg(Q, ts_col="ts",
                                 calendar_interval="hour", min_score=MS,
                                 pipeline="moving_percentiles",
                                 pipeline_window=3))
    finally:
        svc.shutdown()
