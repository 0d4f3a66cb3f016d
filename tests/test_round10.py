"""Round-4 aggregation completions: multi_terms / rare_terms /
extended_stats / weighted_avg bucket aggs + the sibling pipeline
(bucket-metric) family and the bucket_script pipeline.  Brute-force
containment oracles on a purpose-built corpus; hard DuckDB gates live
in the driver entries (bm25_multi_terms .. bm25_bucket_script)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

TEXTS = ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
         "gamma delta", "alpha", "beta", "delta eps", "alpha delta",
         "beta delta"] * 4
N = len(TEXTS)
LANGS = [("en", "de", "fr", None)[i % 4] for i in range(N)]
SOURCES = [f"s{i % 7}" for i in range(N)]
NCHARS = [len(t) * (1 + i % 3) for i, t in enumerate(TEXTS)]
TS = [((i * 7) % N) * 900_000_000 for i in range(N)]  # spans hours


def _corpus() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
        "lang": pa.array(LANGS, type=pa.string()),
        "source": pa.array(SOURCES, type=pa.string()),
        "n_chars": pa.array(NCHARS, type=pa.int64()),
        "ts": pa.array(TS, type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r10") / "idx")
    build_index(rd.from_arrow(_corpus()), out,
                EngineConfig(num_segments=3),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("lang", "source", "n_chars", "ts"),
                          ts_col=""))
    return out


MS = 1e-9
Q = {"q": "alpha delta"}


def _match_df(s: IndexSearcher) -> pd.DataFrame:
    hit = s.search(Q, min_score=MS)
    base = _corpus().to_pandas()
    return base[base["doc_id"].isin(hit["doc_id"])]


def test_multi_terms_composite_counts(idx):
    s = IndexSearcher(idx)
    out = s.multi_terms_agg(Q, fields=["lang", "source"], min_score=MS)
    m = _match_df(s).dropna(subset=["lang", "source"])
    want = (m.groupby(["lang", "source"]).size().rename("doc_count")
             .reset_index())
    got = out[["lang", "source", "doc_count"]].sort_values(
        ["lang", "source"]).reset_index(drop=True)
    want = want.sort_values(["lang", "source"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False)
    # null in ANY key field drops the doc (terms-family missing rule)
    assert not out["lang"].isna().any()
    # order: doc_count DESC then values ASC
    for _, g in out.groupby("query_id"):
        dc = list(g["doc_count"])
        assert dc == sorted(dc, reverse=True)
    # size cap keeps the TOP buckets of that order
    capped = s.multi_terms_agg(Q, fields=["lang", "source"],
                               min_score=MS, size=3)
    pd.testing.assert_frame_equal(
        capped.reset_index(drop=True),
        out.groupby("query_id").head(3).reset_index(drop=True))
    with pytest.raises(ValueError, match="at least 2"):
        s.multi_terms_agg(Q, fields=["lang"], min_score=MS)


def test_rare_terms_global_threshold(idx):
    s = IndexSearcher(idx)
    m = _match_df(s)
    counts = m.groupby("source").size()
    thr = int(counts.median())
    out = s.rare_terms_agg(Q, field="source", max_doc_count=thr,
                           min_score=MS)
    want = set(counts[counts <= thr].index)
    assert set(out["source"]) == want
    # the threshold applies to the GLOBAL merged count: a value whose
    # total exceeds thr is excluded even though each of the 3 segments
    # holds fewer than thr of it locally
    over = counts[counts > thr]
    if len(over):
        assert not (set(out["source"]) & set(over.index))
    # order: doc_count ASC, value ASC
    dc = list(out["doc_count"])
    assert dc == sorted(dc)
    with pytest.raises(ValueError, match="max_doc_count"):
        s.rare_terms_agg(Q, field="source", max_doc_count=0, min_score=MS)


def test_extended_stats_pinned_chain(idx):
    s = IndexSearcher(idx)
    out = s.extended_stats_agg(Q, value_col="n_chars", min_score=MS,
                               sigma=2.0)
    v = _match_df(s)["n_chars"].to_numpy(np.int64)
    n = float(len(v))
    assert int(out["doc_count"][0]) == len(v)
    assert int(out["v_sum"][0]) == int(v.sum())
    assert int(out["v_sos"][0]) == int(np.dot(v, v))
    avg = float(v.sum()) / n
    var = float(np.dot(v, v)) / n - avg * avg
    # bit-exact: the engine must apply EXACTLY this op chain
    assert out["v_avg"][0] == avg
    assert out["v_variance"][0] == var
    assert out["v_std"][0] == np.sqrt(var)
    assert out["std_upper"][0] == avg + 2.0 * np.sqrt(var)
    assert out["std_lower"][0] == avg - 2.0 * np.sqrt(var)


def test_weighted_avg_single_division(idx):
    s = IndexSearcher(idx)
    out = s.weighted_avg_agg(Q, value_col="n_chars", weight_col="doc_id",
                             min_score=MS)
    m = _match_df(s)
    v = m["n_chars"].to_numpy(np.int64)
    w = m["doc_id"].to_numpy(np.int64)
    assert int(out["w_sum"][0]) == int(w.sum())
    assert out["weighted_avg"][0] == float(np.dot(v, w)) / float(w.sum())


def test_bucket_metric_family(idx):
    s = IndexSearcher(idx)
    base = s.date_histogram_agg(Q, ts_col="ts", calendar_interval="hour",
                                min_score=MS)
    dc = base["doc_count"]
    sb = s.bucket_metric_agg(Q, ts_col="ts", calendar_interval="hour",
                             metric="sum_bucket", min_score=MS)
    assert int(sb["value"][0]) == int(dc.sum())
    ab = s.bucket_metric_agg(Q, ts_col="ts", calendar_interval="hour",
                             metric="avg_bucket", min_score=MS)
    assert ab["value"][0] == float(dc.sum()) / float(len(dc))
    st = s.bucket_metric_agg(Q, ts_col="ts", calendar_interval="hour",
                             metric="stats_bucket", min_score=MS)
    assert (int(st["bucket_count"][0]), int(st["v_min"][0]),
            int(st["v_max"][0]), int(st["v_sum"][0])) == \
        (len(dc), int(dc.min()), int(dc.max()), int(dc.sum()))
    assert st["v_avg"][0] == float(dc.sum()) / float(len(dc))
    # min/max_bucket: value + the SMALLEST bucket ts among the extremes
    mx = s.bucket_metric_agg(Q, ts_col="ts", calendar_interval="hour",
                             metric="max_bucket", min_score=MS)
    assert int(mx["value"][0]) == int(dc.max())
    assert mx["bucket_key"][0] == \
        base[base["doc_count"] == dc.max()]["bucket"].min()
    mn = s.bucket_metric_agg(Q, ts_col="ts", calendar_interval="hour",
                             metric="min_bucket", min_score=MS)
    assert int(mn["value"][0]) == int(dc.min())
    assert mn["bucket_key"][0] == \
        base[base["doc_count"] == dc.min()]["bucket"].min()
    with pytest.raises(ValueError, match="metric"):
        s.bucket_metric_agg(Q, ts_col="ts", calendar_interval="hour",
                            metric="median_bucket", min_score=MS)


ADJ_FILTERS = {
    "en": {"term": {"lang": "en"}},
    "longish": {"range": {"n_chars": {"gte": 15}}},
    "s0": {"term": {"source": "s0"}},
}


def test_adjacency_matrix_counts(idx):
    s = IndexSearcher(idx)
    out = s.adjacency_matrix_agg(Q, ADJ_FILTERS, min_score=MS)
    m = _match_df(s)
    masks = {
        "en": (m["lang"] == "en").fillna(False),
        "longish": m["n_chars"] >= 15,
        "s0": m["source"] == "s0",
    }
    names = sorted(masks)
    want = {}
    for i, a in enumerate(names):
        if int(masks[a].sum()):
            want[a] = int(masks[a].sum())
        for b in names[i + 1:]:
            c = int((masks[a] & masks[b]).sum())
            if c:
                want[f"{a}&{b}"] = c
    got = dict(zip(out["filter_key"], out["doc_count"]))
    assert got == want
    # empty buckets are omitted, order is key-asc
    assert list(out["filter_key"]) == sorted(out["filter_key"])
    with pytest.raises(ValueError, match="non-empty"):
        s.adjacency_matrix_agg(Q, {}, min_score=MS)
    with pytest.raises(ValueError, match="&"):
        s.adjacency_matrix_agg(Q, {"a&b": {"term": {"lang": "en"}}},
                               min_score=MS)


def test_string_stats_lengths_and_entropy(idx):
    import math
    s = IndexSearcher(idx)
    # lang carries nulls (every 4th doc) — they must be excluded
    out = s.string_stats_agg(Q, field="lang", min_score=MS)
    vals = _match_df(s)["lang"].dropna()
    lens = vals.str.len()
    assert int(out["doc_count"][0]) == len(vals)
    assert int(out["len_min"][0]) == int(lens.min())
    assert int(out["len_max"][0]) == int(lens.max())
    assert int(out["len_sum"][0]) == int(lens.sum())
    assert out["avg_length"][0] == float(lens.sum()) / float(len(vals))
    # entropy: sequential -p*log2(p) over char-codepoint-ASC order
    from collections import Counter
    cc = Counter("".join(vals))
    total = float(sum(cc.values()))
    ent = 0.0
    for ch in sorted(cc):
        p = float(cc[ch]) / total
        ent -= p * math.log2(p)
    assert out["entropy"][0] == ent


def test_string_stats_all_null_match_set_emits_no_row(tmp_path):
    # the pinned cross-side rule: a query whose whole match set is
    # NULL-valued produces NO row (oracle: HAVING count(field) > 0)
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["onlyhere x", "onlyhere y", "other z"],
        "lang": pa.array([None, None, "en"], type=pa.string()),
    })
    out_dir = str(tmp_path / "nullidx")
    build_index(rd.from_arrow(tbl), out_dir, EngineConfig(num_segments=2),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("lang",), ts_col=""))
    s = IndexSearcher(out_dir)
    out = s.string_stats_agg({"qn": "onlyhere", "qe": "other"},
                             field="lang", min_score=MS)
    # 'onlyhere' matches docs 0,1 (lang NULL both) -> no row;
    # 'other' matches doc 2 -> one row
    assert list(out["query_id"]) == ["qe"]
    assert int(out["doc_count"][0]) == 1


def test_multi_terms_rejects_duplicate_fields(idx):
    from opensearch_jvector_ray.query_dsl import parse_query
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="unique"):
        s.multi_terms_agg(Q, fields=["lang", "lang"], min_score=MS)
    with pytest.raises(ValueError, match="UNIQUE"):
        parse_query({"multi_terms": {"query": "a",
                                     "fields": ["lang", "lang"],
                                     "min_score": MS}})


def test_matrix_stats_pinned_chain(idx):
    s = IndexSearcher(idx)
    out = s.matrix_stats_agg(Q, x_col="n_chars", y_col="doc_id",
                             min_score=MS)
    m = _match_df(s)
    x = m["n_chars"].to_numpy(np.int64)
    y = m["doc_id"].to_numpy(np.int64)
    n = float(len(x))
    mx = float(x.sum()) / n
    my = float(y.sum()) / n
    vx = float(np.dot(x, x)) / n - mx * mx
    vy = float(np.dot(y, y)) / n - my * my
    cov = float(np.dot(x, y)) / n - mx * my
    assert int(out["doc_count"][0]) == len(x)
    assert out["x_mean"][0] == mx and out["y_mean"][0] == my
    assert out["x_variance"][0] == vx and out["y_variance"][0] == vy
    assert out["covariance"][0] == cov
    assert out["correlation"][0] == cov / (np.sqrt(vx) * np.sqrt(vy))
    # sanity: correlation is a correlation
    assert -1.0 - 1e-9 <= out["correlation"][0] <= 1.0 + 1e-9


def test_date_range_zero_filled_grid(idx):
    s = IndexSearcher(idx)
    ranges = [("early", None, "1970-01-01T03:00:00"),
              ("mid", "1970-01-01T03:00:00", "1970-01-01T07:00:00"),
              ("late", "1970-01-01T07:00:00", None),
              ("never", "2099-01-01T00:00:00", None)]
    out = s.date_range_agg(Q, ts_col="ts", ranges=ranges, min_score=MS)
    m = _match_df(s)
    ts = pd.to_datetime(m["ts"])
    bounds = {
        "early": ts < pd.Timestamp("1970-01-01T03:00:00"),
        "mid": (ts >= pd.Timestamp("1970-01-01T03:00:00"))
               & (ts < pd.Timestamp("1970-01-01T07:00:00")),
        "late": ts >= pd.Timestamp("1970-01-01T07:00:00"),
        "never": ts >= pd.Timestamp("2099-01-01T00:00:00"),
    }
    got = dict(zip(out["range_key"], out["doc_count"]))
    for k, msk in bounds.items():
        assert got[k] == int(msk.sum()), k
    # zero-filled: the impossible range still appears
    assert got["never"] == 0
    assert len(out) == len(ranges)     # one query x 4 ranges
    with pytest.raises(ValueError, match="unique"):
        s.date_range_agg(Q, ts_col="ts",
                         ranges=[("a", None, None), ("a", None, None)],
                         min_score=MS)


def test_chunk_documents_windows(tmp_path):
    from opensearch_jvector_ray.pipelines.corpus import chunk_documents
    toks = [f"t{i}" for i in range(11)]
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": [" ".join(toks), "a  b\tc", "", "solo"],
    })
    out = chunk_documents(rd.from_arrow(tbl), "doc_id", "text",
                          chunk_tokens=4, overlap=1).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # doc 0: 11 tokens, C=4, S=3 -> chunks start 0,3,6,9 (tail len 2)
    d0 = out[out["doc_id"] == 0]
    assert list(d0["chunk_idx"]) == [0, 1, 2, 3]
    assert list(d0["n_tokens"]) == [4, 4, 4, 2]
    assert list(d0["chunk_text"]) == ["t0 t1 t2 t3", "t3 t4 t5 t6",
                                      "t6 t7 t8 t9", "t9 t10"]
    # overlap continuity: each chunk starts with the previous one's tail
    for a, b in zip(list(d0["chunk_text"]), list(d0["chunk_text"])[1:]):
        assert a.split()[-1] == b.split()[0]
    # multi-whitespace collapses; empty doc emits nothing; short doc = 1
    assert list(out[out["doc_id"] == 1]["chunk_text"]) == ["a b c"]
    assert not len(out[out["doc_id"] == 2])
    assert list(out[out["doc_id"] == 3]["chunk_text"]) == ["solo"]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_arrow(tbl), "doc_id", "text",
                        chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(rd.from_arrow(tbl), "doc_id", "text",
                        chunk_tokens=0, overlap=0)


def test_extract_keywords_tfidf_rule(idx):
    from opensearch_jvector_ray.pipelines.textstats import extract_keywords
    from opensearch_jvector_ray.functions.scoring import bm25_idf
    cfg = EngineConfig(num_segments=3)
    ds = rd.from_arrow(_corpus().select(["doc_id", "text"]))
    out = extract_keywords(ds, idx, cfg, "doc_id", "text",
                           k=2).to_pandas() \
        .sort_values(["doc_id", "kw_rank"]).reset_index(drop=True)
    # brute-force: per doc, top-2 (tf * idf DESC, term ASC)
    from collections import Counter
    n = float(N)
    df = Counter()
    docs_terms = []
    for t in TEXTS:
        terms = t.split()
        docs_terms.append(Counter(terms))
        df.update(set(terms))
    for d, tf in enumerate(docs_terms):
        scored = sorted(
            ((-tf[w] * bm25_idf(n, float(df[w])), w) for w in tf))
        want = [w for _, w in scored[:2]]
        got = list(out[out["doc_id"] == d]["term"])
        assert got == want, (d, got, want)
    # rank column is 1..k per doc
    assert set(out["kw_rank"]) <= {1, 2}
    with pytest.raises(ValueError, match="k must"):
        extract_keywords(ds, idx, cfg, "doc_id", "text", k=0)


def test_percentile_ranks_exact(idx):
    from opensearch_jvector_ray.query_dsl import execute_query
    from opensearch_jvector_ray.serve import SearchService
    s = IndexSearcher(idx)
    vals = [10.0, 20.0, 100.0]
    out = s.percentile_ranks_agg(Q, value_col="n_chars", values=vals,
                                 min_score=MS)
    m = _match_df(s)["n_chars"].to_numpy(np.int64)
    for v in vals:
        got = float(out[(out["value"] == v)]["pct_rank"].iloc[0])
        assert got == float(int((m <= v).sum())) / float(len(m))
    # a probe below every value ranks 0, above every value ranks 1
    lo_hi = s.percentile_ranks_agg(Q, value_col="n_chars",
                                   values=[-1.0, 1e9], min_score=MS)
    assert float(lo_hi["pct_rank"].iloc[0]) == 0.0
    assert float(lo_hi["pct_rank"].iloc[1]) == 1.0
    with pytest.raises(ValueError, match="unique"):
        s.percentile_ranks_agg(Q, value_col="n_chars",
                               values=[1.0, 1.0], min_score=MS)
    body = {"percentile_ranks": {"query": Q["q"], "field": "n_chars",
                                 "values": vals, "min_score": MS}}
    got = execute_query(body, searcher=s)
    pd.testing.assert_frame_equal(got, out)
    svc = SearchService(idx, num_shards=2)
    try:
        warm = svc.agg.percentile_ranks_agg(
            Q, value_col="n_chars", values=vals, min_score=MS)
        pd.testing.assert_frame_equal(warm, out)
    finally:
        svc.shutdown()


def test_percentile_ranks_all_null_match_set(tmp_path):
    # regression: an all-NULL match set used to raise IndexError on the
    # engine and emit a row on the oracle; the pinned rule is NO row
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": ["onlyhere a", "onlyhere b", "other c", "other d"],
        "nval": pa.array([None, None, 7, 9], type=pa.int64()),
    })
    out_dir = str(tmp_path / "prnull")
    build_index(rd.from_arrow(tbl), out_dir, EngineConfig(num_segments=2),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("nval",), ts_col=""))
    s = IndexSearcher(out_dir)
    out = s.percentile_ranks_agg({"qn": "onlyhere", "qe": "other"},
                                 value_col="nval", values=[8.0],
                                 min_score=MS)
    # 'onlyhere' matches only NULL-valued docs -> no row; 'other' has
    # values [7, 9] -> rank(8) = 1/2 over the NON-NULL count
    assert list(out["query_id"]) == ["qe"]
    assert float(out["pct_rank"].iloc[0]) == 0.5


def test_top_metrics_order_and_bounds(idx):
    from opensearch_jvector_ray.query_dsl import execute_query
    from opensearch_jvector_ray.serve import SearchService
    s = IndexSearcher(idx)
    out = s.top_metrics_agg(Q, sort_col="n_chars",
                            metric_cols=["source"], min_score=MS,
                            size=4, sort_order="desc")
    m = _match_df(s).sort_values(["n_chars", "doc_id"],
                                 ascending=[False, True]).head(4)
    assert list(out["doc_id"]) == list(m["doc_id"])
    assert list(out["source"]) == list(m["source"])
    assert list(out["rank"]) == [1, 2, 3, 4]
    asc = s.top_metrics_agg(Q, sort_col="n_chars",
                            metric_cols=["source"], min_score=MS,
                            size=2, sort_order="asc")
    ma = _match_df(s).sort_values(["n_chars", "doc_id"]).head(2)
    assert list(asc["doc_id"]) == list(ma["doc_id"])
    with pytest.raises(ValueError, match="sort_order"):
        s.top_metrics_agg(Q, sort_col="n_chars", metric_cols=["source"],
                          min_score=MS, sort_order="down")
    with pytest.raises(ValueError, match="unique"):
        s.top_metrics_agg(Q, sort_col="n_chars",
                          metric_cols=["n_chars"], min_score=MS)
    # DSL + warm facade identity
    body = {"top_metrics": {"query": Q["q"], "sort_field": "n_chars",
                            "metrics": ["source"], "size": 4,
                            "sort_order": "desc", "min_score": MS}}
    got = execute_query(body, searcher=s)
    pd.testing.assert_frame_equal(got, out)
    svc = SearchService(idx, num_shards=2)
    try:
        warm = svc.agg.top_metrics_agg(
            Q, sort_col="n_chars", metric_cols=["source"],
            min_score=MS, size=4, sort_order="desc")
        pd.testing.assert_frame_equal(warm, out)
    finally:
        svc.shutdown()


def test_round10_dsl_and_warm_facade(idx):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    from opensearch_jvector_ray.serve import SearchService
    s = IndexSearcher(idx)
    qtext = Q["q"]
    ranges = [["early", None, "1970-01-01T05:00:00"],
              ["late", "1970-01-01T05:00:00", None]]
    bodies = [
        ({"adjacency_matrix": {"query": qtext, "filters": ADJ_FILTERS,
                               "min_score": MS}},
         lambda t: t.adjacency_matrix_agg({"q": qtext}, ADJ_FILTERS,
                                          min_score=MS)),
        ({"string_stats": {"query": qtext, "field": "source",
                           "min_score": MS}},
         lambda t: t.string_stats_agg({"q": qtext}, field="source",
                                      min_score=MS)),
        ({"matrix_stats": {"query": qtext,
                           "fields": ["n_chars", "doc_id"],
                           "min_score": MS}},
         lambda t: t.matrix_stats_agg({"q": qtext}, x_col="n_chars",
                                      y_col="doc_id", min_score=MS)),
        ({"date_range": {"query": qtext, "field": "ts",
                         "ranges": ranges, "min_score": MS}},
         lambda t: t.date_range_agg(
             {"q": qtext}, ts_col="ts",
             ranges=[tuple(r) for r in ranges], min_score=MS)),
    ]
    svc = SearchService(idx, num_shards=2)
    try:
        for body, call in bodies:
            want = call(s)
            got = execute_query(body, searcher=s)
            pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                          want.reset_index(drop=True))
            warm = call(svc.agg)
            pd.testing.assert_frame_equal(warm.reset_index(drop=True),
                                          want.reset_index(drop=True))
    finally:
        svc.shutdown()
    with pytest.raises(ValueError, match="fields"):
        parse_query({"matrix_stats": {"query": "a",
                                      "fields": ["one"],
                                      "min_score": MS}})
    with pytest.raises(ValueError, match="ranges"):
        parse_query({"date_range": {"query": "a", "field": "ts",
                                    "min_score": MS}})
    with pytest.raises(ValueError, match="filters"):
        parse_query({"adjacency_matrix": {"query": "a",
                                          "min_score": MS}})


def test_new_agg_dsl_equivalence(idx):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    s = IndexSearcher(idx)
    qtext = Q["q"]
    cases = [
        ({"multi_terms": {"query": qtext, "fields": ["lang", "source"],
                          "min_score": MS, "size": 5}},
         s.multi_terms_agg({"q": qtext}, fields=["lang", "source"],
                           min_score=MS, size=5)),
        ({"rare_terms": {"query": qtext, "field": "source",
                         "max_doc_count": 3, "min_score": MS}},
         s.rare_terms_agg({"q": qtext}, field="source",
                          max_doc_count=3, min_score=MS)),
        ({"extended_stats": {"query": qtext, "field": "n_chars",
                             "min_score": MS, "sigma": 1.5}},
         s.extended_stats_agg({"q": qtext}, value_col="n_chars",
                              min_score=MS, sigma=1.5)),
        ({"weighted_avg": {"query": qtext, "field": "n_chars",
                           "weight_field": "doc_id", "min_score": MS}},
         s.weighted_avg_agg({"q": qtext}, value_col="n_chars",
                            weight_col="doc_id", min_score=MS)),
        ({"bucket_metric": {"query": qtext, "field": "ts",
                            "calendar_interval": "hour",
                            "metric": "stats_bucket", "min_score": MS}},
         s.bucket_metric_agg({"q": qtext}, ts_col="ts",
                             calendar_interval="hour",
                             metric="stats_bucket", min_score=MS)),
        ({"date_histogram": {"query": qtext, "field": "ts",
                             "calendar_interval": "hour",
                             "min_score": MS,
                             "pipeline": "bucket_script"}},
         s.date_histogram_agg({"q": qtext}, ts_col="ts",
                              calendar_interval="hour", min_score=MS,
                              pipeline="bucket_script")),
    ]
    for body, want in cases:
        got = execute_query(body, searcher=s)
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True))
    # strict validation: unknown fields / bad shapes rejected at parse
    with pytest.raises(ValueError, match="fields"):
        parse_query({"multi_terms": {"query": "a", "fields": ["lang"],
                                     "min_score": MS}})
    with pytest.raises(ValueError, match="max_doc_count"):
        parse_query({"rare_terms": {"query": "a", "field": "source",
                                    "min_score": MS}})
    with pytest.raises(ValueError, match="weight_field"):
        parse_query({"weighted_avg": {"query": "a", "field": "n_chars",
                                      "min_score": MS}})
    with pytest.raises(ValueError, match="metric"):
        parse_query({"bucket_metric": {"query": "a", "field": "ts",
                                       "calendar_interval": "hour",
                                       "metric": "median_bucket",
                                       "min_score": MS}})
    with pytest.raises(ValueError, match="does not support"):
        parse_query({"extended_stats": {"query": "a", "field": "x",
                                        "min_score": MS, "bogus": 1}})


def test_match_bool_prefix(idx):
    from opensearch_jvector_ray.analyze import mbp_rewrite
    s = IndexSearcher(idx)
    # rewrite rule: star the LAST chunk only
    assert mbp_rewrite("alpha ga") == "alpha ga*"
    assert mbp_rewrite("alpha ga*") == "alpha ga*"
    assert mbp_rewrite("") == ""
    out = s.match_bool_prefix({"q": "alpha ga"}, k=20)
    want = s.prefix_search({"q": "alpha ga*"}, k=20)
    pd.testing.assert_frame_equal(out, want)
    # the prefix expands: docs matching only 'gamma' (no alpha) are hits
    ids = set(out["doc_id"])
    gamma_only = [i for i, t in enumerate(TEXTS)
                  if "gamma" in t and "alpha" not in t]
    assert ids & set(gamma_only)
    # DSL
    from opensearch_jvector_ray.query_dsl import execute_query
    got = execute_query({"match_bool_prefix": {"query": "alpha ga",
                                               "k": 20}}, searcher=s)
    pd.testing.assert_frame_equal(got, out)


def test_dis_max_combines_subqueries(idx):
    s = IndexSearcher(idx)
    subs = ["alpha beta", "gamma delta"]
    tie = 0.3
    out = s.dis_max({"q": subs}, k=40, tie_breaker=tie)
    # brute force: radial score per subquery, combine per doc
    per = []
    for t in subs:
        h = s.search({"q": t}, min_score=1e-300)
        per.append(dict(zip(h["doc_id"], h["score"])))
    ids = sorted(set().union(*[set(p) for p in per]))
    rows = []
    for d in ids:
        ss = [p.get(d, 0.0) for p in per]
        best = max(ss)
        total = ss[0]
        for v in ss[1:]:
            total = total + v
        rows.append((d, best + tie * (total - best)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    want_ids = [d for d, _ in rows[:40]]
    assert list(out["doc_id"]) == want_ids
    for (d, sc), got_sc in zip(rows[:40], out["score"]):
        assert abs(sc - got_sc) < 1e-9
    # tie_breaker=1.0 degenerates to the plain sum of subqueries
    full = s.dis_max({"q": subs}, k=40, tie_breaker=1.0)
    plain = s.search({"q": "alpha beta gamma delta"}, k=40)
    assert list(full["doc_id"]) == list(plain["doc_id"])
    # validation
    with pytest.raises(ValueError, match="tie_breaker"):
        s.dis_max({"q": subs}, tie_breaker=1.5)
    with pytest.raises(ValueError, match="non-empty"):
        s.dis_max({"q": []})
    with pytest.raises(ValueError, match="at most 8"):
        s.dis_max({"q": ["a"] * 9})
    # DSL
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    got = execute_query({"dis_max": {"queries": subs, "k": 40,
                                     "tie_breaker": tie}}, searcher=s)
    pd.testing.assert_frame_equal(got, out)
    with pytest.raises(ValueError, match="queries"):
        parse_query({"dis_max": {"queries": [], "k": 5}})


def test_span_first(idx):
    s = IndexSearcher(idx)
    # degenerate identity: end >= every doc length == the plain match
    wide = s.search({"q": "alpha delta"}, k=40, mode="span_first",
                    span_end=100)
    plain = s.search({"q": "alpha delta"}, k=40)
    pd.testing.assert_frame_equal(wide, plain)
    # end=1: only docs whose FIRST token is a query term match
    first = s.search({"q": "alpha delta"}, k=40, mode="span_first",
                     span_end=1)
    ids = set(first["doc_id"])
    want = {i for i, t in enumerate(TEXTS)
            if t.split()[0] in ("alpha", "delta")}
    assert ids == want
    # tighter window can only shrink the match set
    assert ids <= set(plain["doc_id"]) | set(
        i for i, t in enumerate(TEXTS)
        if "alpha" in t or "delta" in t)
    # validation: span_end required by (and only by) span_first
    with pytest.raises(ValueError, match="span_end"):
        s.search({"q": "alpha"}, mode="span_first")
    with pytest.raises(ValueError, match="span_end"):
        s.search({"q": "alpha"}, span_end=3)
    with pytest.raises(ValueError, match="span_end"):
        s.search({"q": "alpha"}, mode="span_first", span_end=0)
    # DSL
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    got = execute_query({"span_first": {"query": "alpha delta",
                                        "end": 1, "k": 40}}, searcher=s)
    pd.testing.assert_frame_equal(got, first)
    with pytest.raises(ValueError, match="end"):
        parse_query({"span_first": {"query": "a"}})


def test_bucket_script_percent_of_total(idx):
    s = IndexSearcher(idx)
    base = s.date_histogram_agg(Q, ts_col="ts", calendar_interval="hour",
                                min_score=MS)
    out = s.date_histogram_agg(Q, ts_col="ts", calendar_interval="hour",
                               min_score=MS, pipeline="bucket_script")
    tot = float(base["doc_count"].sum())
    want = [float(c) / tot for c in base["doc_count"]]
    assert out["bucket_script"].dtype == np.float64
    assert list(out["bucket_script"]) == want
    assert abs(out["bucket_script"].sum() - 1.0) < 1e-12
