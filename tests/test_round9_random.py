"""Seeded randomized property tests for the round-3-continuation query
surface (span_near, sort-by-field, function_score, structured filters,
has_child, composite paging, percolate, constant_score/boosting,
rank_eval) — every check against an obviously-correct pandas/numpy
reference over one random corpus.  Edge cases on purpose: empty docs,
duplicated sort keys, stopword-only docs, zero-match queries."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.query_dsl import compile_filter
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

SEED = 1234
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "and",
         "kappa", "mu"]
N = 150


def _mk_corpus():
    rng = np.random.default_rng(SEED)
    texts, roles, tss = [], [], []
    for i in range(N):
        L = int(rng.integers(0, 13))           # includes empty docs
        texts.append(" ".join(rng.choice(VOCAB, size=L)))
        roles.append(("user", "assistant", "tool")[int(rng.integers(3))])
        tss.append(int(rng.integers(0, 40)) * 1000)   # many ts ties
    return pa.table({
        "conv_id": [f"r{i:05d}" for i in range(N)],
        "turn_idx": pa.array([0] * N, type=pa.int32()),
        "role": roles,
        "text": pa.array(texts, type=pa.string()),
        "tool": [""] * N,
        "ts": pa.array(tss, type=pa.timestamp("us")),
    }), texts, roles, tss


CORPUS, TEXTS, ROLES, TSS = _mk_corpus()
CFG = EngineConfig(num_segments=4)
STOP = CFG.stopwords


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r9") / "idx")
    build_index(rd.from_arrow(CORPUS), out, CFG, IndexSpec())
    return out


def _match_ids(s, q):
    out = s.search({"q": q}, min_score=1e-300)
    return {int(c[1:]) for c in out["conv_id"]}, \
        dict(zip((int(c[1:]) for c in out["conv_id"]), out["score"]))


def _brute_span_tf(text, words, slop):
    toks = [t for t in text.lower().split() if t]
    W = len(words) + slop
    return sum(1 for s0 in range(1 - W, len(toks))
               if all(w in toks[max(s0, 0): s0 + W] for w in words))


def test_span_near_random(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 1)
    content = [w for w in VOCAB if w not in STOP]
    for trial in range(8):
        nt = int(rng.integers(2, 4))
        words = list(rng.choice(content, size=nt, replace=False))
        slop = int(rng.integers(0, 5))
        got = s.search({"q": " ".join(words)}, k=N, mode="span",
                       slop=slop)
        want = sorted(i for i, t in enumerate(TEXTS)
                      if _brute_span_tf(t, words, slop) > 0)
        assert sorted(int(c[1:]) for c in got["conv_id"]) == want, \
            (words, slop)


def test_sort_by_field_random_ties(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 2)
    content = [w for w in VOCAB if w not in STOP]
    for trial in range(6):
        q = " ".join(rng.choice(content,
                                size=int(rng.integers(1, 4)),
                                replace=False))
        order = ("asc", "desc")[int(rng.integers(2))]
        k = int(rng.integers(1, 30))
        got = s.search({"q": q}, k=k, sort=("ts", order))
        ids, _ = _match_ids(s, q)
        ref = sorted(((TSS[i], f"r{i:05d}") for i in ids),
                     key=lambda p: (-p[0] if order == "desc" else p[0],
                                    p[1]))[:k]
        assert list(got["conv_id"]) == [c for _, c in ref], (q, order)


def test_function_score_random(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 3)
    content = [w for w in VOCAB if w not in STOP]
    for trial in range(6):
        q = " ".join(rng.choice(content, size=2, replace=False))
        ids, raw = _match_ids(s, q)
        origin = float(rng.integers(0, 40_000))
        scale = float(rng.integers(1, 5)) * 9000.0
        spec = {"kind": "decay", "decay_fn": "linear", "field": "ts",
                "origin": origin, "scale": scale, "decay": 0.5}
        got = s.search({"q": q}, k=N, score_fn=spec)
        sN = scale / 0.5
        exp = []
        for i in ids:
            dist = max(abs(float(TSS[i]) - origin), 0.0)
            m = max(0.0, (sN - dist) / sN)
            sc = raw[i] * m
            if sc > 0:
                exp.append((-sc, f"r{i:05d}", sc))
        exp.sort()
        assert list(got["conv_id"]) == [c for _, c, _ in exp]
        assert np.allclose(got["score"],
                           [sc for _, _, sc in exp], rtol=0, atol=0)


def test_structured_filters_random(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 4)
    for trial in range(6):
        role = ("user", "assistant", "tool")[int(rng.integers(3))]
        lo = int(rng.integers(0, 30)) * 1000
        spec = {"bool": {
            "must": [{"range": {"ts": {
                "gte": pd.Timestamp(lo, unit="us")}}}],
            "must_not": [{"term": {"role": role}}],
        }}
        got = s.search({"q": "alpha beta gamma delta eps zeta"},
                       k=N, filter=compile_filter(spec))
        ids, _ = _match_ids(s, "alpha beta gamma delta eps zeta")
        want = sorted(i for i in ids
                      if TSS[i] >= lo and ROLES[i] != role)
        assert sorted(int(c[1:]) for c in got["conv_id"]) == want


def test_has_child_random(idx):
    # conv-level parents: re-key corpus by (i // 5)
    rng = np.random.default_rng(SEED + 5)
    tbl = CORPUS.set_column(
        0, "conv_id", pa.array([f"p{i // 5:04d}" for i in range(N)]))
    tbl = tbl.set_column(
        1, "turn_idx", pa.array([i % 5 for i in range(N)],
                                type=pa.int32()))
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out = f"{td}/idx"
        build_index(rd.from_arrow(tbl), out, CFG, IndexSpec())
        s = IndexSearcher(out)
        for mode in ("max", "sum", "avg", "count"):
            got = s.has_child_search({"q": "beta gamma"}, k=100,
                                     score_mode=mode)
            hits = s.search({"q": "beta gamma"}, min_score=1e-300)
            hits = hits.sort_values(["conv_id", "turn_idx"])
            want = {}
            for conv, g in hits.groupby("conv_id"):
                v = g["score"].to_numpy(np.float64)
                m = int(np.floor(v * 1e6).astype(np.int64).sum())
                sc = {"max": round(float(v.max()), 6),
                      "count": float(len(v)),
                      "sum": m / 1e6,
                      "avg": m / (len(v) * 1e6)}[mode]
                want[conv] = sc
            assert dict(zip(got["conv_id"], got["score"])) == want, mode


def test_composite_random_page_sizes(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 6)
    q = {"q": "alpha beta gamma delta eps zeta kappa mu"}
    full = s.composite_agg(q, "role", size=100, min_score=1e-300)
    for trial in range(4):
        size = int(rng.integers(1, 4))
        pages, after = [], None
        while True:
            p = s.composite_agg(q, "role", size=size,
                                min_score=1e-300, after=after)
            if p.empty:
                break
            pages.append(p)
            after = p["role"].iloc[-1]
        pd.testing.assert_frame_equal(
            pd.concat(pages, ignore_index=True), full)


def test_percolate_random(idx):
    from opensearch_jvector_ray.pipelines.percolate import percolate
    rng = np.random.default_rng(SEED + 7)
    ds = rd.from_arrow(CORPUS.select(["conv_id", "text"]))
    content = [w for w in VOCAB if w not in STOP]
    qs = {f"q{j}": " ".join(rng.choice(content,
                                       size=int(rng.integers(1, 4)),
                                       replace=False))
          for j in range(5)}
    terms = {qid: set(t.split()) for qid, t in qs.items()}
    for mode in ("any", "all"):
        out = percolate(ds, qs, CFG, id_col="conv_id",
                        text_col="text", match_mode=mode).to_pandas()
        got = {(r.conv_id, r.query_id) for r in out.itertuples()}
        want = set()
        for i, t in enumerate(TEXTS):
            tk = set(t.split())
            for qid, qt in terms.items():
                hit = bool(tk & qt) if mode == "any" else qt <= tk
                if hit:
                    want.add((f"r{i:05d}", qid))
        assert got == want, mode


def test_boosting_and_constant_random(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 8)
    content = [w for w in VOCAB if w not in STOP]
    for trial in range(5):
        pos = " ".join(rng.choice(content, size=2, replace=False))
        neg = str(rng.choice(content))
        nb = float(rng.integers(1, 10)) / 10.0
        plain = s.search({"q": pos}, k=N)
        got = s.search({"q": pos}, k=N, negative={"q": neg},
                       negative_boost=nb)
        ps = dict(zip(plain["conv_id"], plain["score"]))
        gs = dict(zip(got["conv_id"], got["score"]))
        assert set(ps) == set(gs)
        for c in ps:
            has_neg = neg in TEXTS[int(c[1:])].split()
            assert gs[c] == (ps[c] * nb if has_neg else ps[c]), (pos, neg)
        cs = s.search({"q": pos}, k=7, const_score=2.0)
        ids, _ = _match_ids(s, pos)
        assert list(cs["conv_id"]) == \
            [f"r{i:05d}" for i in sorted(ids)][:7]


def test_rank_eval_random(idx):
    s = IndexSearcher(idx)
    rng = np.random.default_rng(SEED + 9)
    for trial in range(4):
        rated = {f"r{int(i):05d}": int(rng.integers(1, 4))
                 for i in rng.choice(N, size=30, replace=False)}
        q = {"q": "alpha gamma eps"}
        k = int(rng.integers(3, 15))
        hits = s.search(q, k=k)
        rels = [rated.get(c, 0) for c in hits["conv_id"]]
        p = s.rank_eval(q, {"q": rated}, k=k, metric="precision")
        assert p["metric_score"][0] == \
            round(sum(1 for r in rels if r > 0) / k, 6)
        m = s.rank_eval(q, {"q": rated}, k=k, metric="mrr")
        first = next((i + 1 for i, r in enumerate(rels) if r > 0), None)
        assert m["metric_score"][0] == \
            (round(1.0 / first, 6) if first else 0.0)
        nd = s.rank_eval(q, {"q": rated}, k=k, metric="ndcg")
        dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rels))
        ideal = sorted(rated.values(), reverse=True)[:k]
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
        assert nd["metric_score"][0] == round(dcg / idcg, 6)


def test_knn_dsl_structured_filter():
    """knn clause accepts the full filter-context family now (not just
    single-term) — compiled to the same pyarrow pre-filter."""
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    rng = np.random.default_rng(SEED + 10)
    X = rng.normal(size=(80, 8))
    tbl = pa.table({
        "vec_id": pa.array(range(80), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X]),
        "label": pa.array([i % 4 for i in range(80)], type=pa.int32()),
    })
    ds = rd.from_arrow(tbl)
    body = {"knn": {"vector": list(map(float, X[0])), "k": 5,
                    "metric": "cosine",
                    "filter": {"bool": {
                        "must": [{"terms": {"label": [1, 2]}}],
                        "must_not": [{"term": {"vec_id": 13}}]}}}}
    out = execute_query(body, vector_ds=ds)
    assert len(out) == 5
    lab = {i: i % 4 for i in range(80)}
    assert all(lab[v] in (1, 2) and v != 13 for v in out["vec_id"])
    with pytest.raises(ValueError):
        parse_query({"knn": {"vector": [1.0], "filter": {"nope": {}}}})


def test_warm_agg_facade_matches_batch_path(idx):
    """SearchService.agg serves the aggregation family on the warm
    actors; results must be frame-identical to the IndexSearcher batch
    path for every kind."""
    from opensearch_jvector_ray.serve import SearchService
    s = IndexSearcher(idx)
    svc = SearchService(idx, num_shards=2)
    try:
        q = {"a": "alpha gamma", "b": "delta"}
        ms = 1e-9
        cases = [
            ("facet_counts", dict(facet_col="role", min_score=ms)),
            ("stats_agg", dict(value_col="turn_idx", min_score=ms)),
            ("cardinality_agg", dict(field="role", min_score=ms)),
            ("percentiles_agg", dict(value_col="ts",
                                     percents=(0.5, 0.9),
                                     min_score=ms)),
            ("significant_terms_agg", dict(field="role", min_score=ms,
                                           size=3)),
            ("significant_text_agg", dict(min_score=ms, size=5)),
            ("filters_agg", dict(filters={"u": {"term":
                                                {"role": "user"}}},
                                 min_score=ms)),
            ("terms_stats_agg", dict(group_col="role",
                                     value_col="turn_idx",
                                     min_score=ms)),
            ("composite_agg", dict(field="role", size=2,
                                   min_score=ms)),
            ("top_hits_agg", dict(group_col="role", n=2,
                                  min_score=ms)),
            ("multi_terms_agg", dict(fields=["role", "tool"],
                                     min_score=ms, size=4)),
            ("rare_terms_agg", dict(field="role", max_doc_count=8,
                                    min_score=ms)),
            ("extended_stats_agg", dict(value_col="turn_idx",
                                        min_score=ms, sigma=1.5)),
            ("weighted_avg_agg", dict(value_col="turn_idx",
                                      weight_col="turn_idx",
                                      min_score=ms)),
            ("bucket_metric_agg", dict(ts_col="ts",
                                       calendar_interval="hour",
                                       metric="stats_bucket",
                                       min_score=ms)),
            ("bucket_metric_agg", dict(ts_col="ts",
                                       calendar_interval="hour",
                                       metric="max_bucket",
                                       min_score=ms)),
            ("date_histogram_agg", dict(ts_col="ts",
                                        calendar_interval="hour",
                                        min_score=ms,
                                        pipeline="bucket_script")),
        ]
        for name, kw in cases:
            cold = getattr(s, name)(q, **kw)
            warm = getattr(svc.agg, name)(q, **kw)
            pd.testing.assert_frame_equal(
                warm.reset_index(drop=True),
                cold.reset_index(drop=True)), name
        for mode in ("max", "sum", "avg", "count"):
            hc_cold = s.has_child_search(q, k=50, score_mode=mode)
            hc_warm = svc.agg.has_child_search(q, k=50,
                                               score_mode=mode)
            pd.testing.assert_frame_equal(hc_warm, hc_cold), mode
    finally:
        svc.shutdown()


def test_serve_pfor_bulk_merged_blk_n(tmp_path):
    """Regression: the warm actor must consult blk_n when decoding
    bulk-merged pfor postings — before the fix it decoded regular-size
    blocks and silently corrupted ordinals on merged pfor indexes."""
    from opensearch_jvector_ray.serve import SearchService
    from opensearch_jvector_ray.stages.merge import merge_index
    cfg = EngineConfig(num_segments=6, codec="pfor")
    idx = str(tmp_path / "idx")
    merged = str(tmp_path / "merged")
    build_index(rd.from_arrow(CORPUS), idx, cfg, IndexSpec())
    merge_index(idx, merged, merge_factor=3)
    cold = IndexSearcher(merged).search(
        {"q": "alpha gamma", "r": "delta eps"}, k=25)
    svc = SearchService(merged, num_shards=2)
    try:
        warm = svc.search({"q": "alpha gamma", "r": "delta eps"}, k=25)
        pd.testing.assert_frame_equal(warm, cold)
    finally:
        svc.shutdown()


def test_warm_agg_sees_refreshed_segments(tmp_path):
    """After refresh(), the agg facade must rebuild (fresh stats + seg
    list) so warm aggregations cover appended segments."""
    import pyarrow.parquet as pq_
    from opensearch_jvector_ray.serve import SearchService
    from opensearch_jvector_ray.stages.build import add_segments
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(CORPUS), idx, CFG, IndexSpec())
    svc = SearchService(idx, num_shards=2)
    try:
        before = svc.agg.facet_counts({"q": "alpha"}, facet_col="role",
                                      min_score=1e-9)
        extra = pa.table({
            "conv_id": ["z99990", "z99991"],
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": ["ghost", "ghost"],
            "text": pa.array(["alpha alpha", "alpha beta"],
                             type=pa.string()),
            "tool": ["", ""],
            "ts": pa.array([0, 0], type=pa.timestamp("us")),
        })
        ep = str(tmp_path / "extra.parquet")
        pq_.write_table(extra, ep)
        add_segments(idx, ep)
        svc.refresh()
        after = svc.agg.facet_counts({"q": "alpha"}, facet_col="role",
                                     min_score=1e-9)
        cold = IndexSearcher(idx).facet_counts({"q": "alpha"},
                                               facet_col="role",
                                               min_score=1e-9)
        pd.testing.assert_frame_equal(after.reset_index(drop=True),
                                      cold.reset_index(drop=True))
        assert "ghost" in set(after["role"])
        assert "ghost" not in set(before["role"])
    finally:
        svc.shutdown()


def test_new_modes_segmentation_invariance(tmp_path):
    """Every new query mode must be independent of how the corpus is
    split into segments (the A1 leaf->global reduce invariant applied
    to the round-3-continuation surface)."""
    outs = []
    for n_seg in (1, 7):
        out = str(tmp_path / f"idx{n_seg}")
        build_index(rd.from_arrow(CORPUS), out,
                    EngineConfig(num_segments=n_seg), IndexSpec())
        s = IndexSearcher(out)
        q = {"a": "alpha gamma", "b": "delta eps"}
        ms = 1e-9
        res = {
            "span": s.search(q, k=30, mode="span", slop=2),
            "sort": s.search(q, k=30, sort=("ts", "desc")),
            "fscore": s.search(q, k=30, score_fn={
                "kind": "decay", "decay_fn": "linear", "field": "ts",
                "origin": 0.0, "scale": 50_000.0, "decay": 0.5}),
            "const": s.search(q, k=30, const_score=1.5),
            "boost": s.search(q, k=30, negative={"a": "beta",
                                                 "b": "mu"},
                              negative_boost=0.3),
            "card": s.cardinality_agg(q, "role", ms),
            "pctl": s.percentiles_agg(q, "ts", (0.5, 0.9), ms),
            "sig": s.significant_terms_agg(q, "role", ms, size=3),
            "tstats": s.terms_stats_agg(q, "role", "turn_idx", ms),
            "comp": s.composite_agg(q, "role", 5, ms),
            "hc": s.has_child_search(q, k=30, score_mode="max"),
            "expl": s.explain(q, k=10),
        }
        outs.append(res)
    for key in outs[0]:
        pd.testing.assert_frame_equal(
            outs[0][key].reset_index(drop=True),
            outs[1][key].reset_index(drop=True)), key


def test_new_modes_merge_invariance(tmp_path):
    """Force-merging (bulk-merged segments, segment-major ordinals +
    key_rank tie column) must not change any new-mode output."""
    from opensearch_jvector_ray.stages.merge import merge_index
    idx = str(tmp_path / "idx")
    merged = str(tmp_path / "merged")
    build_index(rd.from_arrow(CORPUS), idx,
                EngineConfig(num_segments=6), IndexSpec())
    merge_index(idx, merged, merge_factor=3)
    q = {"a": "alpha gamma", "b": "delta eps"}
    ms = 1e-9

    def snap(path):
        s = IndexSearcher(path)
        return {
            "span": s.search(q, k=30, mode="span", slop=2),
            "sort": s.search(q, k=30, sort=("ts", "asc")),
            "fscore": s.search(q, k=30, score_fn={
                "kind": "field_value_factor", "field": "ts",
                "factor": 1e-3, "modifier": "sqrt"}),
            "const": s.search(q, k=30, const_score=2.0),
            "card": s.cardinality_agg(q, "role", ms),
            "pctl": s.percentiles_agg(q, "ts", (0.5,), ms),
            "tstats": s.terms_stats_agg(q, "role", "turn_idx", ms),
            "hc": s.has_child_search(q, k=30, score_mode="count"),
        }

    a, b = snap(idx), snap(merged)
    for key in a:
        pd.testing.assert_frame_equal(a[key].reset_index(drop=True),
                                      b[key].reset_index(drop=True)), key


def test_dsl_never_silently_drops_clauses(idx):
    """Regression: min_score + sort (or wand + sort) must surface the
    engine's ValueError, not silently drop the sort."""
    from opensearch_jvector_ray.query_dsl import execute_query
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="sort requires plain taat"):
        execute_query({"match": {"query": "alpha", "min_score": 0.1,
                                 "sort": {"field": "ts",
                                          "order": "asc"}}},
                      searcher=s)
    with pytest.raises(ValueError, match="sort requires plain taat"):
        execute_query({"match": {"query": "alpha", "mode": "wand",
                                 "sort": {"field": "ts",
                                          "order": "asc"}}},
                      searcher=s)


def test_percentiles_ts_oracle_executes(idx):
    """percentiles_sql(is_ts=True) must be runnable SQL (TIMESTAMP
    cannot cast to DOUBLE; epoch_us path) and match the engine's
    epoch-int reporting on a real table."""
    import duckdb
    from opensearch_jvector_ray.oracles import percentiles_sql
    con = duckdb.connect()
    con.register("documents", CORPUS.select(
        ["conv_id", "text", "ts"]).rename_columns(
        ["doc_id", "text", "ts"]).to_pandas())
    sql = percentiles_sql({"q": "alpha gamma"}, 1e-300, "ts",
                          (0.5, 0.9), CFG, is_ts=True,
                          id_col="doc_id")
    exp = con.sql(sql).df()
    assert len(exp)


def test_hll_ignores_nulls():
    """approx cardinality must count the same distinct universe as the
    exact path: NULL field values are excluded on both."""
    import tempfile
    n = 60
    tbl = pa.table({
        "conv_id": [f"n{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": pa.array([None if i % 3 == 0 else f"v{i % 7}"
                          for i in range(n)], type=pa.string()),
        "text": pa.array(["alpha"] * n, type=pa.string()),
        "tool": [""] * n,
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
    })
    with tempfile.TemporaryDirectory() as td:
        out = f"{td}/idx"
        build_index(rd.from_arrow(tbl), out,
                    EngineConfig(num_segments=2), IndexSpec())
        s = IndexSearcher(out)
        exact = int(s.cardinality_agg({"q": "alpha"}, "role",
                                      1e-9)["cardinality"][0])
        est = int(s.cardinality_agg({"q": "alpha"}, "role", 1e-9,
                                    approx=True,
                                    precision=14)["cardinality"][0])
        assert exact == 7          # v0..v6; the null third excluded
        assert est == exact        # tiny universe: sketch is exact


def test_suggest_dsl_clauses(idx):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    s = IndexSearcher(idx)
    p = execute_query({"suggest": {"prefix": "al", "n": 3}}, searcher=s)
    pd.testing.assert_frame_equal(p, s.suggest_prefix("al", 3))
    t = execute_query({"suggest": {"typo": "alpah", "max_edits": 2}},
                      searcher=s)
    pd.testing.assert_frame_equal(t, s.suggest_fuzzy("alpah", 10, 2))
    # phrase results key by the CALLER's query_id (every other dispatch
    # does; the hardcoded "s" broke query_id joins)
    ph = execute_query({"suggest": {"phrase": "alpah gama"}},
                       searcher=s, query_id="q7")
    pd.testing.assert_frame_equal(
        ph, s.suggest_phrase({"q7": "alpah gama"}, max_edits=2))
    for bad in ({"suggest": {}},
                {"suggest": {"prefix": "a", "typo": "b"}},
                {"suggest": {"prefix": ""}},
                {"suggest": {"phrase": "a", "size": 3}}):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_pipeline_agg_window_semantics_match_duckdb_randomized():
    """Property: the engine's pipeline-agg window arithmetic (pandas on
    the driver-side bucket frame) and the generated DuckDB window SQL
    agree BIT-FOR-BIT on random multi-query bucket series — partial
    windows, lag boundaries, the moving_avg single-division fp rule, and
    bucket_selector filtering included."""
    import duckdb
    rng = np.random.default_rng(424)
    con = duckdb.connect()
    for trial in range(8):
        n_q = int(rng.integers(1, 4))
        rows = []
        for qi in range(n_q):
            n_b = int(rng.integers(1, 9))
            for b in range(n_b):
                rows.append((f"q{qi}", b, int(rng.integers(0, 50))))
        df = pd.DataFrame(rows, columns=["query_id", "bucket",
                                         "doc_count"])
        df["doc_count"] = df["doc_count"].astype(np.int64)
        con.register("b", df)
        window = int(rng.integers(1, 5))
        lag = int(rng.integers(1, 4))
        thr = int(rng.integers(0, 30))
        w = (f"OVER (PARTITION BY query_id ORDER BY bucket ROWS BETWEEN "
             f"{window - 1} PRECEDING AND CURRENT ROW)")
        sql = con.sql(f"""
            SELECT query_id, bucket, doc_count,
                   sum(doc_count) OVER (PARTITION BY query_id
                       ORDER BY bucket)::BIGINT AS cumulative_sum,
                   (doc_count - lag(doc_count) OVER (PARTITION BY
                       query_id ORDER BY bucket))::BIGINT AS derivative,
                   sum(doc_count) {w}::DOUBLE / count(*) {w}::DOUBLE
                       AS moving_avg,
                   (doc_count - lag(doc_count, {lag}) OVER (PARTITION BY
                       query_id ORDER BY bucket))::BIGINT AS serial_diff
            FROM b ORDER BY query_id, bucket""").df()
        grp = df.groupby("query_id", sort=False)["doc_count"]
        eng_cs = grp.cumsum().astype(np.int64)
        eng_dv = grp.diff().astype(np.float64)
        rsum = grp.rolling(window, min_periods=1).sum() \
                  .reset_index(level=0, drop=True)
        rcnt = grp.rolling(window, min_periods=1).count() \
                  .reset_index(level=0, drop=True)
        eng_ma = (rsum / rcnt).astype(np.float64)
        eng_sd = (df["doc_count"] - grp.shift(lag)).astype(np.float64)
        assert list(sql["cumulative_sum"]) == list(eng_cs), trial
        pd.testing.assert_series_equal(
            sql["derivative"], eng_dv, check_names=False)
        pd.testing.assert_series_equal(
            sql["moving_avg"], eng_ma, check_names=False)
        pd.testing.assert_series_equal(
            sql["serial_diff"], eng_sd, check_names=False)
        # bucket_selector == SQL WHERE on the same frame
        sel = con.sql(f"SELECT query_id, bucket, doc_count FROM b "
                      f"WHERE doc_count >= {thr} "
                      f"ORDER BY query_id, bucket").df()
        eng_bs = df[df["doc_count"] >= thr].reset_index(drop=True)
        assert list(sel["doc_count"]) == list(eng_bs["doc_count"]), trial
        con.unregister("b")
