"""Round-3 continuation: cardinality / percentiles / significant_terms /
filters / terms+stats / composite aggregations — brute-force containment
oracles on a purpose-built corpus + DSL equivalence.  Hard DuckDB gates
live in the driver entries (bm25_cardinality .. bm25_composite)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.query_dsl import execute_query, parse_query
from opensearch_jvector_ray.stages.build import IndexSpec, build_index

TEXTS = ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
         "gamma delta", "alpha", "beta", "delta eps", "alpha delta",
         "beta delta"] * 4
N = len(TEXTS)
ROLES = [("user", "assistant", "tool")[i % 3] for i in range(N)]
TS = [((i * 7) % N) * 1000 for i in range(N)]


def _corpus() -> pa.Table:
    return pa.table({
        "conv_id": [f"c{i:05d}" for i in range(N)],
        "turn_idx": pa.array([0] * N, type=pa.int32()),
        "role": ROLES,
        "text": pa.array(TEXTS, type=pa.string()),
        "tool": [("", "search", "python")[i % 3] for i in range(N)],
        "ts": pa.array(TS, type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r8") / "idx")
    build_index(rd.from_arrow(_corpus()), out,
                EngineConfig(num_segments=3), IndexSpec())
    return out


def _hits(s, q, min_score):
    out = s.search({"q": q}, min_score=min_score)
    return [int(c[1:]) for c in out["conv_id"]]


MS = 1e-9
Q = "alpha delta"


def test_cardinality_exact(idx):
    s = IndexSearcher(idx)
    got = s.cardinality_agg({"q": Q, "qz": "zzznope"}, field="role",
                            min_score=MS)
    ids = _hits(s, Q, MS)
    want = len({ROLES[i] for i in ids})
    assert dict(zip(got["query_id"], got["cardinality"])) == \
        {"q": want, "qz": 0}


def test_percentiles_quantile_disc_rule(idx):
    s = IndexSearcher(idx)
    ps = (0.25, 0.5, 0.9, 1.0)
    got = s.percentiles_agg({"q": Q}, value_col="ts", percents=ps,
                            min_score=MS)
    ids = _hits(s, Q, MS)
    vals = sorted(TS[i] for i in ids)
    for q, v in zip(got["quantile"], got["value"]):
        t = max(1, math.ceil(q * len(vals)))
        assert v == float(vals[t - 1])


def test_significant_terms_jlh(idx):
    s = IndexSearcher(idx)
    got = s.significant_terms_agg({"q": Q}, field="role",
                                  min_score=MS, size=3)
    ids = _hits(s, Q, MS)
    fg = pd.Series([ROLES[i] for i in ids]).value_counts()
    bg = pd.Series(ROLES).value_counts()
    fg_tot, bg_tot = float(fg.sum()), float(bg.sum())
    rows = []
    for v in fg.index:
        fgp, bgp = fg[v] / fg_tot, bg[v] / bg_tot
        rows.append((v, round((fgp - bgp) * (fgp / bgp), 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert list(got["role"]) == [v for v, _ in rows[:3]]
    assert list(got["score"]) == [sc for _, sc in rows[:3]]


def test_filters_agg_counts_and_zero_fill(idx):
    s = IndexSearcher(idx)
    specs = {"users": {"term": {"role": "user"}},
             "none": {"term": {"role": "ghost"}},
             "early": {"range": {"ts": {"lt": pd.Timestamp(5000,
                                                           unit="us")}}}}
    got = s.filters_agg({"q": Q}, specs, min_score=MS)
    ids = _hits(s, Q, MS)
    want = {"users": sum(ROLES[i] == "user" for i in ids),
            "none": 0,
            "early": sum(TS[i] < 5000 for i in ids)}
    assert dict(zip(got["filter_key"], got["doc_count"])) == want
    assert len(got) == 3      # zero buckets still emitted


def test_terms_stats_integer_partials(idx):
    s = IndexSearcher(idx)
    got = s.terms_stats_agg({"q": Q}, group_col="role", value_col="ts",
                            min_score=MS)
    ids = _hits(s, Q, MS)
    df = pd.DataFrame({"role": [ROLES[i] for i in ids],
                       "ts": [TS[i] for i in ids]})
    for r in got.itertuples():
        sub = df[df["role"] == r.role]["ts"]
        assert (r.doc_count, r.v_sum, r.v_min, r.v_max) == \
            (len(sub), sub.sum(), sub.min(), sub.max())
        assert r.v_avg == float(sub.sum()) / len(sub)


def test_composite_pages_tile_all_buckets(idx):
    s = IndexSearcher(idx)
    pages, after = [], None
    while True:
        page = s.composite_agg({"q": "alpha beta gamma delta"}, "role",
                               size=1, min_score=MS, after=after)
        if page.empty:
            break
        pages.append(page)
        after = page["role"].iloc[-1]
    allb = pd.concat(pages, ignore_index=True)
    full = s.composite_agg({"q": "alpha beta gamma delta"}, "role",
                           size=100, min_score=MS)
    pd.testing.assert_frame_equal(allb, full)
    assert list(allb["role"]) == sorted(allb["role"])


def test_agg_dsl_equivalence(idx):
    s = IndexSearcher(idx)
    cases = [
        ({"cardinality": {"query": Q, "field": "role",
                          "min_score": MS}},
         s.cardinality_agg({"q": Q}, field="role", min_score=MS)),
        ({"percentiles": {"query": Q, "field": "ts", "min_score": MS,
                          "percents": [0.5, 0.9]}},
         s.percentiles_agg({"q": Q}, value_col="ts",
                           percents=[0.5, 0.9], min_score=MS)),
        ({"significant_terms": {"query": Q, "field": "role",
                                "min_score": MS, "size": 2}},
         s.significant_terms_agg({"q": Q}, field="role", min_score=MS,
                                 size=2)),
        ({"filters_agg": {"query": Q, "min_score": MS,
                          "filters": {"u": {"term": {"role": "user"}}}}},
         s.filters_agg({"q": Q}, {"u": {"term": {"role": "user"}}},
                       min_score=MS)),
        ({"terms_stats": {"query": Q, "field": "role",
                          "value_field": "ts", "min_score": MS}},
         s.terms_stats_agg({"q": Q}, group_col="role", value_col="ts",
                           min_score=MS)),
        ({"composite": {"query": Q, "field": "role", "size": 2,
                        "min_score": MS, "after": "assistant"}},
         s.composite_agg({"q": Q}, field="role", size=2, min_score=MS,
                         after="assistant")),
    ]
    for body, direct in cases:
        got = execute_query(body, searcher=s)
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      direct.reset_index(drop=True))


def test_agg_dsl_strictness():
    for bad in (
        {"cardinality": {"query": "a", "field": "f"}},
        {"percentiles": {"query": "a", "field": "f", "min_score": 0.1,
                         "percents": []}},
        {"significant_terms": {"query": "a", "min_score": 0.1}},
        {"filters_agg": {"query": "a", "min_score": 0.1,
                         "filters": {}}},
        {"filters_agg": {"query": "a", "min_score": 0.1,
                         "filters": {"x": {"nope": {}}}}},
        {"terms_stats": {"query": "a", "field": "f",
                         "min_score": 0.1}},
        {"composite": {"query": "a", "field": "f", "min_score": 0.1,
                       "sizes": 2}},
    ):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_agg_validation(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="percents"):
        s.percentiles_agg({"q": Q}, "ts", [], MS)
    with pytest.raises(ValueError, match="fractions"):
        s.percentiles_agg({"q": Q}, "ts", [25.0], MS)
    with pytest.raises(ValueError, match="non-empty"):
        s.filters_agg({"q": Q}, {}, MS)
    with pytest.raises(ValueError, match="not a stored"):
        s.terms_stats_agg({"q": Q}, "role", "zz", MS)
    with pytest.raises(ValueError, match="size"):
        s.composite_agg({"q": Q}, "role", 0, MS)


# ---------------------------------------------------------------------------
# multi_match / dis_max
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def field_indexes(tmp_path_factory):
    root = tmp_path_factory.mktemp("r8mm")
    out = {}
    for f in ("text", "role"):
        idx = str(root / f"idx_{f}")
        build_index(rd.from_arrow(_corpus()), idx,
                    EngineConfig(num_segments=2),
                    IndexSpec(text_col=f, key_cols=("conv_id",),
                              store_cols=(), ts_col=""))
        out[f] = IndexSearcher(idx)
    return out


def test_multi_match_formulas(field_indexes):
    from opensearch_jvector_ray.query import multi_match
    q = {"q": "alpha user"}
    per = {f: s.search(q, min_score=1e-300)
             .set_index("conv_id")["score"]
           for f, s in field_indexes.items()}
    m = pd.concat([per["role"].rename("role"),
                   per["text"].rename("text")], axis=1).fillna(0.0)
    total = m["role"] + m["text"]          # sorted-field chain
    best = np.maximum(m["role"], m["text"])

    most = multi_match(field_indexes, q, k=100,
                       match_type="most_fields")
    exp = total.sort_values(ascending=False)
    got = dict(zip(most["conv_id"], most["score"]))
    for c, v in got.items():
        assert v == float(total[c])
    assert len(most) == len(exp)

    for tie in (0.0, 0.3):
        bf = multi_match(field_indexes, q, k=100,
                         match_type="best_fields", tie_breaker=tie)
        want = best + tie * (total - best)
        for c, v in zip(bf["conv_id"], bf["score"]):
            assert v == float(want[c])
        # ranking follows the combined score desc, key asc
        w = want.reset_index().rename(columns={0: "s"})
        w.columns = ["conv_id", "s"]
        w = w.sort_values(["s", "conv_id"], ascending=[False, True])
        assert list(bf["conv_id"]) == list(w["conv_id"])


def test_multi_match_pure_dismax_is_max(field_indexes):
    from opensearch_jvector_ray.query import multi_match
    q = {"q": "beta assistant"}
    bf = multi_match(field_indexes, q, k=100, match_type="best_fields",
                     tie_breaker=0.0)
    per = {f: s.search(q, min_score=1e-300).set_index("conv_id")["score"]
           for f, s in field_indexes.items()}
    m = pd.concat([per["role"], per["text"]], axis=1).fillna(0.0)
    best = m.max(axis=1)
    for c, v in zip(bf["conv_id"], bf["score"]):
        assert v == float(best[c])


def test_multi_match_validation(field_indexes):
    from opensearch_jvector_ray.query import multi_match
    with pytest.raises(ValueError, match="match_type"):
        multi_match(field_indexes, {"q": "x"}, match_type="cross")
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match(field_indexes, {"q": "x"}, tie_breaker=1.5)
    with pytest.raises(ValueError, match="non-empty"):
        multi_match({}, {"q": "x"})


def test_multi_match_fused_identity(field_indexes):
    """The fused segment-task path (combine inside co-located slots,
    <= k rows per query per slot leave the task) is frame-identical to
    the driver join — same combine chain, same tie-break."""
    from opensearch_jvector_ray.query import _mm_slots, multi_match
    slots = _mm_slots(field_indexes, sorted(field_indexes))
    assert slots is not None and len(slots) == 2   # hash pairing, P=2
    q = {"q1": "alpha user", "q2": "beta assistant", "q3": "zzznothing"}
    for mt, tie in (("best_fields", 0.0), ("best_fields", 0.3),
                    ("most_fields", 0.0)):
        a = multi_match(field_indexes, q, k=5, match_type=mt,
                        tie_breaker=tie, fused=False)
        b = multi_match(field_indexes, q, k=5, match_type=mt,
                        tie_breaker=tie, fused=True)
        pd.testing.assert_frame_equal(a, b)


def test_multi_match_fused_requires_colocation(field_indexes, tmp_path):
    """fused=True must refuse indexes whose partitionings can't be
    paired (different num_segments => different hash assignment)."""
    from opensearch_jvector_ray.query import multi_match
    idx = str(tmp_path / "idx_p3")
    build_index(rd.from_arrow(_corpus()), idx,
                EngineConfig(num_segments=3),
                IndexSpec(text_col="text", key_cols=("conv_id",),
                          store_cols=(), ts_col=""))
    mixed = {"text": IndexSearcher(idx), "role": field_indexes["role"]}
    with pytest.raises(ValueError, match="co-located"):
        multi_match(mixed, {"q": "alpha"}, fused=True)
    # auto mode falls back to the driver join and still answers
    out = multi_match(mixed, {"q": "alpha user"}, k=5)
    assert not out.empty


# ---------------------------------------------------------------------------
# span_near
# ---------------------------------------------------------------------------

SPAN_TEXTS = [
    "merge fast sort data",          # fast..sort adjacent-ish
    "fast alpha beta gamma sort",    # distance 4
    "sort delta fast",               # unordered within 3
    "fast alpha beta gamma delta eps sort",   # distance 6
    "fast the sort",                 # stopword occupies a position slot
    "sort and more sort plus fast sort again",
    "nothing here",
    "fast",                          # missing one term
]


@pytest.fixture(scope="module")
def span_idx(tmp_path_factory):
    n = len(SPAN_TEXTS)
    tbl = pa.table({
        "conv_id": [f"c{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": ["user"] * n,
        "text": pa.array(SPAN_TEXTS, type=pa.string()),
        "tool": [""] * n,
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
    })
    out = str(tmp_path_factory.mktemp("r8span") / "idx")
    build_index(rd.from_arrow(tbl), out,
                EngineConfig(num_segments=2), IndexSpec())
    return out


def _brute_span_tf(text, words, slop):
    """The documented window rule, computed naively."""
    toks = [t for t in text.lower().split() if t]
    W = len(words) + slop
    tf = 0
    for s in range(1 - W, len(toks)):
        win = toks[max(s, 0): s + W]
        if all(w in win for w in words):
            tf += 1
    return tf


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_near_matches_brute_force(span_idx, slop):
    s = IndexSearcher(span_idx)
    got = s.search({"q": "fast sort"}, k=50, mode="span", slop=slop)
    want_tf = {i: _brute_span_tf(t, ["fast", "sort"], slop)
               for i, t in enumerate(SPAN_TEXTS)}
    want_ids = sorted(i for i, tf in want_tf.items() if tf > 0)
    assert sorted(int(c[1:]) for c in got["conv_id"]) == want_ids


def test_span_near_stopword_gap(span_idx):
    """'fast the sort' — the stopword holds a position slot, so
    slop=0 (window width 2) cannot contain both terms, slop=1 can."""
    s = IndexSearcher(span_idx)
    ids0 = {int(c[1:]) for c in
            s.search({"q": "fast sort"}, k=50, mode="span",
                     slop=0)["conv_id"]}
    ids1 = {int(c[1:]) for c in
            s.search({"q": "fast sort"}, k=50, mode="span",
                     slop=1)["conv_id"]}
    assert 4 not in ids0 and 4 in ids1


def test_span_near_tf_drives_score(span_idx):
    """More qualifying windows => higher tf => higher score at equal
    doc length is not guaranteed (norms differ), but tf must match the
    brute-force count via score inversion."""
    from opensearch_jvector_ray.functions.scoring import bm25_tf_part
    s = IndexSearcher(span_idx)
    got = s.search({"q": "fast sort"}, k=50, mode="span", slop=3)
    assert len(got) >= 4


def test_span_near_dsl_and_validation(span_idx):
    s = IndexSearcher(span_idx)
    got = execute_query({"span_near": {"query": "fast sort", "k": 5,
                                       "slop": 2}}, searcher=s)
    direct = s.search({"q": "fast sort"}, k=5, mode="span", slop=2)
    direct["score"] = direct["score"].round(6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  direct.reset_index(drop=True))
    with pytest.raises(ValueError):
        parse_query({"span_near": {"query": "", "slop": 1}})
    with pytest.raises(ValueError):
        parse_query({"span_near": {"query": "a", "slop": -1}})
    with pytest.raises(ValueError, match="slop applies"):
        s.search({"q": "a"}, k=5, slop=2)


# ---------------------------------------------------------------------------
# constant_score / boosting / scan
# ---------------------------------------------------------------------------

def test_constant_score_semantics(idx):
    s = IndexSearcher(idx)
    got = s.search({"q": "alpha gamma"}, k=6, const_score=2.5)
    base = _match_ids = sorted(
        s.search({"q": "alpha gamma"}, min_score=1e-300)["conv_id"])
    assert list(got["conv_id"]) == base[:6]      # key-asc tie order
    assert (got["score"] == 2.5).all()
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_boosting_demotes_not_filters(idx):
    s = IndexSearcher(idx)
    plain = s.search({"q": "alpha"}, k=100)
    boosted = s.search({"q": "alpha"}, k=100,
                       negative={"q": "beta"}, negative_boost=0.1)
    # same match set — negative demotes, never removes
    assert set(plain["conv_id"]) == set(boosted["conv_id"])
    has_beta = {c for c in plain["conv_id"]
                if "beta" in TEXTS[int(c[1:])]}
    ps = dict(zip(plain["conv_id"], plain["score"]))
    bs = dict(zip(boosted["conv_id"], boosted["score"]))
    for c in plain["conv_id"]:
        if c in has_beta:
            assert bs[c] == ps[c] * 0.1
        else:
            assert bs[c] == ps[c]


def test_boosting_validation(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="negative_boost"):
        s.search({"q": "a"}, negative={"q": "b"}, negative_boost=0.0)
    with pytest.raises(ValueError, match="const_score"):
        s.search({"q": "a"}, const_score=-1.0)
    with pytest.raises(ValueError, match="plain taat"):
        s.search({"q": "a"}, mode="wand", const_score=1.0)
    with pytest.raises(ValueError, match="boosting"):
        s.search({"q": "a"}, const_score=1.0, negative={"q": "b"},
                 negative_boost=0.5)


def test_scan_pages_tile_ranking(idx):
    s = IndexSearcher(idx)
    q = {"q": "alpha beta gamma delta"}
    pages = list(s.scan(q, page_size=3))
    assert all(len(p) <= 3 for p in pages)
    stitched = pd.concat(pages, ignore_index=True)
    full = s.search(q, k=len(stitched))
    pd.testing.assert_frame_equal(
        stitched[["query_id", "conv_id", "turn_idx", "score"]],
        full[["query_id", "conv_id", "turn_idx", "score"]])


def test_scan_mixed_exhaustion_no_requery(idx):
    # regression: a query that exhausts on a SHORT page is dropped from
    # the search_after boundary map; the next page must not include it
    # at all (a qid without a boundary would re-run from the top and
    # re-yield its first page — duplicate rows)
    s = IndexSearcher(idx)
    q = {"small": "eps", "big": "alpha beta gamma delta"}
    pages = list(s.scan(q, page_size=3))
    stitched = pd.concat(pages, ignore_index=True)
    for qid, text in q.items():
        got = stitched[stitched["query_id"] == qid]
        full = s.search({qid: text}, k=N)
        assert not got["conv_id"].duplicated().any()
        assert list(got["conv_id"]) == list(full["conv_id"])
        assert list(got["score"]) == list(full["score"])


def test_constant_boosting_dsl(idx):
    s = IndexSearcher(idx)
    got = execute_query({"constant_score": {"query": "alpha", "k": 4,
                                            "boost": 1.5}}, searcher=s)
    direct = s.search({"q": "alpha"}, k=4, const_score=1.5)
    direct["score"] = direct["score"].round(6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  direct.reset_index(drop=True))
    got2 = execute_query({"boosting": {"positive": "alpha",
                                       "negative": "beta",
                                       "negative_boost": 0.2, "k": 4}},
                         searcher=s)
    direct2 = s.search({"q": "alpha"}, k=4, negative={"q": "beta"},
                       negative_boost=0.2)
    direct2["score"] = direct2["score"].round(6)
    pd.testing.assert_frame_equal(got2.reset_index(drop=True),
                                  direct2.reset_index(drop=True))
    for bad in ({"boosting": {"positive": "a"}},
                {"constant_score": {"query": "a", "boost": 0}},
                {"boosting": {"positive": "a", "negative": "b",
                              "negative_boost": 2.0}}):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_hll_cardinality_sketch(idx):
    """HLL estimate within the expected error band of the exact count,
    and the partial is register-sized (the 100-TB combiner)."""
    s = IndexSearcher(idx)
    exact = s.cardinality_agg({"q": Q}, field="conv_id", min_score=MS)
    est = s.cardinality_agg({"q": Q}, field="conv_id", min_score=MS,
                            approx=True, precision=12)
    n = int(exact["cardinality"][0])
    e = int(est["cardinality"][0])
    assert n > 0
    assert abs(e - n) <= max(2, 0.1 * n)
    # determinism: md5 hash family => identical re-run
    est2 = s.cardinality_agg({"q": Q}, field="conv_id", min_score=MS,
                             approx=True, precision=12)
    assert int(est2["cardinality"][0]) == e
    with pytest.raises(ValueError, match="precision"):
        s.cardinality_agg({"q": Q}, field="conv_id", min_score=MS,
                          approx=True, precision=20)


# ---------------------------------------------------------------------------
# has_child join
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def parent_idx(tmp_path_factory):
    """Multi-turn corpus: conv parents with varying child match counts."""
    rows = []
    for c in range(12):
        for t in range((c % 4) + 1):
            text = "alpha beta" if (c + t) % 3 == 0 else "gamma delta"
            rows.append((f"p{c:04d}", t, text))
    tbl = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": ["user"] * len(rows),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
        "tool": [""] * len(rows),
        "ts": pa.array([0] * len(rows), type=pa.timestamp("us")),
    })
    out = str(tmp_path_factory.mktemp("r8join") / "idx")
    build_index(rd.from_arrow(tbl), out,
                EngineConfig(num_segments=3), IndexSpec())
    return out


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "count"])
def test_has_child_modes_match_bruteforce(parent_idx, mode):
    s = IndexSearcher(parent_idx)
    got = s.has_child_search({"q": "alpha"}, k=50, score_mode=mode)
    hits = s.search({"q": "alpha"}, min_score=1e-300)
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
    assert dict(zip(got["conv_id"], got["score"])) == want
    order = sorted(want, key=lambda c: (-want[c], c))
    assert list(got["conv_id"]) == order
    if mode in ("sum", "avg"):
        # micro-quantization stays within n_children * 1e-6 of the
        # true float aggregate
        for conv, g in hits.groupby("conv_id"):
            v = g["score"].to_numpy(np.float64)
            true = v.sum() if mode == "sum" else v.mean()
            assert abs(want[conv] - true) <= len(v) * 1e-6


def test_has_child_validation(parent_idx):
    s = IndexSearcher(parent_idx)
    with pytest.raises(ValueError, match="score_mode"):
        s.has_child_search({"q": "a"}, score_mode="min")
    with pytest.raises(ValueError, match="key column"):
        s.has_child_search({"q": "a"}, parent_col="role")


# ---------------------------------------------------------------------------
# percolator
# ---------------------------------------------------------------------------

def test_percolate_any_and_all(idx):
    from opensearch_jvector_ray.pipelines.percolate import percolate
    ds = rd.from_arrow(_corpus().select(["conv_id", "text"]))
    qs = {"qa": "alpha", "qb": "beta gamma", "qz": "the"}  # qz: all stop
    for mode in ("any", "all"):
        out = percolate(ds, qs, EngineConfig(), id_col="conv_id",
                        text_col="text", match_mode=mode).to_pandas()
        got = {(r.conv_id, r.query_id) for r in out.itertuples()}
        want = set()
        for i, t in enumerate(TEXTS):
            toks = set(t.split())
            if "alpha" in toks:
                want.add((f"c{i:05d}", "qa"))
            cond = (toks & {"beta", "gamma"}) if mode == "any" else \
                ({"beta", "gamma"} <= toks)
            if cond:
                want.add((f"c{i:05d}", "qb"))
        assert got == want      # qz (stopword-only) matches nothing


def test_percolate_validation(idx):
    from opensearch_jvector_ray.pipelines.percolate import percolate
    ds = rd.from_arrow(_corpus().select(["conv_id", "text"]))
    with pytest.raises(ValueError, match="match_mode"):
        percolate(ds, {"q": "x"}, EngineConfig(), match_mode="most")


def test_has_child_multi_match_dsl(parent_idx, field_indexes):
    s = IndexSearcher(parent_idx)
    got = execute_query({"has_child": {"query": "alpha", "k": 5,
                                       "score_mode": "sum"}},
                        searcher=s)
    direct = s.has_child_search({"q": "alpha"}, k=5, score_mode="sum")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  direct.reset_index(drop=True))
    from opensearch_jvector_ray.query import multi_match
    got2 = execute_query(
        {"multi_match": {"query": "alpha user", "fields":
                         ["role", "text"], "k": 5,
                         "type": "best_fields", "tie_breaker": 0.3}},
        field_searchers=field_indexes)
    direct2 = multi_match(field_indexes, {"q": "alpha user"}, k=5,
                          match_type="best_fields", tie_breaker=0.3)
    pd.testing.assert_frame_equal(got2.reset_index(drop=True),
                                  direct2.reset_index(drop=True))
    for bad in ({"has_child": {"query": "a", "score_mode": "min"}},
                {"multi_match": {"query": "a", "fields": []}},
                {"multi_match": {"query": "a", "fields": ["x"],
                                 "tie_breaker": 2.0}}):
        with pytest.raises(ValueError):
            parse_query(bad)
    with pytest.raises(ValueError, match="field_searchers"):
        execute_query({"multi_match": {"query": "a",
                                       "fields": ["text"]}})


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------

def test_semdedup_drops_planted_keeps_min_id():
    from opensearch_jvector_ray.pipelines.knn import semdedup
    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 16)).astype(np.float32)
    ids = list(range(60))
    # plant: 70/71/72 duplicate 0/1/2 exactly
    X = np.vstack([X, X[:3]])
    ids += [70, 71, 72]
    tbl = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array([list(map(float, r))
                                           for r in X])})
    ds = rd.from_arrow(tbl)
    from opensearch_jvector_ray.pipelines.knn import fixed_centroids
    cent = fixed_centroids(ds, [0, 1, 2, 3])
    out = (semdedup(ds, cent, threshold=0.95).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    keep = dict(zip(out["vec_id"], out["keep"]))
    cell = dict(zip(out["vec_id"], out["cell"]))
    assert len(out) == 63
    for orig, dup in ((0, 70), (1, 71), (2, 72)):
        assert cell[orig] == cell[dup]        # identical vector, same cell
        assert keep[orig] == 1 and keep[dup] == 0   # min-id keep rule
    # random gaussians have no 0.95-cosine pairs
    others = [i for i in range(3, 60)]
    assert all(keep[i] == 1 for i in others)


# ---------------------------------------------------------------------------
# snapshot / restore
# ---------------------------------------------------------------------------

def test_snapshot_restore_roundtrip(idx, tmp_path):
    from opensearch_jvector_ray.state.manifest import (
        restore_index, snapshot_index,
    )
    snap = str(tmp_path / "snap.tar")
    rep = snapshot_index(idx, snap)
    assert rep["ok"] and rep["files"] > 0
    dest = str(tmp_path / "restored")
    rep2 = restore_index(snap, dest)
    assert rep2["ok"]
    a = IndexSearcher(idx).search({"q": "alpha beta"}, k=10)
    b = IndexSearcher(dest).search({"q": "alpha beta"}, k=10)
    pd.testing.assert_frame_equal(a, b)
    # refuses to overwrite a non-empty target
    with pytest.raises(ValueError, match="not empty"):
        restore_index(snap, dest)
    # tampered snapshot content fails the restore audit
    import tarfile, io, json as _json, os as _os
    bad = str(tmp_path / "bad")
    _os.makedirs(bad)
    with tarfile.open(snap) as tf:
        meta = _json.loads(tf.extractfile("_SNAPSHOT.json").read())
    meta["files"][0][1] += 1          # lie about one size
    snap2 = str(tmp_path / "snap2.tar")
    with tarfile.open(snap) as tf, tarfile.open(snap2, "w") as out:
        for m in tf.getmembers():
            if m.name == "_SNAPSHOT.json":
                raw = _json.dumps(meta).encode()
                ti = tarfile.TarInfo("_SNAPSHOT.json"); ti.size = len(raw)
                out.addfile(ti, io.BytesIO(raw))
            else:
                out.addfile(m, tf.extractfile(m))
    with pytest.raises(ValueError, match="size mismatch"):
        restore_index(snap2, bad)


# ---------------------------------------------------------------------------
# NRT refresh on the warm serving path
# ---------------------------------------------------------------------------

def test_serve_refresh_picks_up_appended_segments(tmp_path):
    import pyarrow.parquet as pq_
    from opensearch_jvector_ray.serve import SearchService
    from opensearch_jvector_ray.stages.build import add_segments

    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus()), idx,
                EngineConfig(num_segments=2), IndexSpec())
    svc = SearchService(idx, num_shards=2)
    try:
        before = svc.search({"q": "alpha zulu"}, k=20)

        extra = pa.table({
            "conv_id": ["z90000", "z90001"],
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": ["user", "user"],
            "text": pa.array(["zulu alpha fresh", "zulu zulu"],
                             type=pa.string()),
            "tool": ["", ""],
            "ts": pa.array([0, 0], type=pa.timestamp("us")),
        })
        ep = str(tmp_path / "extra.parquet")
        pq_.write_table(extra, ep)
        add_segments(idx, ep)

        # un-refreshed service still serves the old view
        assert set(svc.search({"q": "alpha zulu"}, k=20)["conv_id"]) \
            == set(before["conv_id"])
        n_new = svc.refresh()
        assert n_new >= 1
        after = svc.search({"q": "alpha zulu"}, k=20)
        cold = IndexSearcher(idx).search({"q": "alpha zulu"}, k=20)
        pd.testing.assert_frame_equal(after, cold)   # rank-identical
        assert {"z90000", "z90001"} <= set(after["conv_id"])
        assert svc.refresh() == 0                    # idempotent
    finally:
        svc.shutdown()


def test_highlight_fragments_window(idx):
    s = IndexSearcher(idx)

    def texts_for(keys):
        tbl = _corpus().to_pandas()
        return keys.merge(tbl[["conv_id", "turn_idx", "text"]],
                          on=["conv_id", "turn_idx"])

    out = s.highlight_fragments({"q": "gamma"}, texts_for, k=5,
                                window=1)
    assert len(out)
    for r in out.itertuples():
        text = TEXTS[int(r.conv_id[1:])]
        toks = text.split()
        p = int(r.first_pos)
        assert toks[p] == "gamma"
        assert r.fragment == " ".join(toks[max(0, p - 1): p + 2])


def test_rank_eval_metrics(idx):
    s = IndexSearcher(idx)
    # all alpha-docs rated relevant
    rated = {f"c{i:05d}": 1 for i, t in enumerate(TEXTS) if "alpha" in t}
    ratings = {"q": rated}
    hits = s.search({"q": "alpha beta"}, k=10)
    rels = [1 if c in rated else 0 for c in hits["conv_id"]]
    p = s.rank_eval({"q": "alpha beta"}, ratings, k=10,
                    metric="precision")
    assert p["metric_score"][0] == round(sum(rels) / 10, 6)
    m = s.rank_eval({"q": "alpha beta"}, ratings, k=10, metric="mrr")
    first = next((i + 1 for i, r in enumerate(rels) if r), None)
    assert m["metric_score"][0] == round(1.0 / first, 6)
    n = s.rank_eval({"q": "alpha beta"}, ratings, k=10, metric="ndcg")
    dcg = sum(r / np.log2(i + 2) for i, r in enumerate(rels))
    ideal = sorted(rated.values(), reverse=True)[:10]
    idcg = sum(r / np.log2(i + 2) for i, r in enumerate(ideal))
    assert n["metric_score"][0] == round(dcg / idcg, 6)
    # unmatched query scores 0 under every metric
    z = s.rank_eval({"q": "zzznope"}, {"q": rated}, k=10, metric="mrr")
    assert z["metric_score"][0] == 0.0
    with pytest.raises(ValueError, match="metric"):
        s.rank_eval({"q": "a"}, {}, metric="f1")


def test_explain_contributions_sum_to_score(idx):
    s = IndexSearcher(idx)
    q = {"q": "alpha beta gamma"}
    hits = s.search(q, k=5)
    ex = s.explain(q, k=5)
    for r in hits.itertuples():
        sub = ex[(ex["query_id"] == r.query_id)
                 & (ex["conv_id"] == r.conv_id)]
        assert len(sub)
        # round-6 components sum back to the round-6 score within one
        # ulp-per-term of rounding slack
        assert abs(sub["contribution"].sum() - round(r.score, 6)) \
            <= 1e-6 * (len(sub) + 1)
        # tf equals the term count in the doc text
        toks = TEXTS[int(r.conv_id[1:])].split()
        for t in sub.itertuples():
            assert t.tf == toks.count(t.term)


def test_date_histogram_pipeline_aggs(idx):
    s = IndexSearcher(idx)
    base = s.date_histogram_agg({"q": "alpha beta gamma delta"},
                                ts_col="ts", calendar_interval="hour",
                                min_score=MS)
    cs = s.date_histogram_agg({"q": "alpha beta gamma delta"},
                              ts_col="ts", calendar_interval="hour",
                              min_score=MS, pipeline="cumulative_sum")
    dv = s.date_histogram_agg({"q": "alpha beta gamma delta"},
                              ts_col="ts", calendar_interval="hour",
                              min_score=MS, pipeline="derivative")
    assert list(cs["cumulative_sum"]) == \
        list(base["doc_count"].cumsum())
    assert pd.isna(dv["derivative"].iloc[0])
    assert dv["derivative"].dtype == np.float64  # oracle materializes float64
    assert list(dv["derivative"].iloc[1:]) == \
        list(base["doc_count"].diff().iloc[1:])
    ma = s.date_histogram_agg({"q": "alpha beta gamma delta"},
                              ts_col="ts", calendar_interval="hour",
                              min_score=MS, pipeline="moving_avg",
                              pipeline_window=2)
    want = (base["doc_count"].rolling(2, min_periods=1).sum()
            / base["doc_count"].rolling(2, min_periods=1).count())
    assert ma["moving_avg"].dtype == np.float64
    assert list(ma["moving_avg"]) == list(want)
    sd = s.date_histogram_agg({"q": "alpha beta gamma delta"},
                              ts_col="ts", calendar_interval="hour",
                              min_score=MS, pipeline="serial_diff",
                              pipeline_lag=2)
    assert sd["serial_diff"].dtype == np.float64
    assert pd.isna(sd["serial_diff"].iloc[:2]).all()
    assert list(sd["serial_diff"].iloc[2:]) == \
        list((base["doc_count"] - base["doc_count"].shift(2)).iloc[2:])
    bs = s.date_histogram_agg({"q": "alpha beta gamma delta"},
                              ts_col="ts", calendar_interval="hour",
                              min_score=MS, pipeline="bucket_selector",
                              selector_op="gte", selector_value=2)
    assert list(bs.columns) == ["query_id", "bucket", "doc_count"]
    want_bs = base[base["doc_count"] >= 2].reset_index(drop=True)
    pd.testing.assert_frame_equal(bs, want_bs)
    with pytest.raises(ValueError, match="selector_op"):
        s.date_histogram_agg({"q": "a"}, ts_col="ts",
                             calendar_interval="hour", min_score=MS,
                             pipeline="bucket_selector",
                             selector_op="between")
    with pytest.raises(ValueError, match="pipeline"):
        s.date_histogram_agg({"q": "a"}, ts_col="ts",
                             calendar_interval="hour", min_score=MS,
                             pipeline="bogus")
    with pytest.raises(ValueError, match="window"):
        s.date_histogram_agg({"q": "a"}, ts_col="ts",
                             calendar_interval="hour", min_score=MS,
                             pipeline="moving_avg", pipeline_window=0)


def test_suggest_phrase_keep_or_correct(idx):
    s = IndexSearcher(idx)
    out = s.suggest_phrase({"a": "alpha betta gama", "b": "the delta"},
                           max_edits=2)
    got = dict(zip(out["suggest_id"], out["suggestion"]))
    assert got["a"] == "alpha beta gamma"   # in-vocab kept, typos fixed
    assert got["b"] == "delta"              # stopword dropped by analysis
    # nothing within max_edits -> token kept as-is
    out2 = s.suggest_phrase({"c": "zzzzzzzzzzzz"}, max_edits=1)
    assert out2["suggestion"][0] == "zzzzzzzzzzzz"
