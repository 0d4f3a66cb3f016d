"""Round-5 query surface: multi-term expansion (prefix / fuzzy), terms
facet aggregation, and search_after deep pagination.

Driver-gate parity vs DuckDB (expansion rules, BM25 over expanded
weighted terms, facet ordering, page tiling) is covered by the
bm25_prefix / bm25_fuzzy / bm25_facets / bm25_search_after oracle
entries at sf0.001/0.01/0.1; these tests cover what SQL parity can't:
the vectorized Levenshtein DP itself, the expansion cap/order rules
against brute force, boundary pushdown semantics (pages tile the full
ranking, nothing re-shipped), and argument validation.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from opensearch_jvector_ray.analyze import parse_prefix_query
from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher, _levenshtein_vec
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.synth import generate_conversations

CFG = EngineConfig()


def _lev_ref(a: str, b: str) -> int:
    """Textbook unit-cost Levenshtein (no transposition)."""
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (a[i - 1] != b[j - 1]))
    return dp[len(b)]


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("r5idx") / "main")
    corpus = generate_conversations(np.arange(220))
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=4),
                IndexSpec())
    return idx


def test_levenshtein_vec_matches_reference():
    rng = np.random.default_rng(7)
    alpha = "abcde"
    cands = ["".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
             for _ in range(80)] + ["", "query", "data"]
    for q in ["", "a", "query", "abcde", "edcba"]:
        got = _levenshtein_vec(cands, q)
        exp = [_lev_ref(t, q) for t in cands]
        assert got.tolist() == exp, q


def test_expand_prefix_rule(index):
    s = IndexSearcher(index)
    vocab = s._read_dictionary().to_pandas()
    for pfx in ["d", "mo", "se", "zzz"]:
        hit = vocab[vocab["term"].str.startswith(pfx)]
        exp = (hit.sort_values(["df", "term"], ascending=[False, True],
                               kind="mergesort")["term"].head(3).tolist())
        assert s.expand_prefix(pfx, max_expansions=3) == exp, pfx
    with pytest.raises(ValueError):
        s.expand_prefix("")
    with pytest.raises(ValueError):
        parse_prefix_query("data *", CFG)


def test_expand_fuzzy_rule(index):
    s = IndexSearcher(index)
    vocab = s._read_dictionary().to_pandas()
    terms = vocab["term"].tolist()
    dfs = dict(zip(vocab["term"], vocab["df"]))
    for q, me, pl in [("data", 1, 0), ("modell", 1, 0), ("serch", 2, 0),
                      ("data", 2, 2), ("xyzq", 1, 0), ("data", 0, 0)]:
        cands = [(_lev_ref(t, q), -int(dfs[t]), t) for t in terms
                 if _lev_ref(t, q) <= me and t[:pl] == q[:pl]]
        cands.sort()
        exp = [t for _, _, t in cands[:5]]
        assert s.expand_fuzzy(q, max_edits=me, prefix_length=pl,
                              max_expansions=5) == exp, (q, me, pl)


def test_suggesters_shapes_and_order(index):
    s = IndexSearcher(index)
    sp = s.suggest_prefix("d", n=5)
    assert list(sp.columns) == ["term", "df"]
    assert sp["term"].str.startswith("d").all()
    assert (sp["df"].diff().dropna() <= 0).all()     # df descending
    assert sp["term"].tolist() == s.expand_prefix("d", 5)
    sf = s.suggest_fuzzy("modell", n=5, max_edits=2)
    assert list(sf.columns) == ["term", "dist", "df"]
    assert (sf["dist"] <= 2).all()
    assert (sf["dist"].diff().dropna() >= 0).all()   # dist ascending
    assert sf["term"].tolist() == s.expand_fuzzy("modell", max_edits=2,
                                                 max_expansions=5)


def test_prefix_search_equals_manual_expansion(index):
    s = IndexSearcher(index)
    queries = {"q": "dat* model"}
    got = s.prefix_search(queries, k=8, max_expansions=10)
    lits, prefixes = parse_prefix_query(queries["q"], s.cfg)
    weights: dict[str, float] = {}
    order: list[str] = []
    for t, c in lits:
        order.append(t)
        weights[t] = float(c)
    for p in prefixes:
        for t in s.expand_prefix(p, 10):
            if t not in weights:
                order.append(t)
                weights[t] = 0.0
            weights[t] += 1.0
    manual = s.search(queries, k=8,
                      term_weights={"q": [(t, weights[t]) for t in order]})
    pd.testing.assert_frame_equal(got, manual)
    assert len(got) == 8
    # overlapping literal+prefix weights ADD: "data dat*" must outscore
    # plain "data" for the same top doc (weight 2 on 'data'-family terms)
    both = s.prefix_search({"q": "data dat*"}, k=1)
    plain = s.search({"q": "data"}, k=1)
    assert both["score"].iloc[0] > plain["score"].iloc[0]


def test_fuzzy_search_includes_exact_first(index):
    s = IndexSearcher(index)
    # max_expansions=1 keeps ONLY the distance-0 exact term -> identical
    # to the plain search for an in-vocab query
    got = s.fuzzy_search({"q": "data"}, k=5, max_edits=1, max_expansions=1)
    plain = s.search({"q": "data"}, k=5)
    pd.testing.assert_frame_equal(got, plain)
    # an off-by-one typo still finds the real term's docs
    typo = s.fuzzy_search({"q": "dataa"}, k=5, max_edits=1)
    assert not typo.empty


def test_search_after_pages_tile_full_ranking(index):
    s = IndexSearcher(index)
    queries = {"a": "data model search", "b": "checkpoint lineage"}
    full = s.search(queries, k=30)
    pages = [s.search(queries, k=10)]
    for _ in range(2):
        boundary = {}
        for qid, g in pages[-1].groupby("query_id"):
            last = g.loc[g["rank"].idxmax()]
            boundary[qid] = (float(last["score"]), str(last["conv_id"]),
                             int(last["turn_idx"]))
        pages.append(s.search(queries, k=10, search_after=boundary))
    tiled = pd.concat(pages, ignore_index=True)
    for qid in queries:
        f = full[full.query_id == qid].reset_index(drop=True)
        t = tiled[tiled.query_id == qid].reset_index(drop=True)
        assert len(t) == len(f)
        assert t["conv_id"].tolist() == f["conv_id"].tolist()
        assert t["turn_idx"].tolist() == f["turn_idx"].tolist()
        assert t["score"].tolist() == f["score"].tolist()
        # ranks restart per page
        assert t["rank"].tolist() == [r for _ in range(3)
                                      for r in range(1, 11)][:len(t)]
    # a query missing from the boundary dict returns no rows
    only_a = s.search(queries, k=10,
                      search_after={"a": tuple(
                          full[full.query_id == "a"].iloc[9][
                              ["score", "conv_id", "turn_idx"]])})
    assert set(only_a["query_id"]) == {"a"}


def test_search_after_validations(index):
    s = IndexSearcher(index)
    b = {"a": (1.0, "c0", 0)}
    for kw in ({"mode": "wand"}, {"rescore_oversample": 2.0},
               {"min_score": 0.1}, {"collapse_col": "conv_id"}):
        with pytest.raises(ValueError):
            s.search({"a": "data"}, k=5, search_after=b, **kw)


def test_query_dsl_round5_clauses(index):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    s = IndexSearcher(index)
    got = execute_query({"prefix": {"query": "dat* model", "k": 6,
                                    "max_expansions": 10}}, searcher=s)
    exp = s.prefix_search({"q": "dat* model"}, k=6, max_expansions=10)
    pd.testing.assert_frame_equal(got, exp)
    got = execute_query({"fuzzy": {"query": "modell", "k": 6,
                                   "max_edits": 1}}, searcher=s)
    exp = s.fuzzy_search({"q": "modell"}, k=6, max_edits=1)
    pd.testing.assert_frame_equal(got, exp)
    got = execute_query({"facets": {"query": "data model", "field": "role",
                                    "min_score": 0.4}}, searcher=s)
    exp = s.facet_counts({"q": "data model"}, facet_col="role",
                         min_score=0.4)
    pd.testing.assert_frame_equal(got, exp)
    p1 = s.search({"q": "data model search"}, k=5)
    b = [float(p1["score"].iloc[-1]), str(p1["conv_id"].iloc[-1]),
         int(p1["turn_idx"].iloc[-1])]
    got = execute_query({"match": {"query": "data model search", "k": 5,
                                   "search_after": b}}, searcher=s)
    exp = s.search({"q": "data model search"}, k=5,
                   search_after={"q": tuple(b)})
    pd.testing.assert_frame_equal(got, exp)
    # strictness: unknown fields / bad values are errors
    for bad in ({"prefix": {"query": "a*", "nope": 1}},
                {"fuzzy": {"query": "x", "max_edits": 3}},
                {"facets": {"query": "x", "field": "role"}},
                {"match": {"query": "x", "search_after": [1.0]}}):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_regexp_wildcard_expansion_and_search(index):
    from opensearch_jvector_ray.analyze import wildcard_to_regex
    from opensearch_jvector_ray.query_dsl import execute_query
    import re
    s = IndexSearcher(index)
    vocab = s._read_dictionary().to_pandas()
    # anchored-match rule vs brute re over the vocab
    for pat in ["d.*a", "(data|model)", "s...ch", "zz+"]:
        hit = vocab[vocab["term"].map(
            lambda t: re.fullmatch(pat, t) is not None)]
        exp = (hit.sort_values(["df", "term"], ascending=[False, True],
                               kind="mergesort")["term"].head(5).tolist())
        assert s.expand_regex(pat, max_expansions=5) == exp, pat
    # wildcard translation: '*'/'?' + literal escaping
    assert wildcard_to_regex("a*b?c.d") == "a.*b.c\\.d"
    got = s.wildcard_search({"q": "dat?"}, k=5)
    exp = s.regexp_search({"q": "dat."}, k=5)
    pd.testing.assert_frame_equal(got, exp)
    # DSL equivalence + strictness
    d = execute_query({"regexp": {"value": "(data|model)", "k": 5}},
                      searcher=s)
    pd.testing.assert_frame_equal(
        d, s.regexp_search({"q": "(data|model)"}, k=5))
    with pytest.raises(ValueError):
        from opensearch_jvector_ray.query_dsl import parse_query
        parse_query({"wildcard": {"value": ""}})


def test_expansion_prefilter_identity_and_reduction():
    """The regex/fuzzy dictionary prefilters (anchored-prefix range,
    required-literal substring passes, fuzzy bag-of-chars bound) must
    keep results identical to the unfiltered scan while cutting the
    candidate set by a measured factor on a large synthetic vocab."""
    import pyarrow as pa
    import pyarrow.compute as _pc
    from opensearch_jvector_ray.query import _regex_prefilter
    rng = np.random.default_rng(0)
    syll = ["al", "be", "ga", "de", "ep", "ze", "ka", "mu", "ta", "ro"]
    terms = np.unique(np.array(
        ["".join(rng.choice(syll, rng.integers(2, 6)))
         for _ in range(120_000)]))
    tbl = pa.table({"term": pa.array(terms)})
    for pat, min_cut in [("gade.*", 20.0), ("al.*rode", 50.0),
                         (".*kamu.*", 5.0)]:
        pfx, lits = _regex_prefilter(pat)
        t = tbl
        if pfx:
            t = t.filter(_pc.and_(
                _pc.greater_equal(t["term"], pfx),
                _pc.less(t["term"],
                         pfx[:-1] + chr(ord(pfx[-1]) + 1))))
        for lit in lits:
            t = t.filter(_pc.match_substring(t["term"], lit))
        rx = f"^(?:{pat})$"
        full = tbl.filter(
            _pc.match_substring_regex(tbl["term"], rx))["term"].to_pylist()
        pruned = t.filter(
            _pc.match_substring_regex(t["term"], rx))["term"].to_pylist()
        assert full == pruned, pat
        assert tbl.num_rows / max(t.num_rows, 1) >= min_cut, \
            (pat, t.num_rows)
    # fuzzy bag-of-chars bound: survivors must be a superset of the
    # true <=2-edit matches (never drops), with a real cut
    term = "gadeka"
    cands = [t for t in terms.tolist()
             if abs(len(t) - len(term)) <= 2]
    tcp = np.frombuffer(term.encode("utf-32-le"), "<u4").astype(np.int64)
    ucp = np.unique(tcp)
    A = len(ucp) + 1
    tvec = np.zeros(A, np.int64)
    np.add.at(tvec, np.searchsorted(ucp, tcp), 1)
    cp = np.frombuffer("".join(cands).encode("utf-32-le"),
                       "<u4").astype(np.int64)
    pos = np.searchsorted(ucp, cp)
    found = (pos < len(ucp)) & (ucp[np.minimum(pos, len(ucp) - 1)] == cp)
    cls = np.where(found, pos, len(ucp))
    rows = np.repeat(np.arange(len(cands), dtype=np.int64),
                     np.fromiter(map(len, cands), np.int64, len(cands)))
    hist = np.bincount(rows * A + cls,
                       minlength=len(cands) * A).reshape(len(cands), A)
    l1 = np.abs(hist - tvec[None, :]).sum(axis=1)
    keep = set(np.flatnonzero(l1 <= 4).tolist())
    true = set(np.flatnonzero(
        _levenshtein_vec(cands, term) <= 2).tolist())
    assert true <= keep
    assert len(cands) / max(len(keep), 1) >= 5.0


def test_boosted_search_parse_and_scale(index):
    from opensearch_jvector_ray.analyze import parse_boosted_query
    s = IndexSearcher(index)
    # parse edges: float boosts, repeated-term additivity, literal '^'
    assert parse_boosted_query("data^2.5 model", CFG) == \
        [("data", 2.5), ("model", 1.0)]
    assert parse_boosted_query("data data^2", CFG) == [("data", 3.0)]
    assert parse_boosted_query("data^x", CFG) == [("data", 1.0), ("x", 1.0)]
    with pytest.raises(ValueError):
        parse_boosted_query("data^-1", CFG)
    # boost^1 == plain search; boost scales single-term scores linearly
    pd.testing.assert_frame_equal(
        s.boosted_search({"q": "data^1 model"}, k=5),
        s.search({"q": "data model"}, k=5))
    b2 = s.boosted_search({"q": "data^2"}, k=5)
    b1 = s.search({"q": "data"}, k=5)
    assert np.allclose(b2["score"], 2.0 * b1["score"], rtol=1e-12)


def test_synonym_search_saturates_not_stacks(index):
    s = IndexSearcher(index)
    syn = {"data": ["model"]}
    got = s.synonym_search({"q": "data"}, syn, k=10)
    # brute reference: tf = tf(data)+tf(model), idf from max(df)
    vocab = s._read_dictionary().to_pandas().set_index("term")["df"]
    n = float(s.stats["n_docs_indexed"])
    avgdl = float(s.stats["avgdl"])
    mx = float(max(vocab.get("data", 0), vocab.get("model", 0)))
    idf = np.log(1.0 + (n - mx + 0.5) / (mx + 0.5))
    from tests.oracle import analyze as brute_analyze
    corpus = generate_conversations(np.arange(220)).to_pandas()
    stop = frozenset(CFG.stopwords)
    toks = corpus["text"].map(lambda x: brute_analyze(x, stop))
    corpus["dl"] = toks.map(len)
    corpus["tfsum"] = toks.map(
        lambda ts: float(sum(t in ("data", "model") for t in ts)))
    m = corpus[corpus["tfsum"] > 0].copy()
    m["score"] = idf * (m["tfsum"] / (
        m["tfsum"] + CFG.k1 * (1 - CFG.b + CFG.b * m["dl"] / avgdl)))
    exp = m.sort_values(["score", "conv_id", "turn_idx"],
                        ascending=[False, True, True],
                        kind="mergesort").head(10)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["turn_idx"].tolist() == exp["turn_idx"].tolist()
    assert np.allclose(got["score"], exp["score"], rtol=1e-12)
    # saturation: synonym score <= plain two-term disjunction score
    disj = s.search({"q": "data model"}, k=10)
    assert got["score"].iloc[0] <= disj["score"].iloc[0] + 1e-12
    # an all-unknown synonym group matches nothing
    empty = s.synonym_search({"q": "zzzz"}, {"zzzz": ["yyyy"]}, k=5)
    assert empty.empty


def test_stats_and_histogram_agg_match_brute(index):
    from opensearch_jvector_ray.query_dsl import execute_query
    s = IndexSearcher(index)
    queries = {"a": "data model search", "b": "zebra quantum nebula"}
    theta = 0.4
    hits = s.search(queries, min_score=theta)   # the exact match set
    # stats over turn_idx (a stored int column on the docs table)
    got = s.stats_agg(queries, value_col="turn_idx", min_score=theta)
    brute = hits.groupby("query_id")["turn_idx"].agg(
        doc_count="count", v_sum="sum", v_min="min", v_max="max"
    ).reset_index()
    brute["v_avg"] = brute["v_sum"].astype(np.float64) / brute["doc_count"]
    pd.testing.assert_frame_equal(got, brute[got.columns.tolist()],
                                  check_dtype=False)
    # histogram over turn_idx, interval 3
    goth = s.histogram_agg(queries, value_col="turn_idx", interval=3.0,
                           min_score=theta)
    hb = hits.copy()
    hb["bucket"] = (np.floor(hb["turn_idx"] / 3.0) * 3.0).astype(np.int64)
    bruteh = (hb.groupby(["query_id", "bucket"]).size()
                .rename("doc_count").reset_index()
                .sort_values(["query_id", "bucket"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(goth, bruteh, check_dtype=False)
    with pytest.raises(ValueError):
        s.histogram_agg(queries, value_col="turn_idx", interval=0,
                        min_score=theta)
    # DSL equivalence
    d1 = execute_query({"stats_agg": {"query": queries["a"],
                                      "field": "turn_idx",
                                      "min_score": theta}}, searcher=s)
    exp1 = s.stats_agg({"q": queries["a"]}, value_col="turn_idx",
                       min_score=theta)
    pd.testing.assert_frame_equal(d1, exp1)
    d2 = execute_query({"histogram": {"query": queries["a"],
                                      "field": "turn_idx", "interval": 3,
                                      "min_score": theta}}, searcher=s)
    exp2 = s.histogram_agg({"q": queries["a"]}, value_col="turn_idx",
                           interval=3, min_score=theta)
    pd.testing.assert_frame_equal(d2, exp2)


def test_query_dsl_boost_synonym_clauses(index):
    from opensearch_jvector_ray.query_dsl import execute_query
    s = IndexSearcher(index)
    got = execute_query({"query_string": {"query": "data^2 model", "k": 5}},
                        searcher=s)
    exp = s.boosted_search({"q": "data^2 model"}, k=5)
    pd.testing.assert_frame_equal(got, exp)
    syn = {"data": ["model"]}
    got = execute_query({"synonyms": {"query": "data", "map": syn, "k": 5}},
                        searcher=s)
    exp = s.synonym_search({"q": "data"}, syn, k=5)
    pd.testing.assert_frame_equal(got, exp)


def test_phrase_prefix_degenerate_identities(index):
    from opensearch_jvector_ray.query_dsl import execute_query
    s = IndexSearcher(index)
    # single-token prefix, max_expansions=1 -> the plain single-term
    # search for the top-df expansion (tf over one term, same idf)
    top = s.expand_prefix("mo", 1)[0]
    got = s.phrase_prefix_search({"q": "mo"}, k=6, max_expansions=1)
    exp = s.search({"q": top}, k=6)
    pd.testing.assert_frame_equal(got, exp)
    # multi-token with max_expansions=1 -> exact phrase with the top
    # expansion substituted
    got2 = s.phrase_prefix_search({"q": f"data {top[:3]}"}, k=6,
                                  max_expansions=1)
    top2 = s.expand_prefix(top[:3], 1)[0]
    exp2 = s.search({"q": f"data {top2}"}, k=6, mode="phrase")
    pd.testing.assert_frame_equal(got2, exp2)
    # unknown literal or empty expansion -> no hits
    assert s.phrase_prefix_search({"q": "zzzzz mo"}, k=5).empty
    assert s.phrase_prefix_search({"q": "data zzzzz"}, k=5).empty
    # DSL equivalence
    d = execute_query({"match_phrase_prefix": {"query": "data mo",
                                               "k": 5}}, searcher=s)
    pd.testing.assert_frame_equal(
        d, s.phrase_prefix_search({"q": "data mo"}, k=5))


def test_rrf_fuse_brute(index):
    from opensearch_jvector_ray.pipelines.hybrid import rrf_fuse
    a = pd.DataFrame({"query_id": ["q"] * 3, "rank": [1, 2, 3],
                      "id": [10, 20, 30]})
    b = pd.DataFrame({"query_id": ["q"] * 3, "rank": [1, 2, 3],
                      "id": [20, 40, 10]})
    got = rrf_fuse([a, b], "id", k=10, k0=60.0)
    exp = {10: 1 / 61 + 1 / 63, 20: 1 / 62 + 1 / 61, 30: 1 / 63,
           40: 1 / 62}
    assert dict(zip(got["id"], got["score"])) == exp
    # doc 20 (ranks 2+1) beats doc 10 (ranks 1+3); singles trail
    assert got["id"].tolist() == [20, 10, 40, 30]
    assert got["rank"].tolist() == [1, 2, 3, 4]
    # ties break id-ascending: two docs with identical rank profiles
    c = pd.DataFrame({"query_id": ["q"] * 2, "rank": [1, 2],
                      "id": [7, 3]})
    d = pd.DataFrame({"query_id": ["q"] * 2, "rank": [2, 1],
                      "id": [7, 3]})
    t = rrf_fuse([c, d], "id", k=10)
    assert t["id"].tolist() == [3, 7]       # equal scores, id asc


def test_hybrid_search_composes_engines(index):
    from opensearch_jvector_ray.pipelines.hybrid import rrf_fuse
    import pyarrow as pa
    import ray.data as rd
    from opensearch_jvector_ray.pipelines.knn import brute_force_topk
    s = IndexSearcher(index)
    rng = np.random.default_rng(5)
    n, d = 120, 8
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([rng.standard_normal(d).tolist()
                               for _ in range(n)],
                              type=pa.list_(pa.float32())),
    }))
    # keys in this index are (conv_id, turn_idx); hybrid assumes a
    # single shared id — fuse manually against the engine's own outputs
    qvec = rng.standard_normal(d)
    texts = {"q": "data model"}
    bm25 = s.search(texts, k=15)
    bm25_ids = bm25.assign(id=bm25["conv_id"] + ":"
                           + bm25["turn_idx"].astype(str))
    knn = brute_force_topk(emb, {"q": qvec}, 15, round_decimals=6)
    knn_ids = knn.rename(columns={"vec_id": "id"})
    fused = rrf_fuse([bm25_ids[["query_id", "rank", "id"]]
                      .assign(id=lambda x: x["id"].astype(str)),
                      knn_ids[["query_id", "rank", "id"]]
                      .assign(id=lambda x: x["id"].astype(str))],
                     "id", k=10)
    assert len(fused) == 10
    assert fused["score"].is_monotonic_decreasing


def test_serve_term_weights_matches_cold_path(index):
    from opensearch_jvector_ray.query import IndexSearcher as IS
    from opensearch_jvector_ray.serve import SearchService
    s = IS(index)
    lits, prefixes = parse_prefix_query("dat* model", s.cfg)
    weights: dict[str, float] = {t: float(c) for t, c in lits}
    order = [t for t, _ in lits]
    for p in prefixes:
        for t in s.expand_prefix(p, 10):
            if t not in weights:
                order.append(t)
                weights[t] = 0.0
            weights[t] += 1.0
    tw = {"q": [(t, weights[t]) for t in order]}
    cold = s.search({"q": ""}, k=8, term_weights=tw)
    svc = SearchService(index, num_shards=2)
    try:
        warm = svc.search({"q": ""}, k=8, term_weights=tw)
    finally:
        svc.shutdown()
    pd.testing.assert_frame_equal(warm, cold)
    assert len(warm) == 8


def test_facet_counts_matches_brute(index):
    s = IndexSearcher(index)
    queries = {"a": "data model search", "b": "zebra quantum nebula"}
    theta = 0.4
    got = s.facet_counts(queries, facet_col="role", min_score=theta)
    hits = s.search(queries, min_score=theta)
    docs = s._fetch_doc_fields(hits)[["conv_id", "turn_idx", "role"]]
    brute = (hits.merge(docs.drop_duplicates(), on=["conv_id", "turn_idx"])
                 .groupby(["query_id", "role"]).size()
                 .rename("doc_count").reset_index())
    brute = brute.sort_values(["query_id", "doc_count", "role"],
                              ascending=[True, False, True],
                              kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, brute[["query_id", "role", "doc_count"]],
        check_dtype=False)
    # size cap keeps the top buckets per query
    capped = s.facet_counts(queries, facet_col="role", min_score=theta,
                            size=1)
    assert (capped.groupby("query_id").size() <= 1).all()
    top = got.groupby("query_id").head(1).reset_index(drop=True)
    pd.testing.assert_frame_equal(capped.reset_index(drop=True), top,
                                  check_dtype=False)
    with pytest.raises(ValueError):
        s.facet_counts(queries, facet_col="nope", min_score=theta)


def test_linear_fuse_brute(index):
    from opensearch_jvector_ray.pipelines.hybrid import linear_fuse
    a = pd.DataFrame({"query_id": ["q"] * 3, "id": [10, 20, 30],
                      "score": [4.0, 2.0, 1.0]})
    b = pd.DataFrame({"query_id": ["q"] * 3, "id": [20, 40, 10],
                      "score": [0.9, 0.6, 0.3]})
    got = linear_fuse([a, b], "id", k=10, weights=(2.0, 1.0))
    # a: min 1 max 4 -> n = (s-1)/3; b: min .3 max .9 -> n = (s-.3)/.6
    exp = {10: 2.0 * (3 / 3) + (0.3 - 0.3) / 0.6,
           20: 2.0 * (1 / 3) + (0.9 - 0.3) / 0.6,
           30: 2.0 * 0.0, 40: (0.6 - 0.3) / 0.6}
    assert dict(zip(got["id"], got["score"])) == pytest.approx(exp)
    assert got["id"].tolist() == [10, 20, 40, 30]
    # degenerate list (max == min) normalizes to 1.0
    c = pd.DataFrame({"query_id": ["q"] * 2, "id": [1, 2],
                      "score": [5.0, 5.0]})
    t = linear_fuse([c], "id", k=10)
    assert t["score"].tolist() == [1.0, 1.0]
    assert t["id"].tolist() == [1, 2]       # equal scores, id asc
    with pytest.raises(ValueError, match="weights"):
        linear_fuse([a, b], "id", k=10, weights=(1.0,))
