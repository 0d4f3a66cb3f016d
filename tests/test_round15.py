"""Round-4 fifth continuation: dictionary generations (publish-then-
point) and point-in-time search.  The hard DuckDB gate is the driver
entry ``pit_search``; these tests cover the liveness/immutability rules
the gate can't see (legacy flat layout, live-vs-pinned divergence,
generation monotonicity)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as ppq
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import (
    IndexSpec, add_segments, build_index,
)
from opensearch_jvector_ray.state.manifest import (
    dict_generations, dict_read_paths, resolve_dict_dir,
)
from opensearch_jvector_ray.synth import generate_conversations

CFG = EngineConfig(num_segments=3)
QUERIES = {"q1": "tool call", "q2": "the user asks"}


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pit") / "idx")
    build_index(rd.from_arrow(generate_conversations(np.arange(150))),
                d, CFG, IndexSpec())
    return d


def _extra(lo: int, hi: int) -> pa.Table:
    return generate_conversations(np.arange(lo, hi))


def test_build_publishes_generation_one(idx):
    assert dict_generations(idx) == [1]
    resolved = resolve_dict_dir(idx)
    assert os.path.basename(resolved) == "g0000000001"
    # generation dirs are read whole
    assert dict_read_paths(resolved) == resolved


def test_append_publishes_new_generation_keeps_old(idx, tmp_path):
    import shutil
    d = str(tmp_path / "copy")
    shutil.copytree(idx, d)
    old = resolve_dict_dir(d)
    old_tbl = ppq.read_table(old).to_pandas()
    add_segments(d, rd.from_arrow(_extra(150, 200)))
    assert dict_generations(d) == [1, 2]
    # the old generation's content is untouched (immutability)
    pd.testing.assert_frame_equal(
        ppq.read_table(old).to_pandas(), old_tbl)
    # new readers bind the refreshed generation
    new_tbl = ppq.read_table(resolve_dict_dir(d)).to_pandas()
    assert new_tbl["df"].sum() > old_tbl["df"].sum()


def test_pit_search_pins_pre_append_ranking(idx, tmp_path):
    import shutil
    d = str(tmp_path / "copy")
    shutil.copytree(idx, d)
    s = IndexSearcher(d)
    before = s.search(QUERIES, k=8).reset_index(drop=True)
    pit = s.open_pit()
    # appended docs contain the query vocabulary — they'd crack rankings
    extra = _extra(150, 220)
    extra = extra.set_column(
        extra.column_names.index("text"), "text",
        pa.array([t + " tool call user asks"
                  for t in extra["text"].to_pylist()], type=pa.string()))
    add_segments(d, rd.from_arrow(extra))
    after_pit = IndexSearcher(d, pit=pit).search(QUERIES, k=8) \
        .reset_index(drop=True)
    after_live = IndexSearcher(d).search(QUERIES, k=8) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(after_pit, before)
    assert not after_live.equals(before)


def test_pit_rejects_foreign_config(idx, tmp_path):
    d = str(tmp_path / "other")
    build_index(rd.from_arrow(generate_conversations(np.arange(30))),
                d, EngineConfig(num_segments=2, k1=0.9), IndexSpec())
    pit = IndexSearcher(d).open_pit()
    with pytest.raises(ValueError, match="different index config"):
        IndexSearcher(idx, pit=pit)


def test_reindex_equals_fresh_build_over_selection(idx, tmp_path):
    """reindex(query, transform, dst_cfg) ranks identically to a fresh
    build under dst_cfg over the manually filtered+transformed corpus."""
    import pyarrow.compute as pc

    from opensearch_jvector_ray.stages.merge import reindex
    src_tbl = generate_conversations(np.arange(150))
    sel_q = {"s": "tool call"}

    def upper_marker(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        out = pc.binary_join_element_wise(
            t, pa.array(["reindexed"] * batch.num_rows), " ")
        return batch.set_column(batch.column_names.index("text"),
                                "text", out)

    dst_cfg = EngineConfig(num_segments=2, stemmer="minimal_english")
    d1 = str(tmp_path / "re")
    n = reindex(idx, d1, rd.from_arrow(src_tbl), dst_cfg=dst_cfg,
                queries=sel_q, min_score=0.3, transform=upper_marker)
    assert 0 < n < src_tbl.num_rows

    # manual equivalent
    hits = IndexSearcher(idx).search(sel_q, min_score=0.3)
    keys = {(r.conv_id, r.turn_idx) for r in hits.itertuples()}
    mask = [(src_tbl["conv_id"][i].as_py(), src_tbl["turn_idx"][i].as_py())
            in keys for i in range(src_tbl.num_rows)]
    manual = upper_marker(src_tbl.filter(pa.array(mask)))
    d2 = str(tmp_path / "fresh")
    build_index(rd.from_arrow(manual), d2, dst_cfg, IndexSpec())

    q = {"q1": "reindexed tools", "q2": "the user asks"}
    a = IndexSearcher(d1).search(q, k=10).reset_index(drop=True)
    b = IndexSearcher(d2).search(q, k=10).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_reindex_no_query_copies_everything(idx, tmp_path):
    from opensearch_jvector_ray.stages.merge import reindex
    src_tbl = generate_conversations(np.arange(150))
    d = str(tmp_path / "full")
    n = reindex(idx, d, rd.from_arrow(src_tbl))
    assert n == src_tbl.num_rows
    q = {"q": "tool call"}
    pd.testing.assert_frame_equal(
        IndexSearcher(d).search(q, k=10).reset_index(drop=True),
        IndexSearcher(idx).search(q, k=10).reset_index(drop=True))


def test_mget_requested_order_and_found_flag(idx):
    s = IndexSearcher(idx)
    keys = [("conv-0000002", 1), ("conv-9999999", 0), ("conv-0000000", 0)]
    out = s.mget(keys)
    assert list(zip(out["conv_id"], out["turn_idx"])) == keys
    assert out["found"].tolist() == [True, False, True]
    assert "doc_len" in out.columns
    assert out.loc[1, "doc_len"] != out.loc[1, "doc_len"] or \
        pd.isna(out.loc[1, "doc_len"])


def test_mget_many_segment_fanout(tmp_path):
    """>16 segments takes the Ray-task fan-out path (driver-serial
    reads would pay O(segments) latency); results identical."""
    d = str(tmp_path / "many")
    build_index(rd.from_arrow(generate_conversations(np.arange(300))),
                d, EngineConfig(num_segments=20), IndexSpec())
    s = IndexSearcher(d)
    assert len(s.seg_dirs) > 16
    keys = [("conv-0000002", 1), ("conv-9999999", 0),
            ("conv-0000000", 0)]
    out = s.mget(keys)
    assert out["found"].tolist() == [True, False, True]
    assert list(zip(out["conv_id"], out["turn_idx"])) == keys


def test_field_stats_matches_brute_force(idx):
    s = IndexSearcher(idx)
    out = s.field_stats(["role", "doc_len"]).set_index("field")
    tbl = generate_conversations(np.arange(150))
    roles = sorted(tbl["role"].to_pylist())
    assert out.loc["role", "min_value"] == roles[0]
    assert out.loc["role", "max_value"] == roles[-1]
    assert out.loc["role", "doc_count"] == tbl.num_rows
    assert out.loc["role", "type"] == "string"
    assert out.loc["doc_len", "type"].startswith("int")
    # numeric min/max render without a decimal point
    assert "." not in out.loc["doc_len", "max_value"]


def test_sparse_vector_linear_tf_rule(idx):
    """score = sum(weight * tf) — brute force over the synthetic corpus
    (stopwords removed by the analyzer; query tokens are literal
    vocabulary forms)."""
    from opensearch_jvector_ray.analyze import tokenize
    s = IndexSearcher(idx)
    tbl = generate_conversations(np.arange(150))
    stream = tokenize(tbl["text"].combine_chunks(), s.cfg)
    terms = stream.terms.to_numpy(zero_copy_only=False)
    doc_of = stream.doc_idx
    q = [("tool", 3.0), ("user", 1.0), ("call", 2.0)]
    gold = {}
    for i in range(tbl.num_rows):
        toks = terms[doc_of == i].tolist()
        sc = sum(w * toks.count(t) for t, w in q)
        if sc > 0:
            gold[(tbl["conv_id"][i].as_py(),
                  tbl["turn_idx"][i].as_py())] = sc
    top = sorted(gold.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = s.sparse_vector_search({"q": q}, k=10)
    assert [((r.conv_id, r.turn_idx), r.score)
            for r in out.itertuples()] == [(k, v) for k, v in top]


def test_sparse_vector_dsl_identity(idx):
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    s = IndexSearcher(idx)
    body = {"sparse_vector":
            {"tokens": {"tool": 2.0, "call": 1.0}, "k": 5}}
    parse_query(body)            # strict parse succeeds
    a = execute_query(body, searcher=s, query_id="q")
    b = s.sparse_vector_search({"q": [("tool", 2.0), ("call", 1.0)]}, k=5)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_sparse_vector_rejects_conflicts(idx):
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="linear_tf"):
        s.search({"q": "tool"}, k=5, score_mode="linear_tf",
                 rescore_oversample=3.0)
    with pytest.raises(ValueError, match="score_mode"):
        s.search({"q": "tool"}, k=5, score_mode="nope")


def test_count_api_equals_match_set_size(idx):
    s = IndexSearcher(idx)
    q = {"q1": "tool call", "q2": "zzzznomatch"}
    out = s.count(q).set_index("query_id")
    radial = s.search({"q1": "tool call"}, min_score=1e-12)
    assert out.loc["q1", "doc_count"] == len(radial)
    assert out.loc["q2", "doc_count"] == 0


def test_alias_lifecycle_and_filtered_search(idx):
    from opensearch_jvector_ray.aliases import (
        delete_alias, get_aliases, put_alias, search_alias,
    )
    from opensearch_jvector_ray.query_dsl import compile_filter
    spec = {"terms": {"role": ["assistant"]}}
    put_alias(idx, "assistants", spec)
    assert "assistants" in get_aliases(idx)
    a = search_alias(idx, "assistants", {"q": "tool call"}, k=8)
    b = IndexSearcher(idx).search({"q": "tool call"}, k=8,
                                  filter=compile_filter(spec))
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    with pytest.raises(ValueError):
        search_alias(idx, "assistants", {"q": "x"},
                     filter=compile_filter(spec))
    with pytest.raises(ValueError):
        put_alias(idx, "bad", {"nope": {}})
    delete_alias(idx, "assistants")
    with pytest.raises(KeyError):
        search_alias(idx, "assistants", {"q": "x"})


def test_tdigest_accuracy_and_merge_invariance():
    from opensearch_jvector_ray.functions import tdigest as td
    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.2, 60_000)
    comp = 200.0
    whole = td.from_values(vals, comp)
    # centroids bounded by O(compression)
    assert len(whole[0]) <= 2 * comp
    # merged-from-8-parts sketch stays within the k1 rank-error bound
    parts = [td.from_values(c, comp) for c in np.array_split(vals, 8)]
    m, w = td.merge(parts, comp)
    sv = np.sort(vals)
    for p in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = td.quantile(m, w, p)
        # rank error: where the estimate falls in the true CDF
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - p) < 0.01, (p, est, rank)
    # partial arrival order is irrelevant (total-order centroid sort)
    m2, w2 = td.merge(list(reversed(parts)), comp)
    assert np.array_equal(m, m2) and np.array_equal(w, w2)


def test_tdigest_agg_tracks_exact_percentiles(idx):
    s = IndexSearcher(idx)
    q = {"q": "tool call"}
    approx = s.tdigest_percentiles_agg(q, "doc_len", [0.5],
                                       min_score=0.0)
    exact = s.percentiles_agg(q, "doc_len", [0.5], min_score=0.0)
    a = float(approx["value"][0])
    e = float(exact["value"][0])
    assert abs(a - e) <= max(1.0, 0.1 * e)


def test_script_fields_arithmetic_and_validation(idx):
    s = IndexSearcher(idx)
    hits = s.search({"q": "tool call"}, k=8)
    out = s.script_fields(hits, {
        "ratio": {"op": "div", "left": "doc_len", "right": "turn_idx"},
        "twice": {"op": "mul", "left": "doc_len", "right": 2},
        "shift": {"op": "add", "left": "turn_idx", "right": 1},
    })
    fields = s._fetch_doc_fields(hits).set_index(
        ["conv_id", "turn_idx"])
    for r in out.itertuples():
        dl = fields.loc[(r.conv_id, r.turn_idx), "doc_len"]
        assert r.twice == 2 * dl
        assert r.shift == r.turn_idx + 1
    assert out["twice"].dtype == np.int64
    assert out["ratio"].dtype == np.float64
    with pytest.raises(ValueError, match="op must be"):
        s.script_fields(hits, {"x": {"op": "pow", "left": 1,
                                     "right": 2}})
    with pytest.raises(ValueError, match="stored column"):
        s.script_fields(hits, {"x": {"op": "add", "left": "nope",
                                     "right": 1}})


def test_terms_lookup_distinct_sorted(tmp_path):
    p = str(tmp_path / "lk.parquet")
    ppq.write_table(pa.table({"k": [1, 1, 1, 2],
                              "v": ["b", "a", "b", "z"]}), p)
    assert IndexSearcher.terms_lookup(p, "k", 1, "v") == ["a", "b"]
    assert IndexSearcher.terms_lookup(p, "k", 9, "v") == []


def test_dedup_against_drops_only_seen_fingerprints():
    from opensearch_jvector_ray.pipelines.dedup import dedup_against
    from opensearch_jvector_ray.pipelines.textstats import (
        fingerprint_stage,
    )
    cfg = EngineConfig()
    prior = pa.table({"doc_id": [1, 2],
                      "text": ["Hello, World!", "other doc here"]})
    fps = fingerprint_stage(cfg, "doc_id", "text")(prior)[
        "fingerprint"].to_pylist()
    # 'hello  world' normalizes identically to 'Hello, World!' —
    # punctuation/whitespace-insensitive fingerprint rule
    new = pa.table({"doc_id": [10, 11, 12],
                    "text": ["hello  world", "brand new text",
                             "other doc here"]})
    out = dedup_against(rd.from_arrow(new), fps, cfg,
                        "doc_id", "text").to_pandas()
    assert sorted(out["doc_id"]) == [11]


def test_mget_found_true_for_null_store_value(tmp_path):
    """found reflects KEY presence, not null-ness of a stored column."""
    tbl = generate_conversations(np.arange(20))
    role = tbl["role"].to_pylist()
    role[0] = None
    tbl = tbl.set_column(tbl.column_names.index("role"), "role",
                         pa.array(role, type=pa.string()))
    d = str(tmp_path / "nullstore")
    build_index(rd.from_arrow(tbl), d, EngineConfig(num_segments=2),
                IndexSpec())
    s = IndexSearcher(d)
    key = (tbl["conv_id"][0].as_py(), tbl["turn_idx"][0].as_py())
    out = s.mget([key])
    assert out["found"].tolist() == [True]
    assert pd.isna(out["role"][0])


def test_script_fields_tolerates_reappended_duplicate_keys(idx,
                                                           tmp_path):
    import shutil
    d = str(tmp_path / "dup")
    shutil.copytree(idx, d)
    add_segments(d, rd.from_arrow(generate_conversations(
        np.arange(150))))          # same keys again (add-without-delete)
    s = IndexSearcher(d)
    hits = s.search({"q": "tool call"}, k=8)
    out = s.script_fields(hits, {"twice": {"op": "mul",
                                           "left": "doc_len",
                                           "right": 2}})
    assert len(out) == len(hits)


def test_sparse_vector_rejects_nonpositive_weights(idx):
    from opensearch_jvector_ray.query_dsl import parse_query
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="> 0"):
        s.sparse_vector_search({"q": [("tool", 0.0)]}, k=5)
    with pytest.raises(ValueError, match="> 0"):
        parse_query({"sparse_vector": {"tokens": {"tool": -1.0}}})


def test_field_stats_halffloat_combines_numerically(tmp_path):
    """A float16 stored column must take the NUMERIC combine branch —
    lexicographic string min/max would invert '10.5' vs '9.5'."""
    from opensearch_jvector_ray.query import _field_stats_task
    seg = tmp_path / "seg"
    seg.mkdir()
    ppq.write_table(
        pa.table({"h": pa.array(np.array([9.5, 10.5], dtype=np.float16),
                                type=pa.float16())}),
        str(seg / "docs.parquet"))
    out = _field_stats_task(
        pa.table({"seg_dir": [str(seg)]}), ["h"]).to_pandas()
    assert bool(out["is_num"][0])
    assert out["min_num"][0] == 9.5 and out["max_num"][0] == 10.5


def test_null_text_rows_survive_corpus_and_dedup_paths():
    from opensearch_jvector_ray.pipelines.corpus import (
        bpe_merge_candidates, pretoken_counts,
    )
    from opensearch_jvector_ray.pipelines.dedup import dedup_against
    cfg = EngineConfig()
    tbl = pa.table({"doc_id": [1, 2, 3],
                    "text": ["ab ab", None, "cd"]})
    pc_out = pretoken_counts(rd.from_arrow(tbl))
    assert int(pc_out[pc_out["token"] == "ab"]["cnt"].iloc[0]) == 2
    assert len(bpe_merge_candidates(rd.from_arrow(tbl), top_k=3)) >= 1
    out = dedup_against(rd.from_arrow(tbl), ["nothex", None], cfg,
                        "doc_id", "text").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]   # NULL text kept


def test_events_funnel_chained_min_rule():
    from opensearch_jvector_ray.pipelines.relational import (
        events_funnel,
    )
    base = np.datetime64("2025-01-01T00:00:00", "us")
    us = lambda n: base + np.timedelta64(n, "s")  # noqa: E731
    tbl = pa.table({
        "user_id": [1, 1, 1, 2, 2, 2, 3, 4, 4],
        "event_type": ["view", "click", "purchase",    # full funnel
                       "click", "view", "purchase",    # click BEFORE
                       "view",                         # view only
                       "purchase", "view"],            # purchase first
        "ts": pa.array([us(0), us(1), us(2),
                        us(0), us(1), us(2),
                        us(0), us(0), us(1)],
                       type=pa.timestamp("us")),
    })
    out = events_funnel(rd.from_arrow(tbl),
                        ["view", "click", "purchase"],
                        num_parts=2).to_pandas()
    got = dict(zip(out["user_id"], out["steps_completed"]))
    # user 2's click precedes the first view -> only step 1; user 2's
    # purchase is after view but click never qualifies, so chain stops
    assert got == {1: 3, 2: 1, 3: 1, 4: 1}
    with pytest.raises(ValueError):
        events_funnel(rd.from_arrow(tbl), [])
    # string keys + an all-empty bucket: empty frames inherit dtype
    tbl2 = pa.table({"sid": ["a", "a", "zz"],
                     "event_type": ["view", "click", "error"],
                     "ts": pa.array([us(0), us(1), us(0)],
                                    type=pa.timestamp("us"))})
    out2 = events_funnel(rd.from_arrow(tbl2),
                         ["view", "click"], key_col="sid",
                         num_parts=4).to_pandas()
    assert dict(zip(out2["sid"], out2["steps_completed"])) == {"a": 2}


def test_tool_transitions_skip_rule():
    from opensearch_jvector_ray.pipelines.transcripts import (
        tool_transitions,
    )
    tbl = pa.table({
        "conv_id": ["a"] * 5 + ["b"] * 2,
        "turn_idx": [0, 1, 2, 3, 4, 0, 1],
        "tool": ["s", "", "g", None, "s", "g", "g"],
    })
    out = tool_transitions(rd.from_arrow(tbl), num_parts=2) \
        .to_pandas().sort_values(["prev_tool", "tool"]) \
        .reset_index(drop=True)
    # conv a tool subsequence: s -> g -> s (blank/None SKIPPED, not a
    # break); conv b: g -> g
    got = {(r.prev_tool, r.tool): r.n_transitions
           for r in out.itertuples()}
    assert got == {("s", "g"): 1, ("g", "s"): 1, ("g", "g"): 1}


def test_response_latency_rules():
    from opensearch_jvector_ray.pipelines.transcripts import (
        response_latency,
    )
    base = np.datetime64("2025-01-01T00:00:00", "us")
    tbl = pa.table({
        "conv_id": ["a"] * 4 + ["b"] * 2,
        "turn_idx": [0, 1, 2, 3, 0, 1],
        "role": ["user", "assistant", "tool", "assistant",
                 "assistant", "user"],
        "ts": pa.array([base, base + 1_500_000, base + 2_000_000,
                        base + 2_250_000, base, base + 99],
                       type=pa.timestamp("us")),
    })
    out = response_latency(rd.from_arrow(tbl), num_parts=2).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # only turns whose PREVIOUS turn is a user turn qualify: a/1 only
    # (a/2 follows assistant, a/3 follows tool, b/0 is first, b/1
    # follows assistant)
    assert list(zip(out["conv_id"], out["turn_idx"],
                    out["latency_us"])) == [("a", 1, 1_500_000)]


def test_misra_gries_bounds_and_merge_invariance():
    from opensearch_jvector_ray.functions import heavyhitters as hh
    rng = np.random.default_rng(3)
    # Zipf-ish: value i appears ~ N / (i+1)
    vals = np.concatenate([np.full(20000 // (i + 1), f"v{i:03d}")
                           for i in range(200)])
    rng.shuffle(vals)
    cap = 64
    parts = [hh.mg_from_values(c, cap) for c in np.array_split(vals, 7)]
    merged = hh.mg_merge(parts, cap)
    assert len(merged) <= cap
    true = pd.Series(vals).value_counts()
    err = len(vals) // (cap + 1)
    for v, est in merged.items():
        t = int(true[v])
        assert t - err <= est <= t, (v, est, t, err)
    # every value with true count > N/(cap+1) is present
    for v, t in true.items():
        if t > err:
            assert v in merged, (v, t, err)
    # merge is arrival-order-free
    merged2 = hh.mg_merge(list(reversed(parts)), cap)
    assert merged == merged2
    # guaranteed buckets are truly in the top-k
    top = hh.mg_topk(merged, 10, len(vals), cap)
    true_top10 = set(true.sort_values(ascending=False).index[:10])
    for r in top.itertuples():
        if r.guaranteed:
            assert r.value in true_top10


def test_misra_gries_native_numeric_values():
    """Non-string fields keep native dtype and NUMERIC tie order —
    stringified keys would rank '10' < '2' lexicographically."""
    from opensearch_jvector_ray.functions import heavyhitters as hh
    vals = np.array([1, 2, 2, 10, 10, 10, 7], dtype=np.int64)
    summ = hh.mg_from_values(vals, 8)
    assert summ == {1: 1, 2: 2, 10: 3, 7: 1}
    assert all(isinstance(v, int) for v in summ)
    # count-tied values 2 and 10 (both 2 after an extra 10-drop):
    # numeric asc keeps 2 before 10 under capacity pressure
    tied = hh._trim({2: 5, 10: 5, 99: 1}, 2)
    assert list(tied) == [2, 10]
    top = hh.mg_topk({2: 5, 10: 5}, 2, 10, 8)
    assert top["value"].tolist() == [2, 10]


def test_approx_terms_agg_matches_exact_on_low_cardinality(idx):
    s = IndexSearcher(idx)
    q = {"q": "tool call"}
    approx = s.approx_terms_agg(q, field="role", min_score=0.3,
                                size=5, capacity=512)
    exact = s.facet_counts(q, facet_col="role", min_score=0.3, size=5)
    # capacity >> cardinality: counts are exact and guaranteed
    a = dict(zip(approx["value"], approx["count_lower"]))
    e = dict(zip(exact["role"], exact["doc_count"]))
    assert a == e
    assert approx["guaranteed"].all() or len(a) <= 1


def test_rank_features_sum_order_and_validation(idx):
    s = IndexSearcher(idx)
    spec = {"kind": "sum", "features": [
        {"kind": "saturation", "field": "doc_len", "pivot": 10.0,
         "boost": 0.5},
        {"kind": "distance", "field": "turn_idx", "origin": 2.0,
         "pivot": 1.0, "boost": 0.25},
    ]}
    out = s.search({"q": "tool call"}, k=8, rank_feature=spec)
    base = s.search({"q": "tool call"}, min_score=1e-12)  # all matches
    f1 = s.search({"q": "tool call"}, k=50,
                  rank_feature=spec["features"][0])
    # the summed addend equals applying each feature's delta: check one
    # hit's score = base + d1 + d2 computed from stored fields
    fields = s._fetch_doc_fields(out).set_index(["conv_id",
                                                 "turn_idx"])
    bmap = {(r.conv_id, r.turn_idx): r.score for r in base.itertuples()}
    for r in out.itertuples():
        dl = float(fields.loc[(r.conv_id, r.turn_idx), "doc_len"])
        d1 = 0.5 * (dl / (dl + 10.0))
        d2 = 0.25 * (1.0 / (1.0 + abs(float(r.turn_idx) - 2.0)))
        assert abs(r.score - (bmap[(r.conv_id, r.turn_idx)]
                              + d1 + d2)) < 1e-9
    assert not f1.equals(out)
    with pytest.raises(ValueError, match="nest"):
        s.search({"q": "tool"}, k=3, rank_feature={
            "kind": "sum", "features": [spec]})
    with pytest.raises(ValueError, match="features"):
        s.search({"q": "tool"}, k=3, rank_feature={
            "kind": "sum", "features": []})


def test_validate_query_api():
    from opensearch_jvector_ray.query_dsl import validate_query
    ok = validate_query({"match": {"query": "alpha beta", "k": 5}})
    assert ok["valid"] and ok["explanation"]["type"] == "match"
    bad = validate_query({"match": {"query": ""}})
    assert not bad["valid"] and "query" in bad["explanation"]
    bad2 = validate_query({"nope": {}})
    assert not bad2["valid"] and "unknown query clause" in         bad2["explanation"]


def test_search_pipeline_processors(idx):
    from opensearch_jvector_ray.query_dsl import compile_filter
    from opensearch_jvector_ray.search_pipeline import (
        compile_search_pipeline, run_search,
    )
    s = IndexSearcher(idx)
    pipe = compile_search_pipeline({
        "request": [{"filter_query":
                     {"filter": {"terms": {"role": ["assistant"]}}}},
                    {"oversample": {"factor": 2.0}}],
        "response": [{"truncate_hits": {"size": 3}},
                     {"rename_field": {"field": "score",
                                       "target_field": "relevance"}}],
    })
    out = run_search(s, {"q": "tool call"}, 6, pipe)
    manual = s.search({"q": "tool call"}, k=12,
                      filter=compile_filter(
                          {"terms": {"role": ["assistant"]}}))
    manual = manual.groupby("query_id", sort=False).head(3) \
        .reset_index(drop=True)
    manual["rank"] = manual.groupby("query_id", sort=False) \
        .cumcount() + 1
    manual = manual.rename(columns={"score": "relevance"})
    pd.testing.assert_frame_equal(out, manual)
    # collapse keeps the best hit per value
    pipe2 = compile_search_pipeline(
        {"response": [{"collapse": {"field": "conv_id"}}]})
    c = run_search(s, {"q": "tool call"}, 10, pipe2)
    assert c.groupby(["query_id", "conv_id"]).size().max() == 1
    # strict validation
    for bad in ({}, {"request": [{"nope": {}}]},
                {"request": [{"oversample": {"factor": 0.5}}]},
                {"request": [{"oversample": {"factor": float("nan")}}]},
                {"request": None},
                {"response": [{"truncate_hits": {"size": 0}}]},
                {"response": [{"rename_field":
                               {"field": "query_id",
                                "target_field": "qid"}}]},
                {"request": [{"filter_query": {"filter":
                                               {"bogus": {}}}}]}):
        with pytest.raises(ValueError):
            compile_search_pipeline(bad)
    with pytest.raises(ValueError, match="filter"):
        run_search(s, {"q": "x"}, 5, pipe,
                   filter=compile_filter(
                       {"terms": {"role": ["user"]}}))


def test_new_dsl_clauses_identity(idx):
    """Each round-15 DSL clause routes to its engine method with
    frame identity."""
    from opensearch_jvector_ray.query_dsl import execute_query
    s = IndexSearcher(idx)
    cases = [
        ({"count": {"query": "tool call"}},
         s.count({"q": "tool call"})),
        ({"mget": {"keys": [["conv-0000001", 0]]}},
         s.mget([("conv-0000001", 0)])),
        ({"field_stats": {"fields": ["role"]}},
         s.field_stats(["role"])),
        ({"children_agg": {"parents": ["conv-0000001",
                                       "conv-0000002"],
                           "field": "tool"}},
         s.children_terms_agg({"q": ["conv-0000001",
                                     "conv-0000002"]}, field="tool")),
        ({"percentiles_approx": {"query": "tool call",
                                 "field": "doc_len",
                                 "percents": [0.5]}},
         s.tdigest_percentiles_agg({"q": "tool call"}, "doc_len",
                                   [0.5], min_score=0.0)),
        ({"terms_approx": {"query": "tool call", "field": "role",
                           "min_score": 0.3}},
         s.approx_terms_agg({"q": "tool call"}, field="role",
                            min_score=0.3)),
    ]
    for body, expect in cases:
        got = execute_query(body, searcher=s, query_id="q")
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      expect.reset_index(drop=True))
    # geo clause over an explicit coords Dataset
    from opensearch_jvector_ray.pipelines.geo import geo_distance_topk
    coords = pa.table({"event_id": np.arange(50, dtype=np.int64),
                       "lat": np.linspace(-60, 60, 50),
                       "lon": np.linspace(-150, 150, 50)})
    body = {"geo_distance": {"lat": 10.0, "lon": 20.0, "k": 5}}
    got = execute_query(body, vector_ds=rd.from_arrow(coords),
                        query_id="g")
    expect = geo_distance_topk(rd.from_arrow(coords),
                               {"g": (10.0, 20.0)}, 5)
    pd.testing.assert_frame_equal(got, expect)


def test_percolate_filter_context_rules():
    from opensearch_jvector_ray.pipelines.percolate import percolate
    cfg = EngineConfig()
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta", "alpha", "beta gamma", "the of"],
        "grade": [10, 50, 10, 10],
    })
    q = {"a": "alpha", "b": "beta", "c": "the of and"}
    f = {"a": {"range": {"grade": {"lt": 20}}},
         "c": {"range": {"grade": {"gte": 40}}}}
    out = percolate(rd.from_arrow(docs), q, cfg, match_mode="any",
                    filters=f).to_pandas()
    pairs = sorted(zip(out["doc_id"], out["query_id"]))
    # a: alpha docs with grade<20 -> doc 1 only (doc 2 filtered out)
    # b: unfiltered beta docs -> 1, 3
    # c: pure filter (all stopwords) -> grade>=40 -> doc 2
    assert pairs == [(1, "a"), (1, "b"), (2, "c"), (3, "b")]
    with pytest.raises(ValueError, match="unregistered"):
        percolate(rd.from_arrow(docs), q, cfg,
                  filters={"zz": {"range": {"grade": {"lt": 1}}}})


def test_vacuum_dictionary_keeps_newest(idx, tmp_path):
    import shutil

    from opensearch_jvector_ray.state.manifest import vacuum_dictionary
    d = str(tmp_path / "vac")
    shutil.copytree(idx, d)
    add_segments(d, rd.from_arrow(_extra(150, 170)))
    add_segments(d, rd.from_arrow(_extra(170, 190)),
                 lineage={"b": 2})
    gens = dict_generations(d)
    assert len(gens) >= 3
    before = IndexSearcher(d).search(QUERIES, k=8)
    dropped = vacuum_dictionary(d, keep=1)
    assert dropped == gens[:-1]
    assert dict_generations(d) == [gens[-1]]
    # current readers are unaffected
    pd.testing.assert_frame_equal(
        IndexSearcher(d).search(QUERIES, k=8).reset_index(drop=True),
        before.reset_index(drop=True))
    with pytest.raises(ValueError):
        vacuum_dictionary(d, keep=0)


def test_request_cache_hit_identity_and_refresh_invalidation(idx,
                                                             tmp_path):
    import shutil

    from opensearch_jvector_ray.serve import SearchService
    d = str(tmp_path / "svc")
    shutil.copytree(idx, d)
    svc = SearchService(d, num_shards=2)
    try:
        q = {"q": "tool call"}
        a = svc.search(q, k=8)
        assert svc.request_cache_stats()["misses"] == 1
        b = svc.search(q, k=8)
        st = svc.request_cache_stats()
        assert st["hits"] == 1
        pd.testing.assert_frame_equal(a, b)
        # a mutated result must not poison the cache (copies out/in)
        b.loc[0, "score"] = -1.0
        pd.testing.assert_frame_equal(svc.search(q, k=8), a)
        # different k = different key
        svc.search(q, k=5)
        assert svc.request_cache_stats()["misses"] == 2
        # refresh invalidates: appended docs change the result
        extra = generate_conversations(np.arange(150, 200))
        add_segments(d, rd.from_arrow(extra))
        svc.refresh()
        assert svc.request_cache_stats()["entries"] == 0
        c = svc.search(q, k=8)
        fresh = SearchService(d, num_shards=2)
        try:
            pd.testing.assert_frame_equal(c, fresh.search(q, k=8))
        finally:
            fresh.shutdown()
    finally:
        svc.shutdown()


def test_rollover_generations_and_resume(tmp_path):
    from opensearch_jvector_ray.aliases import RolloverWriter
    from opensearch_jvector_ray.stages.build import IndexSpec
    root = str(tmp_path / "roll")
    cfg = EngineConfig(num_segments=2)
    tbl = generate_conversations(np.arange(120))
    # search across generations requires a single key column
    # (indices_boost_search's doc_key rule)
    tbl = tbl.append_column(
        "row_id", pa.array(np.arange(tbl.num_rows, dtype=np.int64)))
    spec = IndexSpec(text_col="text", key_cols=("row_id",),
                     store_cols=(), ts_col="")
    w = RolloverWriter(root, cfg, spec, max_docs=300)
    n_rows = tbl.num_rows
    third = n_rows // 3
    w.append(rd.from_arrow(tbl.slice(0, third)), lineage={"c": 0})
    # re-opening the writer resumes the persisted generation
    w2 = RolloverWriter(root, cfg, spec, max_docs=300)
    assert w2.gen == w.gen
    w2.append(rd.from_arrow(tbl.slice(third, third)), lineage={"c": 1})
    w2.append(rd.from_arrow(tbl.slice(2 * third)), lineage={"c": 2})
    n1 = sum(1 for d in w2.indices())
    # every row landed exactly once across generations
    total = 0
    for d in w2.indices():
        from opensearch_jvector_ray.state.manifest import read_json
        total += int(read_json(os.path.join(d, "stats.json"))["n_docs"])
    assert total == n_rows and n1 >= 1
    out = w2.search({"q": "tool call"}, k=10)
    assert len(out) > 0 and set(out.columns) == {
        "query_id", "rank", "index", "doc_key", "score"}


def test_bloom_filter_no_false_negatives_and_fp_bound():
    import hashlib

    from opensearch_jvector_ray.pipelines.dedup import BloomFilter
    seen = [hashlib.md5(f"seen-{i}".encode()).hexdigest()
            for i in range(5000)]
    unseen = [hashlib.md5(f"unseen-{i}".encode()).hexdigest()
              for i in range(20000)]
    bf = BloomFilter.from_hexes(seen, fp_rate=0.01)
    assert bf.contains_hexes(seen).all()          # never a false keep
    fp = bf.contains_hexes(unseen).mean()
    assert fp < 0.03, fp                          # ~1% target, slack 3x


def test_dedup_against_bloom_matches_exact_on_seen():
    from opensearch_jvector_ray.pipelines.dedup import (
        BloomFilter, dedup_against, dedup_against_bloom,
    )
    from opensearch_jvector_ray.pipelines.textstats import (
        fingerprint_stage,
    )
    cfg = EngineConfig()
    prior = pa.table({"doc_id": list(range(50)),
                      "text": [f"prior document number {i}"
                               for i in range(50)]})
    fps = fingerprint_stage(cfg, "doc_id", "text")(prior)[
        "fingerprint"].to_pylist()
    new = pa.table({"doc_id": list(range(100, 160)),
                    "text": [f"prior document number {i}"
                             for i in range(30)]
                    + [f"genuinely new text {i}" for i in range(30)]})
    exact = dedup_against(rd.from_arrow(new), fps, cfg,
                          "doc_id", "text").to_pandas()
    bloom = dedup_against_bloom(
        rd.from_arrow(new), BloomFilter.from_hexes(fps, 0.01), cfg,
        "doc_id", "text").to_pandas()
    # every seen doc dropped by BOTH; bloom survivors are a subset of
    # exact survivors (false positives only ever DROP extra rows)
    assert set(bloom["doc_id"]) <= set(exact["doc_id"])
    assert not (set(exact["doc_id"]) & set(range(100, 130))) \
        and not (set(bloom["doc_id"]) & set(range(100, 130)))


def test_warm_facade_round15_frame_identity(idx):
    """Warm serving of the round-15 surface == the cold batch path."""
    from opensearch_jvector_ray.serve import SearchService
    svc = SearchService(idx, num_shards=2)
    try:
        s = IndexSearcher(idx)
        sq = {"q": [("tool", 2.0), ("call", 1.0)]}
        pd.testing.assert_frame_equal(
            svc.sparse_vector_search(sq, k=8).reset_index(drop=True),
            s.sparse_vector_search(sq, k=8).reset_index(drop=True))
        cq = {"q1": "tool call", "q2": "user asks"}
        pd.testing.assert_frame_equal(svc.agg.count(cq), s.count(cq))
        psets = {"qa": [f"conv-{i:07d}" for i in range(10)]}
        pd.testing.assert_frame_equal(
            svc.agg.children_terms_agg(psets, field="tool"),
            s.children_terms_agg(psets, field="tool"))
        pd.testing.assert_frame_equal(
            svc.agg.field_stats(["role", "doc_len"]),
            s.field_stats(["role", "doc_len"]))
        keys = [("conv-0000001", 0), ("conv-0000002", 1)]
        pd.testing.assert_frame_equal(svc.agg.mget(keys), s.mget(keys))
        pd.testing.assert_frame_equal(
            svc.agg.tdigest_percentiles_agg(cq, "doc_len", [0.5],
                                            min_score=0.0),
            s.tdigest_percentiles_agg(cq, "doc_len", [0.5],
                                      min_score=0.0))
        pd.testing.assert_frame_equal(
            svc.agg.approx_terms_agg(cq, field="role", min_score=0.3,
                                     size=5, capacity=512),
            s.approx_terms_agg(cq, field="role", min_score=0.3,
                               size=5, capacity=512))
    finally:
        svc.shutdown()


def _bpe_reference(texts, num_merges):
    """Independent per-occurrence BPE reference: merges applied to the
    FULL corpus token stream (no word-frequency dict), same pattern and
    (count desc, pair asc) tie rule."""
    import re

    from opensearch_jvector_ray.pipelines.textstats import BPE_PATTERN
    pat = re.compile(BPE_PATTERN)
    seqs = [list(tok) for t in texts for tok in pat.findall(t)]
    merges = []
    for mi in range(num_merges):
        counts = {}
        for w in seqs:
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (la, rb), cnt = min(counts.items(), key=lambda kv: (-kv[1],
                                                            kv[0]))
        merges.append((mi, la, rb, cnt))
        for i, w in enumerate(seqs):
            j, out = 0, []
            while j < len(w):
                if j + 1 < len(w) and w[j] == la and w[j + 1] == rb:
                    out.append(la + rb)
                    j += 2
                else:
                    out.append(w[j])
                    j += 1
            seqs[i] = out
    return merges


def test_bpe_train_matches_per_occurrence_reference():
    from opensearch_jvector_ray.pipelines.corpus import (
        bpe_merge_candidates, bpe_train,
    )
    texts = ["the cat sat on the mat, the cat ate 42 fish",
             "low lower lowest newer newest wider widest",
             "ab ab ab abc abc abcd!!"]
    tbl = pa.table({"text": texts})
    got = bpe_train(rd.from_arrow(tbl), num_merges=12)
    gold = _bpe_reference(texts, 12)
    assert [tuple(r) for r in got.itertuples(index=False)] == gold
    # iteration 0's winner == the step-1 candidate ranker's top pair
    top = bpe_merge_candidates(rd.from_arrow(tbl), top_k=1)
    assert got.loc[0, "left"] + got.loc[0, "right"] == top["pair"][0]
    assert got.loc[0, "cnt"] == top["cnt"][0]


def test_bpe_train_caps_are_deterministic():
    from opensearch_jvector_ray.pipelines.corpus import bpe_train
    tbl = pa.table({"text": ["aa bb aa bb aa cc dd" for _ in range(3)]})
    full = bpe_train(rd.from_arrow(tbl), num_merges=2)
    capped = bpe_train(rd.from_arrow(tbl), num_merges=2, min_count=3)
    # 'aa' (cnt 9 occurrences -> word cnt 9? word 'aa' appears 9 times)
    # survives the cap; the merge winner is unchanged
    assert full.loc[0, ["left", "right"]].tolist() == \
        capped.loc[0, ["left", "right"]].tolist()


def test_bpe_encode_applies_trained_merges():
    from opensearch_jvector_ray.pipelines.corpus import (
        bpe_encode, bpe_train,
    )
    texts = ["the the the cat cat sat", "thence thesis other cats"]
    tbl = pa.table({"doc_id": [1, 2], "text": texts})
    merges = bpe_train(rd.from_arrow(tbl), num_merges=8)
    out = bpe_encode(rd.from_arrow(tbl), merges).to_pandas() \
        .set_index("doc_id")
    # naive rank-greedy reference per pre-token
    import re

    from opensearch_jvector_ray.pipelines.textstats import BPE_PATTERN
    ranks = {(r.left, r.right): i
             for i, r in enumerate(merges.itertuples(index=False))}

    def ref_len(tok):
        w = list(tok)
        while len(w) > 1:
            cands = [(ranks[p], i) for i, p in enumerate(zip(w, w[1:]))
                     if p in ranks]
            if not cands:
                break
            _, i = min(cands)
            w[i:i + 2] = [w[i] + w[i + 1]]
        return len(w)

    for did, t in zip([1, 2], texts):
        gold = sum(ref_len(tok) for tok in re.findall(BPE_PATTERN, t))
        assert out.loc[did, "n_bpe_tokens"] == gold
    # merges strictly compress vs character count
    charlen = sum(len(tok) for tok in re.findall(BPE_PATTERN, texts[0]))
    assert out.loc[1, "n_bpe_tokens"] < charlen
    # no merges = character-level encoding
    none = bpe_encode(rd.from_arrow(tbl), []).to_pandas() \
        .set_index("doc_id")
    assert none.loc[1, "n_bpe_tokens"] == charlen


def test_ingest_pipeline_chain_and_validation():
    from opensearch_jvector_ray.pipelines.ingest import (
        compile_pipeline, simulate,
    )
    tbl = pa.table({"a": ["  Hi 42 ", "X9"], "n": [1, 2]})
    fn = compile_pipeline([
        {"trim": {"field": "a"}},
        {"gsub": {"field": "a", "pattern": "[0-9]+",
                  "replacement": "#"}},
        {"lowercase": {"field": "a"}},
        {"rename": {"field": "a", "target_field": "b"}},
        {"convert": {"field": "n", "type": "double"}},
        {"set": {"field": "tag", "value": "t"}},
        {"remove": {"field": "n"}},
    ])
    out = fn(tbl)
    assert out.column_names == ["b", "tag"]
    assert out["b"].to_pylist() == ["hi #", "x#"]
    assert out["tag"].to_pylist() == ["t", "t"]
    # chain order matters: each processor sees the previous output
    ds = rd.from_arrow(tbl)
    got = simulate(ds, [{"uppercase": {"field": "a"}},
                        {"gsub": {"field": "a", "pattern": "HI",
                                  "replacement": "YO"}}]).to_pandas()
    assert got["a"].tolist() == ["  YO 42 ", "X9"]
    for bad in ([], [{"nope": {"field": "a"}}],
                [{"gsub": {"field": "a"}}],
                [{"convert": {"field": "n", "type": "bool"}}],
                [{"set": {"field": "x", "value": 1, "extra": 2}}]):
        with pytest.raises(ValueError):
            compile_pipeline(bad)


def test_ingest_script_and_drop_processors():
    from opensearch_jvector_ray.pipelines.ingest import (
        compile_pipeline,
    )
    fn = compile_pipeline([
        {"drop": {"field": "lang", "equals": "zh"}},
        {"script": {"op": "mul", "left": "n", "right": 3,
                    "target_field": "n3"}},
        {"script": {"op": "div", "left": "n3", "right": "n",
                    "target_field": "r"}},
    ])
    t = pa.table({"lang": ["en", "zh", None], "n": [2, 5, 4]})
    o = fn(t)
    # NULL never equals the drop value -> kept
    assert o["lang"].to_pylist() == ["en", None]
    assert o["n3"].to_pylist() == [6, 12] and         o["n3"].type == pa.int64()
    assert o["r"].to_pylist() == [3.0, 3.0] and         o["r"].type == pa.float64()
    with pytest.raises(ValueError, match="op must be"):
        compile_pipeline([{"script": {"op": "pow", "left": 1,
                                      "right": 2,
                                      "target_field": "x"}}])


def test_ingest_json_extract_rules():
    from opensearch_jvector_ray.pipelines.ingest import (
        compile_pipeline,
    )
    fn = compile_pipeline([{"json_extract":
                            {"field": "p", "key": "k",
                             "target_field": "v"}}])
    t = pa.table({"p": ['{"k": 87}', '{"k": "str val", "z": 1}',
                        '{"z": 3}', '{"kk": 5, "k": 2}', None]})
    assert fn(t)["v"].to_pylist() == ["87", "str val", None, "2",
                                      None]
    # empty json value normalizes to NULL (the oracle's NULLIF rule)
    assert fn(pa.table({"p": ['{"k": ""}']}))["v"].to_pylist() == \
        [None]
    # regex-metachar keys are escaped, not group-shifting
    fn2 = compile_pipeline([{"json_extract":
                             {"field": "p", "key": "a(b)c",
                              "target_field": "v"}}])
    assert fn2(pa.table({"p": ['{"a(b)c": 7}']}))["v"].to_pylist() \
        == ["7"]
    with pytest.raises(ValueError, match="structural"):
        compile_pipeline([{"json_extract":
                           {"field": "p", "key": 'a"b',
                            "target_field": "v"}}])


def test_children_terms_agg_brute_force(idx):
    s = IndexSearcher(idx)
    tbl = generate_conversations(np.arange(150))
    convs = sorted(set(tbl["conv_id"].to_pylist()))[:20]
    psets = {"qa": convs, "qb": convs[5:9]}
    out = s.children_terms_agg(psets, field="tool", size=10)
    df = tbl.to_pandas()
    for qid, pset in psets.items():
        sub = df[df["conv_id"].isin(pset)]
        sub = sub[sub["tool"].notna() & (sub["tool"] != "")]
        gold = (sub.groupby("tool").size().reset_index(name="n")
                .sort_values(["n", "tool"], ascending=[False, True])
                .head(10))
        got = out[out["query_id"] == qid]
        assert list(zip(got["value"], got["doc_count"])) == \
            list(zip(gold["tool"], gold["n"]))


def test_geo_distance_brute_force_and_radius():
    """geo_distance_topk == a full numpy sort of the same rounded
    distances; radius excludes everything beyond it."""
    from opensearch_jvector_ray.pipelines.geo import (
        geo_distance_topk, haversine_km,
    )
    rng = np.random.default_rng(11)
    n = 2000
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"event_id": ids, "lat": lat, "lon": lon})
    ds = rd.from_arrow(tbl)
    q = {"a": (10.0, 20.0), "b": (-45.0, 100.0)}
    out = geo_distance_topk(ds, q, k=15, radius_km=9000.0)
    for qid, (qla, qlo) in q.items():
        d = np.round(haversine_km(lat, lon, qla, qlo), 6)
        keep = d <= 9000.0
        order = np.lexsort((ids[keep], d[keep]))[:15]
        gold = list(zip(ids[keep][order], d[keep][order]))
        got = out[out["query_id"] == qid]
        assert list(zip(got["event_id"], got["distance_km"])) == gold
    assert (out["distance_km"] <= 9000.0).all()


def test_legacy_flat_layout_still_reads(idx, tmp_path):
    """A pre-generation index dir (flat parquet under dictionary/) stays
    readable, and a reader pinned to the flat root never sees generation
    subdirs published AFTER it opened."""
    import shutil
    d = str(tmp_path / "legacy")
    shutil.copytree(idx, d)
    # flatten: move gen-1 files up, drop the generation dir
    root = os.path.join(d, "dictionary")
    gen1 = os.path.join(root, "g0000000001")
    for f in os.listdir(gen1):
        shutil.move(os.path.join(gen1, f), os.path.join(root, f))
    os.rmdir(gen1)
    assert resolve_dict_dir(d) == root
    s = IndexSearcher(d)
    before = s.search(QUERIES, k=8).reset_index(drop=True)
    pit = s.open_pit()
    add_segments(d, rd.from_arrow(_extra(150, 200)))
    # refresh published g1 next to the legacy flat files
    assert dict_generations(d) == [1]
    flat_paths = dict_read_paths(root)
    assert isinstance(flat_paths, list) and all(
        os.path.dirname(p) == root for p in flat_paths)
    after_pit = IndexSearcher(d, pit=pit).search(QUERIES, k=8) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(after_pit, before)
