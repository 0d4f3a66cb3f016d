"""Round-2 regression tests: uncapped radial (O5 predicate semantics),
WAND analyzed-term-order tie identity at >=3 terms, fixed-centroid IVF
inline/partitioned equivalence, and the filtered/radial vector paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines import knn as knn_pl
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


def test_radial_uncapped_beyond_max_k(tmp_path):
    """More docs pass the threshold than max_k allows: the radial
    predicate path must return them ALL (no silent truncation)."""
    n = 60
    texts = [f"zebra filler{i} filler{i}" for i in range(n)]
    idx = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=3, max_k=20, default_k=5)
    build_index(rd.from_arrow(_corpus(texts)), idx, cfg, IndexSpec())
    s = IndexSearcher(idx)
    out = s.search({"q": "zebra"}, min_score=0.0)
    assert len(out) == n > cfg.max_k
    # rank covers 1..n; ordering is (score desc, key asc)
    assert out["rank"].tolist() == list(range(1, n + 1))
    assert (np.diff(out["score"].to_numpy()) <= 1e-12).all()


def test_radial_threshold_matches_filtered_topk(tmp_path):
    texts = ["zebra alpha", "zebra zebra beta", "gamma delta", "zebra"] * 5
    idx = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=2)
    build_index(rd.from_arrow(_corpus(texts)), idx, cfg, IndexSpec())
    s = IndexSearcher(idx)
    full = s.search({"q": "zebra"}, min_score=0.0)
    theta = float(full["score"].iloc[len(full) // 2])
    radial = s.search({"q": "zebra"}, min_score=theta)
    exp = full[full["score"] >= theta]
    assert radial["conv_id"].tolist() == exp["conv_id"].tolist()
    assert len(radial) < len(full)


def test_wand_taat_identical_with_many_term_ties(tmp_path):
    """Docs with identical contribution multisets over >=3 terms: WAND's
    analyzed-term-order summation must reproduce TAAT's exact fp sums so
    the (score desc, key asc) tie rank is identical."""
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rng = np.random.default_rng(3)
    texts = []
    for i in range(40):
        perm = list(rng.permutation(words))   # same multiset, rotated order
        texts.append(" ".join(perm))
    texts += ["alpha beta", "gamma delta eps alpha"] * 3
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus(texts)), idx,
                EngineConfig(num_segments=3, block_size=4), IndexSpec())
    s = IndexSearcher(idx)
    qs = {"q1": "alpha beta gamma", "q2": "alpha beta gamma delta eps",
          "q3": "eps delta gamma beta"}
    for k in (5, 17, 50):
        taat = s.search(qs, k=k)
        wand = s.search(qs, k=k, mode="wand")
        pd.testing.assert_frame_equal(taat, wand)


def _vec_table(vecs: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(len(vecs))],
                          type=pa.int32()),
    })


def test_ivf_fixed_inline_equals_partitioned(tmp_path):
    """Shared fixed centroids => the inline cell-filter path and the
    persisted cell-partitioned path are result-identical."""
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 24)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    cent = knn_pl.fixed_centroids(ds, list(range(6)))
    queries = {f"q{i}": vecs[i * 31].astype(np.float64) for i in range(4)}
    inline = knn_pl.ivf_topk(ds, queries, 10, centroids=cent, n_probe=2,
                             round_decimals=6)
    idx = str(tmp_path / "ivf")
    knn_pl.build_ivf_index(ds, idx, centroids=cent)
    part = knn_pl.ivf_index_topk(idx, queries, 10, n_probe=2,
                                 round_decimals=6)
    pd.testing.assert_frame_equal(inline, part)


def test_knn_filtered_and_radial():
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    queries = {"q": vecs[0].astype(np.float64)}
    flt = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                  filter_expr=pc.field("label") == 2,
                                  round_decimals=6)
    assert (np.array(flt["vec_id"]) % 4 == 2).all()
    # radial: threshold taken from the filtered-free top-k boundary
    full = knn_pl.brute_force_topk(ds, queries, 20, metric="cosine",
                                   round_decimals=6)
    theta = float(full["score"].iloc[9])
    rad = knn_pl.brute_force_topk(ds, queries, None, metric="cosine",
                                  min_score=theta, round_decimals=6)
    exp_ids = set(full[full["score"] >= theta]["vec_id"])
    assert set(rad["vec_id"]) == exp_ids


def test_trained_centroids_bounded_sample():
    """Trainer must respect the sample cap and still produce k centroids
    of the right dimensionality."""
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((500, 12)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    cent = knn_pl.train_centroids(ds, 7, "embedding", sample_size=128)
    assert cent.shape == (7, 12)
    # deterministic given the same seed/sample
    cent2 = knn_pl.train_centroids(ds, 7, "embedding", sample_size=128)
    np.testing.assert_array_equal(cent, cent2)


# ---------------------------------------------------------------------------
# PQ lifecycle (train -> encode -> approx+rerank -> refine-on-merge)
# ---------------------------------------------------------------------------

def _clustered_vecs(seed=31, n_centers=6, per=60, d=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)) * 4
    return np.concatenate([c + rng.standard_normal((per, d))
                           for c in centers]).astype(np.float32)


def test_pq_rerank_recall_and_exactness(tmp_path):
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs()
    ds = rd.from_arrow(_vec_table(vecs))
    queries = {f"q{i}": vecs[i * 41].astype(np.float64) for i in range(5)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    idx = str(tmp_path / "pq")
    pq_pl.build_pq_index(ds, idx, m_subspaces=8, n_codes=16)
    approx = pq_pl.pq_rerank_topk(idx, queries, 10, oversample=8.0,
                                  metric="cosine", round_decimals=6)
    recalls = []
    for q in queries:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.75, recalls
    # surviving hits carry EXACT scores (second pass), not ADC estimates
    merged = approx.merge(exact, on=["query_id", "vec_id"],
                          suffixes=("_pq", "_ex"))
    np.testing.assert_allclose(merged["score_pq"], merged["score_ex"],
                               atol=0)


def test_pq_full_oversample_equals_bruteforce(tmp_path):
    """With the first pass pruning nothing (k' >= n), PQ+rerank IS exact
    brute force — the rescore-identity analog of the BM25 two-pass test."""
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=7, n_centers=4, per=30)
    ds = rd.from_arrow(_vec_table(vecs))
    queries = {"q": vecs[5].astype(np.float64)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    idx = str(tmp_path / "pq")
    pq_pl.build_pq_index(ds, idx, m_subspaces=4, n_codes=8)
    out = pq_pl.pq_rerank_topk(idx, queries, 10, oversample=1000.0,
                               metric="cosine", round_decimals=6)
    pd.testing.assert_frame_equal(out, exact)


def test_pq_refine_keeps_codebook(tmp_path):
    """Merge-refine: new vectors are encoded with the EXISTING codebook
    (never retrained) and become searchable."""
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=13, n_centers=4, per=40)
    half = len(vecs) // 2
    t1 = _vec_table(vecs[:half])
    idx = str(tmp_path / "pq")
    book1 = pq_pl.build_pq_index(rd.from_arrow(t1), idx, m_subspaces=8)
    # second half arrives later with SHIFTED ids
    import pyarrow as _pa
    t2 = _pa.table({
        "vec_id": _pa.array(range(half, len(vecs)), type=_pa.int64()),
        "embedding": _pa.array([v.tolist() for v in vecs[half:]],
                               type=_pa.list_(_pa.float32())),
        "label": _pa.array([0] * (len(vecs) - half), type=_pa.int32()),
    })
    pq_pl.refine_pq_index(rd.from_arrow(t2), idx)
    book2 = np.load(f"{idx}/{pq_pl.CODEBOOK_NAME}")
    np.testing.assert_array_equal(book1, book2)
    q = {"q": vecs[half + 3].astype(np.float64)}
    out = pq_pl.pq_rerank_topk(idx, q, 5, metric="cosine")
    assert int(out.iloc[0].vec_id) == half + 3   # its own nearest neighbor


# ---------------------------------------------------------------------------
# Graph ANN (per-partition navigable graph, the jVector engine analog)
# ---------------------------------------------------------------------------

def test_graph_ann_recall_and_determinism(tmp_path):
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=41, n_centers=6, per=80, d=32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "graph")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 53].astype(np.float64) for i in range(5)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    approx = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                                 round_decimals=6)
    recalls = []
    for q in queries:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.75, recalls
    # deterministic: same index + same queries -> identical frame
    approx2 = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                                  round_decimals=6)
    pd.testing.assert_frame_equal(approx, approx2)
    # surviving hits carry EXACT scores (never graph-approximated)
    merged = approx.merge(exact, on=["query_id", "vec_id"],
                          suffixes=("_g", "_e"))
    np.testing.assert_allclose(merged["score_g"], merged["score_e"], atol=0)


def test_graph_ann_full_beam_is_exact(tmp_path):
    """ef_search >= partition size degenerates to exhaustive search of
    every partition -> result equals brute force exactly."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(59)
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "graph")
    graph_pl.build_graph_index(ds, idx, num_parts=2, m_degree=120,
                               ef_construction=120)
    queries = {"q": vecs[3].astype(np.float64)}
    exact = knn_pl.brute_force_topk(ds, queries, 8, metric="cosine",
                                    round_decimals=6)
    out = graph_pl.graph_topk(idx, queries, 8, ef_search=120,
                              round_decimals=6)
    pd.testing.assert_frame_equal(out, exact)


def test_graph_build_resume(tmp_path):
    """Per-partition meta files are resume checkpoints: a rebuilt index
    skips completed parts (graphs unchanged on disk)."""
    import os
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(61)
    vecs = rng.standard_normal((80, 8)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "graph")
    graph_pl.build_graph_index(ds, idx, num_parts=3)
    stamp = {p: os.path.getmtime(os.path.join(idx, p, "graph.parquet"))
             for p in os.listdir(idx) if p.startswith("part=")}
    graph_pl.build_graph_index(ds, idx, num_parts=3)   # resume: all done
    for p, t in stamp.items():
        assert os.path.getmtime(os.path.join(idx, p, "graph.parquet")) == t


def test_ivf_lifecycle_add_delete_compact(tmp_path):
    """Persisted-IVF update lifecycle: adds encode with the EXISTING
    centroids (refine-not-retrain), deletes tombstone at query time, and
    compaction drops them physically with identical results."""
    import os
    rng = np.random.default_rng(73)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs[:150]))
    idx = str(tmp_path / "ivf")
    cent = knn_pl.fixed_centroids(ds, list(range(5)))
    knn_pl.build_ivf_index(ds, idx, centroids=cent)
    # add the remaining 50 with shifted ids
    t2 = pa.table({
        "vec_id": pa.array(range(150, 200), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs[150:]],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * 50, type=pa.int32())})
    knn_pl.add_to_ivf_index(rd.from_arrow(t2), idx)
    assert np.array_equal(np.load(os.path.join(idx, "_centroids.npy")), cent)
    q = {"q": vecs[170].astype(np.float64)}
    out = knn_pl.ivf_index_topk(idx, q, 5, n_probe=2, round_decimals=6)
    assert int(out.iloc[0].vec_id) == 170      # added vector searchable
    # delete it: must vanish from results
    knn_pl.delete_from_ivf_index(idx, [170])
    out2 = knn_pl.ivf_index_topk(idx, q, 5, n_probe=2, round_decimals=6)
    assert 170 not in set(out2.vec_id)
    # compact: tombstones physically dropped, results identical
    idx2 = str(tmp_path / "ivf2")
    knn_pl.compact_ivf_index(idx, idx2)
    out3 = knn_pl.ivf_index_topk(idx2, q, 5, n_probe=2, round_decimals=6)
    pd.testing.assert_frame_equal(out2, out3)


def test_graph_merge_with_deletes(tmp_path):
    """Graph force-merge: fewer coarser partitions, tombstones dropped,
    recall preserved."""
    import os
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=67, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g1")
    graph_pl.build_graph_index(ds, idx, num_parts=6, m_degree=12,
                               ef_construction=48)
    merged = str(tmp_path / "g2")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3,
                               deletes=[5, 17])
    parts = [d for d in os.listdir(merged) if d.startswith("part=")]
    assert len(parts) == 2
    queries = {"q": vecs[5].astype(np.float64)}   # the deleted vector
    out = graph_pl.graph_topk(merged, queries, 10, ef_search=64,
                              round_decimals=6)
    got = set(out.vec_id)
    assert 5 not in got and 17 not in got
    exact = knn_pl.brute_force_topk(ds, queries, 12, metric="cosine",
                                    round_decimals=6)
    live_exact = [v for v in exact.vec_id if v not in (5, 17)][:10]
    recall = len(set(live_exact) & got) / 10
    assert recall >= 0.7, recall


def test_add_segments_incremental_ingest(tmp_path):
    """Appending new data as new segments + dictionary/stats refresh is
    rank-identical to a one-shot build over the union (segmentation
    invariance + truly-global df/N/avgdl after the refresh)."""
    from opensearch_jvector_ray.stages.build import add_segments
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rng = np.random.default_rng(83)
    texts = [" ".join(rng.choice(words, size=int(rng.integers(2, 8))))
             for _ in range(120)]
    all_tbl = _corpus(texts)
    cfg = EngineConfig(num_segments=3)
    # one-shot reference build
    idx_ref = str(tmp_path / "ref")
    build_index(rd.from_arrow(all_tbl), idx_ref, cfg, IndexSpec())
    # incremental: first 80 rows, then append the remaining 40
    idx_inc = str(tmp_path / "inc")
    build_index(rd.from_arrow(all_tbl.slice(0, 80)), idx_inc, cfg,
                IndexSpec())
    partial = IndexSearcher(idx_inc).search({"q": "alpha beta"}, k=10)
    add_segments(idx_inc, rd.from_arrow(all_tbl.slice(80)))
    qs = {"q1": "alpha beta gamma", "q2": "zeta eps", "q3": "delta"}
    a = IndexSearcher(idx_ref).search(qs, k=25)
    b = IndexSearcher(idx_inc).search(qs, k=25)
    pd.testing.assert_frame_equal(a, b)
    # global stats were refreshed (post-append scores differ from partial)
    post = IndexSearcher(idx_inc).search({"q": "alpha beta"}, k=10)
    assert len(post) >= len(partial)


def test_add_segments_refuses_foreign_config(tmp_path):
    import json, os, pytest
    from opensearch_jvector_ray.stages.build import add_segments
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus(["alpha beta"] * 10)), idx,
                EngineConfig(num_segments=2), IndexSpec())
    # corrupt one manifest's fingerprint -> append must refuse
    man = os.path.join(idx, "segments", "seg=00000", "manifest.json")
    d = json.load(open(man)); d["config_fingerprint"] = "deadbeef"
    json.dump(d, open(man, "w"))
    with pytest.raises(ValueError, match="foreign config"):
        add_segments(idx, rd.from_arrow(_corpus(["gamma"] * 5)))


def test_boolean_query_semantics(tmp_path):
    """+must filters AND scores, -must_not filters, bare should scores —
    verified against a per-doc containment oracle, across segments."""
    texts = ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
             "gamma delta", "alpha", "beta", "delta eps"] * 6
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus(texts)), idx,
                EngineConfig(num_segments=4), IndexSpec())
    s = IndexSearcher(idx)
    out = s.search({"q": "alpha +beta -gamma"}, k=100, mode="boolean")
    hit_texts = {texts[int(c[1:])] for c in out["conv_id"]}
    # must contain beta, never gamma
    assert hit_texts == {"alpha beta", "beta"}
    # impossible MUST -> no hits; unknown MUST_NOT -> no effect
    assert s.search({"q": "alpha +zzz"}, k=10, mode="boolean").empty
    out2 = s.search({"q": "alpha -zzz"}, k=100, mode="boolean")
    assert len(out2) == len(s.search({"q": "alpha"}, k=100))
    # MUST terms score: '+alpha' ranks identically to plain 'alpha'
    a = s.search({"q": "+alpha"}, k=100, mode="boolean")
    b = s.search({"q": "alpha"}, k=100)
    pd.testing.assert_frame_equal(a, b)
