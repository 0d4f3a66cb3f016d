"""Merge-stage tests: merge equivalence, deletes at merge, merge resume
(reference merge scenarios `KNNJVectorTests.java:250,311,451,593`; delete
handling `JVectorWriter.java:611-658`)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.stages.merge import merge_index, plan_merge_groups
from opensearch_jvector_ray.state.manifest import completed_segments
from opensearch_jvector_ray.synth import generate_conversations

QUERIES = {
    "planted": "zebra quantum nebula",
    "head": "data model search index",
    "dup": "data data checkpoint",
}


def _build(tmp_path, name, corpus, p):
    idx = str(tmp_path / name)
    build_index(rd.from_arrow(corpus), idx, EngineConfig(num_segments=p), IndexSpec())
    return idx


def test_merge_equivalence(tmp_path):
    """build P=8 -> merge to 2 == build P=1 (rank + score identity)."""
    corpus = generate_conversations(np.arange(150))
    idx8 = _build(tmp_path, "p8", corpus, 8)
    idx1 = _build(tmp_path, "p1", corpus, 1)
    merged = str(tmp_path / "merged")
    stats = merge_index(idx8, merged, merge_factor=4)
    assert stats["num_segments"] == 2
    a = IndexSearcher(idx1).search(QUERIES, k=12)
    b = IndexSearcher(merged).search(QUERIES, k=12)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)
    # positions survived the merge: WAND on merged == TAAT on merged
    c = IndexSearcher(merged).search(QUERIES, k=12, mode="wand")
    pd.testing.assert_frame_equal(b, c, atol=1e-9)


def test_merge_with_deletes(tmp_path):
    """Tombstoned docs vanish from the merged index AND global stats are
    refreshed (df/avgdl recomputed), matching a fresh build without them."""
    corpus = generate_conversations(np.arange(60))
    idx = _build(tmp_path, "src", corpus, 4)
    victims = [("conv-0000000", 1), ("conv-0000003", 0)]
    merged = str(tmp_path / "dst")
    merge_index(idx, merged, merge_factor=4, deletes=victims)

    mask = np.ones(corpus.num_rows, dtype=bool)
    for i in range(corpus.num_rows):
        if (corpus["conv_id"][i].as_py(), corpus["turn_idx"][i].as_py()) in victims:
            mask[i] = False
    fresh = _build(tmp_path, "fresh", corpus.filter(pa.array(mask)), 1)
    a = IndexSearcher(fresh).search(QUERIES, k=10)
    b = IndexSearcher(merged).search(QUERIES, k=10)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_merge_resume(tmp_path):
    corpus = generate_conversations(np.arange(80))
    idx = _build(tmp_path, "src", corpus, 6)
    merged = str(tmp_path / "dst")
    merge_index(idx, merged, merge_factor=3)
    m1 = completed_segments(merged)
    # delete one output checkpoint -> only that group re-merges
    os.remove(os.path.join(merged, "segments", "seg=00000", "manifest.json"))
    merge_index(idx, merged, merge_factor=3)
    m2 = completed_segments(merged)
    assert sorted(m2) == sorted(m1)
    a = IndexSearcher(_build(tmp_path, "p1", corpus, 1)).search(QUERIES, k=10)
    b = IndexSearcher(merged).search(QUERIES, k=10)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_plan_merge_groups_balances_by_size():
    class M:
        def __init__(self, n):
            self.num_docs = n
    manifests = {0: M(100), 1: M(10), 2: M(90), 3: M(20), 4: M(50), 5: M(40)}
    groups = plan_merge_groups(manifests, merge_factor=3)
    assert sorted(s for g in groups for s in g) == list(range(6))
    sizes = [sum(manifests[s].num_docs for s in g) for g in groups]
    assert max(sizes) - min(sizes) <= 60   # greedy balance, not worst-case


def test_two_level_merge(tmp_path):
    """Merging already-merged (bulk) segments re-derives key_rank and
    stays rank-identical to a single-segment build."""
    corpus = generate_conversations(np.arange(120))
    idx = _build(tmp_path, "fine", corpus, 12)
    mid = str(tmp_path / "mid")
    merge_index(idx, mid, merge_factor=3)       # 12 -> 4 (bulk)
    top = str(tmp_path / "top")
    merge_index(mid, top, merge_factor=4)       # 4 -> 1 (bulk of bulk)
    a = IndexSearcher(_build(tmp_path, "p1", corpus, 1)).search(QUERIES, k=15)
    b = IndexSearcher(top).search(QUERIES, k=15)
    c = IndexSearcher(top).search(QUERIES, k=15, mode="wand")
    pd.testing.assert_frame_equal(a, b, atol=1e-12)
    pd.testing.assert_frame_equal(b, c, atol=1e-9)


def test_bulk_merge_phrase_positions(tmp_path):
    """Positions blobs concatenate unchanged through bulk merge: phrase
    queries on the merged index equal the fine index."""
    corpus = generate_conversations(np.arange(150))
    idx = _build(tmp_path, "fine", corpus, 8)
    merged = str(tmp_path / "m")
    merge_index(idx, merged, merge_factor=8)
    p = {"p": "zebra quantum nebula"}
    a = IndexSearcher(idx).search(p, k=20, mode="phrase")
    b = IndexSearcher(merged).search(p, k=20, mode="phrase")
    pd.testing.assert_frame_equal(a, b, atol=1e-12)
    assert len(b) > 0 and all(b.turn_idx == 1)
