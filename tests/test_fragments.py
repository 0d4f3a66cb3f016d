"""Fragment-mode (zero-shuffle) build: equivalence with the shuffle build
and per-fragment resume."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import (
    IndexSpec, build_index, plan_file_segments,
)
from opensearch_jvector_ray.state.manifest import MANIFEST_NAME, completed_segments
from opensearch_jvector_ray.synth import generate_conversations

QUERIES = {"a": "zebra quantum nebula", "b": "data model search index",
           "c": "checkpoint lineage metric"}


def _write_corpus(tmp_path, n=200, files=5):
    corpus = generate_conversations(np.arange(n))
    d = tmp_path / "input"
    d.mkdir()
    per = corpus.num_rows // files + 1
    for i in range(files):
        part = corpus.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, str(d / f"part-{i:03d}.parquet"),
                           row_group_size=max(64, part.num_rows // 3))
    return corpus, str(d)


def test_fragment_build_equals_shuffle_build(tmp_path):
    corpus, src = _write_corpus(tmp_path)
    cfg = EngineConfig(num_segments=8)
    idx_frag = str(tmp_path / "frag")
    idx_shuf = str(tmp_path / "shuf")
    res = build_index(src, idx_frag, cfg, IndexSpec())          # fragments
    assert res.num_docs == corpus.num_rows
    build_index(rd.from_arrow(corpus), idx_shuf, cfg, IndexSpec())  # shuffle
    a = IndexSearcher(idx_frag).search(QUERIES, k=12)
    b = IndexSearcher(idx_shuf).search(QUERIES, k=12)
    # segmentation differs entirely; results must be identical
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_fragment_plan_row_group_granularity(tmp_path):
    _, src = _write_corpus(tmp_path, n=200, files=4)
    paths = sorted(os.path.join(src, f) for f in os.listdir(src))
    plan = plan_file_segments(paths, target_docs=100)
    # contiguous seg ids, full coverage, no overlaps
    assert [p["seg"] for p in plan] == list(range(len(plan)))
    covered = 0
    for p in plan:
        assert p["rg_hi"] > p["rg_lo"]
        md = pq.read_metadata(p["file"])
        covered += sum(md.row_group(i).num_rows
                       for i in range(p["rg_lo"], p["rg_hi"]))
    assert covered == sum(pq.read_metadata(f).num_rows for f in paths)


def test_fragment_resume(tmp_path):
    corpus, src = _write_corpus(tmp_path)
    cfg = EngineConfig(num_segments=8)
    idx = str(tmp_path / "idx")
    build_index(src, idx, cfg, IndexSpec())
    n_segs = len(completed_segments(idx))
    os.remove(os.path.join(idx, "segments", "seg=00001", MANIFEST_NAME))
    res = build_index(src, idx, cfg, IndexSpec())
    assert res.segments_built == 1 and res.segments_skipped == n_segs - 1
    out = IndexSearcher(idx).search(QUERIES, k=10)
    assert len(out) > 0


def test_lww_routes_to_shuffle_mode(tmp_path):
    """LWW needs key co-location: path input + last_write_wins must still
    dedup correctly (auto mode falls back to the shuffle build)."""
    tbl = pa.table({
        "conv_id": ["c1", "c1"],
        "turn_idx": pa.array([0, 0], type=pa.int32()),
        "role": ["user"] * 2,
        "text": ["old apple", "new banana"],
        "tool": [""] * 2,
        "ts": pa.array([1, 2], type=pa.timestamp("us")),
    })
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    res = build_index(src, idx, EngineConfig(num_segments=2,
                                             last_write_wins=True), IndexSpec())
    assert res.num_docs == 1
    out = IndexSearcher(idx).search({"q": "banana"}, k=5)
    assert len(out) == 1


def test_staged_mode_lww_from_paths(tmp_path):
    """Path input + LWW routes to the staged partitioned-write exchange
    (auto mode) and produces results identical to the in-memory shuffle
    build."""
    corpus, src = _write_corpus(tmp_path, n=150, files=4)
    # plant a duplicate key with a later ts that must win
    import pyarrow.parquet as pq2
    dup = corpus.slice(0, 1)
    import pyarrow as pa2
    dup = pa2.table({
        "conv_id": dup["conv_id"],
        "turn_idx": dup["turn_idx"],
        "role": dup["role"],
        "text": pa2.array(["updated banana text wins"], type=pa2.string()),
        "tool": dup["tool"],
        "ts": pa2.array([9_999_999_999_000_000], type=pa2.timestamp("us")),
    })
    pq2.write_table(dup, str(tmp_path / "input" / "zz-dup.parquet"))

    cfg = EngineConfig(num_segments=6, last_write_wins=True)
    idx_staged = str(tmp_path / "staged")
    res = build_index(src, idx_staged, cfg, IndexSpec())   # auto -> staged
    assert res.num_docs == corpus.num_rows                 # dup collapsed
    assert not os.path.exists(os.path.join(idx_staged, "_staging"))

    all_rows = pa.concat_tables([corpus, dup])
    idx_shuf = str(tmp_path / "shuf")
    build_index(rd.from_arrow(all_rows), idx_shuf, cfg, IndexSpec())
    q = {"a": "updated banana", "b": "data model search"}
    a = IndexSearcher(idx_staged).search(q, k=10)
    b = IndexSearcher(idx_shuf).search(q, k=10)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)
    assert len(a[a.query_id == "a"]) >= 1                  # update visible
