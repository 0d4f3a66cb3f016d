"""Checkpoint/resume, last-write-wins updates, tombstone deletes
(reference: BWC restart suites `qa/restart-upgrade/`; update/delete
scenarios `JVectorEngineIT.java:130,142,307`)."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.state.manifest import MANIFEST_NAME, completed_segments
from opensearch_jvector_ray.synth import generate_conversations


def test_resume_after_partial_build(tmp_path):
    corpus = generate_conversations(np.arange(120))
    cfg = EngineConfig(num_segments=5)
    idx_full = str(tmp_path / "full")
    build_index(rd.from_arrow(corpus), idx_full, cfg, IndexSpec())

    # simulate a crash: drop two segments' checkpoints (manifest = commit)
    idx_part = str(tmp_path / "part")
    shutil.copytree(idx_full, idx_part)
    for seg in (1, 3):
        os.remove(os.path.join(idx_part, "segments", f"seg={seg:05d}", MANIFEST_NAME))
    assert len(completed_segments(idx_part)) == 3

    res = build_index(rd.from_arrow(corpus), idx_part, cfg, IndexSpec())
    assert res.segments_skipped == 3 and res.segments_built == 2
    q = {"q1": "data model search", "q2": "zebra quantum nebula"}
    a = IndexSearcher(idx_full).search(q, k=10)
    b = IndexSearcher(idx_part).search(q, k=10)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def _mini_table(rows):
    return pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": ["user"] * len(rows),
        "text": [r[3] for r in rows],
        "tool": [""] * len(rows),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
    })


def test_last_write_wins(tmp_path):
    tbl = _mini_table([
        ("c1", 0, 100, "old apple text"),
        ("c1", 0, 200, "new banana text"),     # later ts wins
        ("c2", 0, 50, "apple forever"),
    ])
    idx = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=2, last_write_wins=True)
    res = build_index(rd.from_arrow(tbl), idx, cfg, IndexSpec())
    assert res.num_docs == 2
    s = IndexSearcher(idx)
    assert len(s.search({"q": "banana"}, k=5)) == 1
    apple = s.search({"q": "apple"}, k=5)
    assert [(r.conv_id, r.turn_idx) for r in apple.itertuples()] == [("c2", 0)]


def test_tombstones(tmp_path):
    tbl = _mini_table([
        ("c1", 0, 1, "apple one"),
        ("c1", 1, 2, "apple two"),
        ("c2", 0, 3, "apple three"),
    ])
    idx = str(tmp_path / "idx")
    res = build_index(rd.from_arrow(tbl), idx, EngineConfig(num_segments=2),
                      IndexSpec(), deletes=[("c1", 1)])
    assert res.num_docs == 2
    out = IndexSearcher(idx).search({"q": "apple"}, k=5)
    assert ("c1", 1) not in {(r.conv_id, r.turn_idx) for r in out.itertuples()}
    assert len(out) == 2


def test_duplicate_key_guard(tmp_path):
    """Without LWW, duplicate keys in one segment are rejected (D1 analog
    of the same-docID guard, JVectorWriter.java:524-531)."""
    # duplicate (conv_id, turn_idx) must be collapsed when LWW is on; when
    # off, both rows survive — validate the count difference explicitly.
    tbl = _mini_table([("c1", 0, 1, "x x"), ("c1", 0, 2, "x")])
    idx = str(tmp_path / "a")
    res = build_index(rd.from_arrow(tbl), idx, EngineConfig(num_segments=1,
                                                            last_write_wins=True),
                      IndexSpec())
    assert res.num_docs == 1
