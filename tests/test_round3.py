"""Round-3 regression tests for the ADVICE fixes: journalled
add_segments resume (no duplicate appends on re-run), compact_ivf_index
data-file checkpoints (crash between makedirs and write is not
"complete"), and the PQ n_codes<=256 uint8 guard."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines import knn as knn_pl
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import (
    IndexSpec, add_segments, build_index,
)


def _corpus(texts: list[str], key_prefix: str = "c") -> pa.Table:
    n = len(texts)
    return pa.table({
        "conv_id": [f"{key_prefix}{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": ["user"] * n,
        "text": pa.array(texts, type=pa.string()),
        "tool": [""] * n,
        "ts": pa.array(list(range(n)), type=pa.timestamp("us")),
    })


def test_add_segments_rerun_is_idempotent_paths(tmp_path):
    """The ADVICE repro: re-running the same path append must NOT
    duplicate the appended docs (was: base shifted past them, 20 hits
    for 10 unique keys)."""
    idx = str(tmp_path / "idx")
    cfg = EngineConfig(num_segments=2)
    build_index(rd.from_arrow(_corpus(["alpha beta"] * 10)), idx, cfg,
                IndexSpec())
    extra = tmp_path / "extra.parquet"
    papq.write_table(_corpus(["zebra qux"] * 10, key_prefix="x"),
                     str(extra))
    add_segments(idx, str(extra))
    hits1 = IndexSearcher(idx).search({"q": "zebra"}, min_score=0.0)
    assert len(hits1) == 10
    # re-run the SAME append: journal marks it complete -> no-op
    res = add_segments(idx, str(extra))
    assert res.segments_built == 0
    hits2 = IndexSearcher(idx).search({"q": "zebra"}, min_score=0.0)
    assert len(hits2) == 10, "re-appended docs were duplicated"
    pd.testing.assert_frame_equal(hits1, hits2)


def test_add_segments_resume_after_partial_append(tmp_path):
    """Crash mid-append: flip the journal back to incomplete and drop one
    appended segment; the re-run must rebuild ONLY that segment under the
    journalled base and end rank-identical to a one-shot build."""
    import shutil
    words = ["alpha", "beta", "gamma", "delta"]
    rng = np.random.default_rng(93)
    texts = [" ".join(rng.choice(words, size=int(rng.integers(2, 6))))
             for _ in range(80)]
    all_tbl = _corpus(texts)
    cfg = EngineConfig(num_segments=2)
    idx_ref = str(tmp_path / "ref")
    build_index(rd.from_arrow(all_tbl), idx_ref, cfg, IndexSpec())

    idx = str(tmp_path / "inc")
    build_index(rd.from_arrow(all_tbl.slice(0, 40)), idx, cfg, IndexSpec())
    extra = tmp_path / "extra.parquet"
    papq.write_table(all_tbl.slice(40), str(extra))
    add_segments(idx, str(extra))
    # simulate the crash: journal incomplete + one appended segment gone
    jdir = os.path.join(idx, "_appends")
    (jfile,) = os.listdir(jdir)
    jpath = os.path.join(jdir, jfile)
    j = json.load(open(jpath))
    j["complete"] = False
    json.dump(j, open(jpath, "w"))
    segdirs = sorted(os.listdir(os.path.join(idx, "segments")))
    victim = segdirs[-1]          # an appended (highest-id) segment
    shutil.rmtree(os.path.join(idx, "segments", victim))
    res = add_segments(idx, str(extra))
    assert res.segments_built == 1          # only the victim rebuilt
    qs = {"q1": "alpha beta", "q2": "gamma delta"}
    a = IndexSearcher(idx_ref).search(qs, k=30)
    b = IndexSearcher(idx).search(qs, k=30)
    pd.testing.assert_frame_equal(a, b)


def test_add_segments_distinct_lineage_forces_reappend(tmp_path):
    """Intentional double-append of the same file: a distinct lineage
    token defeats the idempotency journal (add-without-delete rule)."""
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus(["alpha"] * 5)), idx,
                EngineConfig(num_segments=1), IndexSpec())
    extra = tmp_path / "extra.parquet"
    papq.write_table(_corpus(["zebra"] * 5, key_prefix="x"), str(extra))
    add_segments(idx, str(extra), lineage={"batch": 1})
    add_segments(idx, str(extra), lineage={"batch": 2})
    hits = IndexSearcher(idx).search({"q": "zebra"}, min_score=0.0)
    assert len(hits) == 10                  # both appends retrievable


def _vec_table(vecs: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), type=pa.int32()),
    })


def test_compact_ivf_resumes_past_empty_cell_dir(tmp_path):
    """Crash between makedirs(out) and the parquet write used to leave a
    dir that a resumed compact skipped as complete, dropping the cell's
    rows.  The checkpoint is now the data file."""
    import shutil
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((120, 8)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivf")
    cent = knn_pl.fixed_centroids(ds, list(range(4)))
    knn_pl.build_ivf_index(ds, idx, centroids=cent)
    knn_pl.delete_from_ivf_index(idx, [3, 7])
    dst = str(tmp_path / "ivf2")
    knn_pl.compact_ivf_index(idx, dst)
    q = {"q": vecs[50].astype(np.float64)}
    want = knn_pl.ivf_index_topk(dst, q, 5, n_probe=4, round_decimals=6)
    # simulate the crash: one cell dir exists but its data file is gone
    cdirs = sorted(d for d in os.listdir(dst) if d.startswith("cell="))
    victim = os.path.join(dst, cdirs[0])
    os.remove(os.path.join(victim, "data.parquet"))
    knn_pl.compact_ivf_index(idx, dst)      # resume
    assert os.path.exists(os.path.join(victim, "data.parquet"))
    got = knn_pl.ivf_index_topk(dst, q, 5, n_probe=4, round_decimals=6)
    pd.testing.assert_frame_equal(want, got)


def test_pq_n_codes_over_256_rejected():
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((50, 8))
    ds = rd.from_arrow(_vec_table(vecs.astype(np.float32)))
    with pytest.raises(ValueError, match="256"):
        pq_pl.train_pq_codebook(ds, m_subspaces=2, n_codes=300)
    book = np.zeros((2, 300, 4))
    with pytest.raises(ValueError, match="256"):
        pq_pl.pq_encode(vecs, book)
