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


# ---------------------------------------------------------------------------
# Graph engine round 3: batched NN-descent build + incremental merge
# ---------------------------------------------------------------------------

def _clustered_vecs(seed=31, n_centers=6, per=60, d=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)) * 4
    return np.concatenate([c + rng.standard_normal((per, d))
                           for c in centers]).astype(np.float32)


def test_graph_incremental_merge_full_beam_exact(tmp_path):
    """The reference's headline incremental merge: both merge branches,
    searched at full beam, degenerate to brute force — so incremental
    merge == rebuild merge == exact, hash-identical."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=97, n_centers=5, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=5, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 37].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    outs = {}
    for mode in ("incremental", "rebuild"):
        dst = str(tmp_path / f"m_{mode}")
        graph_pl.merge_graph_index(idx, dst, merge_factor=5, mode=mode)
        outs[mode] = graph_pl.graph_topk(dst, queries, 10, ef_search=400,
                                         round_decimals=6)
        pd.testing.assert_frame_equal(outs[mode], exact)
    pd.testing.assert_frame_equal(outs["incremental"], outs["rebuild"])


def test_graph_incremental_merge_recall_and_leading_reuse(tmp_path):
    """Incremental merge keeps recall at normal beam width, and the
    leading partition's rows come first in the merged part (edge reuse,
    not a rebuild)."""
    import json as jsonmod
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=13, n_centers=4, per=80, d=24)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=6, m_degree=12,
                               ef_construction=48)
    dst = str(tmp_path / "m")
    graph_pl.merge_graph_index(idx, dst, merge_factor=6,
                               mode="incremental")
    parts = [p for p in os.listdir(dst) if p.startswith("part=")]
    assert len(parts) == 1
    queries = {f"q{i}": vecs[i * 29].astype(np.float64) for i in range(5)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    out = graph_pl.graph_topk(dst, queries, 10, ef_search=64,
                              round_decimals=6)
    recalls = []
    for q in queries:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(out[out.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.75, recalls
    # determinism
    out2 = graph_pl.graph_topk(dst, queries, 10, ef_search=64,
                               round_decimals=6)
    pd.testing.assert_frame_equal(out, out2)


def test_graph_incremental_merge_drops_tombstones(tmp_path):
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=67, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=6, m_degree=12,
                               ef_construction=48)
    merged = str(tmp_path / "m")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3,
                               deletes=[5, 17], mode="incremental")
    queries = {"q": vecs[5].astype(np.float64)}
    out = graph_pl.graph_topk(merged, queries, 10, ef_search=64,
                              round_decimals=6)
    got = set(out.vec_id)
    assert 5 not in got and 17 not in got


def test_graph_full_beam_reaches_every_node(tmp_path):
    """The Hamilton-cycle insurance edge: every written partition graph
    is strongly connected, so full beam visits all nodes even on data
    whose KNN edges would fragment into cliques."""
    from opensearch_jvector_ray.pipelines.graph import (
        _beam_batch, _decode_adjacency, _ensure_cycle, build_graph,
        _unitize,
    )
    # adversarial: far-apart tight cliques
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 8)) * 100
    vecs = np.concatenate([c + rng.standard_normal((30, 8)) * 0.01
                           for c in centers])
    nbrs = _ensure_cycle(build_graph(vecs, m_degree=6))
    unit = _unitize(vecs)
    n_nbrs = (nbrs >= 0).sum(axis=1).astype(np.int32)
    D, V = _beam_batch(unit, nbrs, [0], unit[:1], ef=len(vecs))
    assert set(V[0].tolist()) == set(range(len(vecs)))


# ---------------------------------------------------------------------------
# byte (int8) vectors + max_distance radial (VectorDataType / KNNEngine)
# ---------------------------------------------------------------------------

def test_byte_vector_validator():
    from opensearch_jvector_ray.functions.scoring import validate_byte_vector
    ok = validate_byte_vector(np.array([[1.0, -128.0, 127.0]]))
    assert ok.dtype == np.float64
    with pytest.raises(ValueError, match="whole numbers"):
        validate_byte_vector(np.array([[1.5, 2.0]]))
    with pytest.raises(ValueError, match="-128, 127"):
        validate_byte_vector(np.array([[200.0, 0.0]]))


def test_byte_topk_matches_float_path_on_integral_vectors():
    """int8 values are exactly representable in float64, so the byte path
    must score bit-identically to the float path on the same numbers —
    and it must actually ship int8 through the pipeline."""
    rng = np.random.default_rng(21)
    vecs = rng.integers(-128, 128, size=(200, 16)).astype(np.float64)
    ds = rd.from_arrow(_vec_table(vecs.astype(np.float32)))
    qs = {"q0": vecs[3], "q1": vecs[77]}
    want = knn_pl.brute_force_topk(ds, qs, 5, metric="l2",
                                   round_decimals=6)
    got = knn_pl.byte_topk(ds, qs, 5, metric="l2", round_decimals=6)
    pd.testing.assert_frame_equal(want, got)


def test_byte_topk_rejects_fractional_vectors():
    rng = np.random.default_rng(22)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    qs = {"q": np.round(vecs[0].astype(np.float64))}
    with pytest.raises(Exception, match="whole numbers"):
        knn_pl.byte_topk(ds, qs, 5, metric="l2")


def test_max_distance_radial_equals_min_score_path():
    from opensearch_jvector_ray.functions.scoring import distance_to_min_score
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((300, 12)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    qs = {"q": vecs[5].astype(np.float64)}
    # cosine: distance 0.75 -> score (2-0.75)/2 = 0.625 exactly
    assert distance_to_min_score("cosine", 0.75) == 0.625
    a = knn_pl.brute_force_topk(ds, qs, None, metric="cosine",
                                round_decimals=6, max_distance=0.75)
    b = knn_pl.brute_force_topk(ds, qs, None, metric="cosine",
                                round_decimals=6, min_score=0.625)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # l2: score = 1/(1+d)
    assert distance_to_min_score("l2", 3.0) == 0.25
    with pytest.raises(ValueError, match="not both"):
        knn_pl.brute_force_topk(ds, qs, None, metric="cosine",
                                min_score=0.5, max_distance=0.5)


def test_dictionary_salted_distributed_path_identical(tmp_path, monkeypatch):
    """NOTES item: force the distributed two-phase salted dictionary
    aggregation (the 1e8+-term shape) by dropping the local-path
    threshold to zero — the dictionary and search results must be
    IDENTICAL to the local Arrow group_by path."""
    import pyarrow.parquet as ppq
    from opensearch_jvector_ray.stages import build as build_mod
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rng = np.random.default_rng(117)
    texts = [" ".join(rng.choice(words, size=int(rng.integers(2, 7))))
             for _ in range(150)]
    tbl = _corpus(texts)
    cfg = EngineConfig(num_segments=4)
    idx_local = str(tmp_path / "local")
    build_index(rd.from_arrow(tbl), idx_local, cfg, IndexSpec())
    monkeypatch.setattr(build_mod, "DICT_LOCAL_MAX_PARTIALS", 0)
    idx_dist = str(tmp_path / "dist")
    build_index(rd.from_arrow(tbl), idx_dist, cfg, IndexSpec())
    a = ppq.read_table(os.path.join(idx_local, "dictionary")).to_pandas()
    b = ppq.read_table(os.path.join(idx_dist, "dictionary")).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    qs = {"q1": "alpha beta", "q2": "zeta eta gamma"}
    pd.testing.assert_frame_equal(IndexSearcher(idx_local).search(qs, k=20),
                                  IndexSearcher(idx_dist).search(qs, k=20))


def test_graph_search_service_identical_to_graph_topk(tmp_path):
    """The serving shape (long-lived per-partition actors, decoded-once
    graphs) must return frames identical to the per-call graph_topk —
    same beam, rescore and tie rules."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=29, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 41].astype(np.float64) for i in range(4)}
    want = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                               round_decimals=6)
    svc = graph_pl.GraphSearchService(idx, num_shards=2)
    try:
        got = svc.search(queries, 10, ef_search=64, round_decimals=6)
        pd.testing.assert_frame_equal(want, got)
        got2 = svc.search(queries, 10, ef_search=64, round_decimals=6)
        pd.testing.assert_frame_equal(got, got2)     # warm rerun identical
    finally:
        svc.shutdown()


def test_cli_knn_roundtrip(tmp_path):
    """knn-build -> knn-search -> knn-merge via the CLI (subprocesses own
    their Ray sessions, like the BM25 CLI test)."""
    import subprocess, sys
    import pyarrow.parquet as ppq
    rng = np.random.default_rng(31)
    vecs = _clustered_vecs(seed=31, n_centers=4, per=50, d=8)
    src = str(tmp_path / "vecs.parquet")
    ppq.write_table(_vec_table(vecs), src)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    idx = str(tmp_path / "gidx")
    built = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-build",
         "--input", src, "--index", idx, "--engine", "graph",
         "--num-parts", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert built.returncode == 0, built.stderr[-2000:]
    q = ",".join(str(float(x)) for x in vecs[7])
    found = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-search",
         "--index", idx, "--engine", "graph", f"--query={q}", "--k", "3",
         "--ef", "200"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert found.returncode == 0, found.stderr[-2000:]
    assert " 7 " in found.stdout or found.stdout.strip().splitlines()[1].split()[2] == "7"
    merged = str(tmp_path / "merged")
    mg = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-merge",
         "--index", idx, "--out", merged, "--merge-factor", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert mg.returncode == 0, mg.stderr[-2000:]
    assert os.path.isdir(os.path.join(merged, "part=0"))


# ---------------------------------------------------------------------------
# real PNG decode (stdlib zlib, RFC 2083 filters)
# ---------------------------------------------------------------------------

def test_png_roundtrip_rgb_and_gray():
    from opensearch_jvector_ray.pipelines.multimodal import (
        png_bytes, png_decode,
    )
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_bytes(img)), img)
    gray = rng.integers(0, 256, size=(9, 31), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_bytes(gray)),
                                  gray[:, :, None])
    rgba = rng.integers(0, 256, size=(12, 8, 4), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_bytes(rgba)), rgba)


def test_png_decoder_handles_all_filters():
    """Encode scanlines with each PNG filter (forward direction per the
    spec) and assert the decoder unfilters back to the original."""
    import struct
    import zlib
    from opensearch_jvector_ray.pipelines.multimodal import png_decode
    rng = np.random.default_rng(7)
    h, w, ch = 6, 5, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = y % 5                      # exercise every filter type
        line = img[y].reshape(-1).astype(np.int32)
        filt = np.empty(stride, dtype=np.uint8)
        for x in range(stride):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] - a
            elif ftype == 2:
                v = line[x] - b
            elif ftype == 3:
                v = line[x] - ((a + b) >> 1)
            else:
                v = line[x] - paeth(a, b, c)
            filt[x] = v & 0xFF
        raw.append(ftype)
        raw.extend(filt.tobytes())
        prev = line

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + \
            struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    np.testing.assert_array_equal(png_decode(payload), img)


def test_image_features_planted_gradient():
    """Planted-signal test (the PNG analog of the WAV sine): a known
    two-tone gradient's decoded channel means match analytic values."""
    from opensearch_jvector_ray.pipelines.multimodal import (
        DecodeStub, png_bytes,
    )
    w, h = 32, 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = 100
    img[:, :, 1] = np.linspace(0, 200, w).astype(np.uint8)[None, :]
    img[:, :, 2] = 50
    feat = DecodeStub(feature_dim=16)._decode_one(png_bytes(img), "image")
    assert feat[0] == w and feat[1] == h
    assert abs(feat[3] - 100 / 255) < 1e-3          # mean R
    assert abs(feat[5] - 50 / 255) < 1e-3           # mean B
    g_expect = np.linspace(0, 200, w).astype(np.uint8).mean() / 255
    assert abs(feat[4] - g_expect) < 1e-3           # mean G


def test_decode_features_real_images_pipeline():
    from opensearch_jvector_ray.pipelines import multimodal as mm
    tbl = mm.synth_image_table(60)
    out = mm.decode_features(rd.from_arrow(tbl), fake=False).to_pandas()
    assert len(out) == 60
    assert all(len(f) == 16 for f in out["feature"])
    # widths recorded in meta match decoded feature[0]
    widths = {m["width"] for m in tbl["meta"].to_pylist()}
    got = {int(f[0]) for f in out["feature"]}
    assert got == widths or got <= widths


def test_video_frame_sampling_planted_motion():
    """OJRV (length-prefixed PNG frames) decodes for real: a moving
    square yields nonzero motion; a static clip yields zero."""
    from opensearch_jvector_ray.pipelines.multimodal import (
        DecodeStub, video_bytes,
    )
    moving = []
    for f in range(4):
        img = np.full((12, 20, 3), 20, dtype=np.uint8)
        img[2:6, f * 4: f * 4 + 4] = 230
        moving.append(img)
    stub = DecodeStub(feature_dim=16)
    feat = stub._decode_one(video_bytes(moving), "video")
    assert feat[0] == 4 and feat[1] == 20 and feat[2] == 12
    assert feat[3] > 0.01                           # motion
    static = stub._decode_one(video_bytes([moving[0]] * 4), "video")
    assert static[3] == 0.0
    # MP4 payloads now take the real demux path (pipelines/mp4.py): a
    # truncated BMFF header is a malformed-container error, not an
    # unsupported-codec one; genuinely foreign containers still raise
    # NotImplementedError
    with pytest.raises(ValueError, match="malformed"):
        stub._decode_one(b"\x00\x00\x00\x20ftypmp42", "video")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        stub._decode_one(b"RIFFxxxxAVI LIST", "video")


def test_decode_features_real_video_pipeline():
    from opensearch_jvector_ray.pipelines import multimodal as mm
    tbl = mm.synth_video_table(40)
    out = mm.decode_features(rd.from_arrow(tbl), fake=False).to_pandas()
    assert len(out) == 40
    nf = {int(f[0]) for f in out["feature"]}
    assert nf <= set(range(2, 6))
    # the mixed media table (now all-real payloads) decodes with fake=False
    mixed = mm.decode_features(rd.from_arrow(mm.synth_media_table(60)),
                               fake=False).to_pandas()
    assert len(mixed) == 60


def test_cli_build_from_jsonl(tmp_path):
    """JSONL ingestion (the reference's bulk-JSON analog): build from a
    .jsonl corpus via the CLI and search it."""
    import subprocess, sys, json as jsonmod
    src = tmp_path / "docs.jsonl"
    with open(src, "w") as f:
        for i in range(30):
            f.write(jsonmod.dumps({
                "conv_id": f"c{i:04d}", "turn_idx": 0, "role": "user",
                "text": "zebra apple" if i % 3 == 0 else "pear plum",
                "tool": "", "ts": i}) + "\n")
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    idx = str(tmp_path / "idx")
    built = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "build",
         "--input", str(src), "--index", idx, "--segments", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert built.returncode == 0, built.stderr[-2000:]
    info = jsonmod.loads(built.stdout.strip().splitlines()[-1])
    assert info["num_docs"] == 30
    found = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "search",
         "--index", idx, "--query", "zebra", "--k", "20"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert found.returncode == 0, found.stderr[-2000:]
    assert found.stdout.count("c0") >= 10        # the zebra third


def test_corpus_clean_composite_chain():
    """Planted case for the quality->language->dedup composite: short
    docs and stopword-free docs drop, duplicates collapse to min id."""
    from opensearch_jvector_ray.pipelines.corpus import clean_corpus
    texts = [
        "the quick brown fox jumps over the lazy dog",   # 0 keeps
        "the quick brown fox jumps over the lazy dog",   # 1 dup of 0
        "tiny",                                          # 2 too short
        "alpha beta gamma delta epsilon zeta eta",       # 3 no stopwords
        "it is a warm day and the sun shines brightly",  # 4 keeps
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(texts)})
    out = (clean_corpus(rd.from_arrow(tbl), EngineConfig(), "doc_id",
                        "text", min_tokens=5, stop_threshold=0.1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 4]
    assert out["n_tokens"].tolist() == [9, 10]


def test_graph_full_beam_exactness_randomized():
    """Property: for random shapes/degrees, full-beam search over a
    built graph equals brute force EXACTLY (rounded-rank rule) — the
    foundation of the degenerate-exact driver oracles."""
    from opensearch_jvector_ray.pipelines.graph import (
        _beam_batch, _ensure_cycle, _unitize, build_graph,
    )
    from opensearch_jvector_ray.functions.scoring import (
        cosine_score, cosine_similarity,
    )
    rng = np.random.default_rng(1234)
    for trial in range(10):
        n = int(rng.integers(2, 80))
        d = int(rng.integers(2, 24))
        m = int(rng.integers(2, 10))
        vecs = rng.standard_normal((n, d))
        if trial % 3 == 0:                 # degenerate: duplicated rows
            vecs[: n // 2] = vecs[0]
        nbrs = _ensure_cycle(build_graph(vecs, m_degree=m,
                                         ef_construction=16))
        unit = _unitize(vecs)
        n_nbrs = (nbrs >= 0).sum(axis=1).astype(np.int32)
        q = vecs[int(rng.integers(0, n))]
        qn = (q / (np.linalg.norm(q) or 1.0)).astype(np.float64)
        _, V = _beam_batch(unit, nbrs, [0], qn[None, :], ef=n)
        got = set(V[0][V[0] >= 0].tolist())
        assert got == set(range(n)), \
            f"trial {trial}: full beam missed {set(range(n)) - got}"
        # rounded-rank top-k equals brute force
        k = min(5, n)
        score = np.round(cosine_score(cosine_similarity(vecs, q)), 6)
        order = np.lexsort((np.arange(n), -score))[:k]
        cand = V[0][V[0] >= 0]
        cs = np.round(cosine_score(cosine_similarity(vecs[cand], q)), 6)
        corder = cand[np.lexsort((cand, -cs))][:k]
        np.testing.assert_array_equal(corder, order)


def test_graph_incremental_merge_exactness_randomized():
    """Property: random partition splits merged incrementally stay
    full-beam exact (every node reachable after leading-edge reuse +
    bulk insert + cycle insurance)."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(77)
    for trial in range(4):
        n_parts = int(rng.integers(2, 6))
        vecs = _clustered_vecs(seed=int(rng.integers(0, 1000)),
                               n_centers=3, per=40, d=12)
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            ds = rd.from_arrow(_vec_table(vecs))
            idx = os.path.join(td, "g")
            graph_pl.build_graph_index(ds, idx, num_parts=n_parts,
                                       m_degree=8, ef_construction=24)
            dst = os.path.join(td, "m")
            graph_pl.merge_graph_index(idx, dst, merge_factor=n_parts,
                                       mode="incremental")
            queries = {"q": vecs[int(rng.integers(0, len(vecs)))]
                       .astype(np.float64)}
            exact = knn_pl.brute_force_topk(ds, queries, 8,
                                            metric="cosine",
                                            round_decimals=6)
            out = graph_pl.graph_topk(dst, queries, 8,
                                      ef_search=len(vecs),
                                      round_decimals=6)
            pd.testing.assert_frame_equal(out, exact)


# ---------------------------------------------------------------------------
# JSON query DSL (KNNQueryBuilderParser-strict parse + translate)
# ---------------------------------------------------------------------------

def test_query_dsl_validation():
    from opensearch_jvector_ray.query_dsl import parse_query
    with pytest.raises(ValueError, match="exactly one top-level"):
        parse_query({"match": {}, "knn": {}})
    with pytest.raises(ValueError, match="does not support"):
        parse_query({"match": {"query": "x", "bogus": 1}})
    with pytest.raises(ValueError, match="unknown mode"):
        parse_query({"match": {"query": "x", "mode": "zap"}})
    with pytest.raises(ValueError, match="not.*both|not .*both"):
        parse_query({"knn": {"vector": [1.0], "min_score": 0.5,
                             "max_distance": 0.5}})
    with pytest.raises(ValueError, match="unknown query clause"):
        parse_query({"zap_clause": {}})
    with pytest.raises(ValueError, match="non-empty 'value' pattern"):
        parse_query({"regexp": {}})   # regexp is a real clause now
    s = parse_query({"knn": {"vector": [1, 2], "metric": "l2"}})
    assert s["type"] == "knn" and s["k"] == 10


def test_query_dsl_execution_matches_direct_calls(tmp_path):
    from opensearch_jvector_ray.query_dsl import execute_query
    texts = ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
             "delta eps"] * 4
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus(texts)), idx,
                EngineConfig(num_segments=2), IndexSpec())
    s = IndexSearcher(idx)
    a = execute_query({"match": {"query": "alpha beta", "k": 5}},
                      searcher=s)
    b = s.search({"q": "alpha beta"}, k=5)
    pd.testing.assert_frame_equal(a, b)
    a = execute_query({"bool": {"must": ["alpha"], "must_not": ["gamma"],
                                "should": ["beta"], "k": 10}}, searcher=s)
    b = s.search({"q": "beta +alpha -gamma"}, k=10, mode="boolean")
    pd.testing.assert_frame_equal(a, b)
    # knn with filter + max_distance
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    vt = pa.table({
        "vec_id": pa.array(range(100), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(100)], type=pa.int32())})
    ds = rd.from_arrow(vt)
    a = execute_query({"knn": {"vector": vecs[7].tolist(), "k": 5,
                               "filter": {"term": {"label": 3}}}},
                      vector_ds=ds)
    import pyarrow.compute as pc2
    b = knn_pl.brute_force_topk(ds, {"q": vecs[7].astype(np.float64)}, 5,
                                metric="cosine", round_decimals=6,
                                filter_expr=pc2.field("label") == 3)
    pd.testing.assert_frame_equal(a, b)
    a = execute_query({"knn": {"vector": vecs[7].tolist(),
                               "max_distance": 0.75}}, vector_ds=ds)
    b = knn_pl.brute_force_topk(ds, {"q": vecs[7].astype(np.float64)},
                                None, metric="cosine", round_decimals=6,
                                max_distance=0.75)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# Quantized graph search: PQ-scored traversal + exact rerank (the
# reference's quantized mode — `JVectorWriter.flush` trains segment-local
# PQ, `JVectorReader.search` walks on approximate scores and exact-reranks,
# `JVectorReader.java:154-166`)
# ---------------------------------------------------------------------------

def test_graph_pq_full_beam_exact_and_merge_refines(tmp_path):
    """Full beam + exact rerank == brute force EVEN with a deliberately
    coarse codebook (PQ reorders the walk, never the scores); incremental
    merge reuses the leading partition's codebook verbatim
    (refine-never-retrain) and stays full-beam exact."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=41, n_centers=5, per=70, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48, pq_m_subspaces=4,
                               pq_n_codes=8, pq_min_rows=2)
    parts = sorted(p for p in os.listdir(idx) if p.startswith("part="))
    assert all(os.path.exists(os.path.join(idx, p, "pq.npz"))
               for p in parts)
    queries = {f"q{i}": vecs[i * 31].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    out = graph_pl.graph_topk(idx, queries, 10, ef_search=400,
                              round_decimals=6)
    pd.testing.assert_frame_equal(out, exact)

    lead_sizes = {p: papq.read_table(
        os.path.join(idx, p, "graph.parquet")).num_rows for p in parts}
    lead = max(lead_sizes, key=lambda p: lead_sizes[p])
    lead_book = np.load(os.path.join(idx, lead, "pq.npz"))["book"]
    merged = str(tmp_path / "m")
    graph_pl.merge_graph_index(idx, merged, merge_factor=4,
                               mode="incremental")
    mbook = np.load(os.path.join(merged, "part=0", "pq.npz"))["book"]
    np.testing.assert_array_equal(mbook, lead_book)
    out_m = graph_pl.graph_topk(merged, queries, 10, ef_search=400,
                                round_decimals=6)
    pd.testing.assert_frame_equal(out_m, exact)


def test_graph_pq_recall_and_service_identity(tmp_path):
    """Quantized traversal at normal beam width keeps recall >= 0.75 (the
    RecallTestsIT.java:101 floor), and the serve-shape actors return a
    frame identical to graph_topk under the same PQ flags."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=59, n_centers=5, per=80, d=32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48, pq_m_subspaces=8,
                               pq_n_codes=64, pq_min_rows=2)
    queries = {f"q{i}": vecs[i * 23].astype(np.float64) for i in range(5)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    out = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                              round_decimals=6)
    recalls = [len(set(exact[exact.query_id == q].vec_id)
                   & set(out[out.query_id == q].vec_id)) / 10
               for q in queries]
    assert np.mean(recalls) >= 0.75, recalls
    svc = graph_pl.GraphSearchService(idx, num_shards=2)
    try:
        sv = svc.search(queries, 10, ef_search=64, round_decimals=6)
    finally:
        svc.shutdown()
    pd.testing.assert_frame_equal(sv, out)


def test_graph_pq_min_rows_skips_small_partitions(tmp_path):
    """Partitions below pq_min_rows stay unquantized (the reference's
    min-batch-for-quantization rule) and search falls back to
    full-precision traversal there — identical to use_pq=False."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=71, n_centers=3, per=40, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48, pq_m_subspaces=4,
                               pq_n_codes=16, pq_min_rows=10_000)
    parts = sorted(p for p in os.listdir(idx) if p.startswith("part="))
    assert not any(os.path.exists(os.path.join(idx, p, "pq.npz"))
                   for p in parts)
    queries = {f"q{i}": vecs[i * 17].astype(np.float64) for i in range(3)}
    a = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                            round_decimals=6, use_pq=True)
    b = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                            round_decimals=6, use_pq=False)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# IVF-PQ combined index: cell routing prunes the read, ADC codes-only first
# pass, exact rerank (the similarity-search scale path)
# ---------------------------------------------------------------------------

def test_ivfpq_full_probe_full_oversample_exact(tmp_path):
    """All cells probed + oversample covering the table == brute force
    (candidate selection saturates, rerank is exact full precision) —
    the degenerate-exact identity behind the knn_ivfpq_rerank gate."""
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=83, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivfpq")
    pq_pl.build_ivfpq_index(ds, idx, n_centroids=4, m_subspaces=4,
                            n_codes=8)
    queries = {f"q{i}": vecs[i * 37].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    out = pq_pl.ivfpq_topk(idx, queries, 10, n_probe=4,
                           oversample=len(vecs) / 10.0, round_decimals=6)
    pd.testing.assert_frame_equal(out, exact)


def test_ivfpq_recall_and_probe_pruning(tmp_path):
    """Normal settings keep recall >= 0.75 on clustered data, and every
    returned hit belongs to a PROBED cell (the read really is pruned)."""
    from opensearch_jvector_ray.pipelines import knn as knn_mod
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=97, n_centers=6, per=60, d=32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivfpq")
    pq_pl.build_ivfpq_index(ds, idx, n_centroids=6, m_subspaces=8,
                            n_codes=64)
    queries = {f"q{i}": vecs[i * 41].astype(np.float64) for i in range(5)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    out = pq_pl.ivfpq_topk(idx, queries, 10, n_probe=3, oversample=4.0,
                           round_decimals=6)
    recalls = [len(set(exact[exact.query_id == q].vec_id)
                   & set(out[out.query_id == q].vec_id)) / 10
               for q in queries]
    assert np.mean(recalls) >= 0.75, recalls

    centroids = np.load(os.path.join(idx, pq_pl.IVFPQ_CENTROIDS))
    qmat = np.stack([queries[q] for q in sorted(queries)])
    probe = knn_mod._probe_cells(qmat.astype(np.float64), centroids, 3)
    cell_of = knn_mod._assign_cells(vecs.astype(np.float64), centroids)
    for qi, qid in enumerate(sorted(queries)):
        hit_cells = {int(cell_of[v]) for v in
                     out[out.query_id == qid].vec_id}
        assert hit_cells <= set(probe[qi].tolist())


# ---------------------------------------------------------------------------
# Filtered graph search (pre-filter + over-query, J2 for the graph engine)
# ---------------------------------------------------------------------------

def test_graph_filtered_full_beam_equals_filtered_brute_force(tmp_path):
    """filter_ids is a PRE-filter (`KNNQueryBuilder.java:534-539`): at
    full beam the filtered graph search must be hash-identical to brute
    force over only the allowed rows — both the beam+post-filter path
    (large allow-list) and the exact-fallback path (small allow-list)."""
    import pyarrow.compute as pc
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=71, n_centers=5, per=50, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 37].astype(np.float64) for i in range(4)}
    for allowed in (np.arange(0, len(vecs), 2),        # broad: beam path
                    np.array([3, 17, 41, 99, 150])):   # selective: exact
        exact = knn_pl.brute_force_topk(
            ds, queries, 10, metric="cosine", round_decimals=6,
            filter_expr=pc.field("vec_id").isin(pa.array(allowed)))
        got = graph_pl.graph_topk(idx, queries, 10, ef_search=400,
                                  round_decimals=6, filter_ids=allowed)
        pd.testing.assert_frame_equal(got, exact)
        assert set(got.vec_id) <= set(allowed.tolist())


def test_graph_filtered_service_identical_and_empty_filter(tmp_path):
    """The serving actors take the same filter and must match graph_topk
    frame-for-frame; an allow-list hitting no rows returns empty."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=83, n_centers=4, per=50, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 31].astype(np.float64) for i in range(3)}
    allowed = np.arange(0, len(vecs), 3)
    want = graph_pl.graph_topk(idx, queries, 10, ef_search=64,
                               round_decimals=6, filter_ids=allowed)
    svc = graph_pl.GraphSearchService(idx, num_shards=2)
    try:
        got = svc.search(queries, 10, ef_search=64, round_decimals=6,
                         filter_ids=allowed)
        pd.testing.assert_frame_equal(want, got)
        none = svc.search(queries, 10, ef_search=64, round_decimals=6,
                          filter_ids=np.array([10**9]))
        assert none.empty
    finally:
        svc.shutdown()


# ---------------------------------------------------------------------------
# Radial graph search (min_score / max_distance, KNNQueryBuilder.java:438-472)
# ---------------------------------------------------------------------------

def test_graph_radial_full_beam_equals_brute_force(tmp_path):
    """min_score switches the graph engine to radial mode: at full beam
    the visited pool is the whole index (Hamilton-cycle connectivity), so
    the unbounded score>=theta result must be frame-identical to
    brute-force radial; max_distance is the translated form and must give
    the same frame."""
    from opensearch_jvector_ray.functions import scoring
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=91, n_centers=5, per=50, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 41].astype(np.float64) for i in range(4)}
    theta = 0.9
    exact = knn_pl.brute_force_topk(ds, queries, None, metric="cosine",
                                    round_decimals=6, min_score=theta)
    assert len(exact) > 0 and exact.groupby("query_id").size().max() > 10
    got = graph_pl.graph_topk(idx, queries, None, ef_search=400,
                              round_decimals=6, min_score=theta)
    pd.testing.assert_frame_equal(got, exact)
    # max_distance arm: cosine distance d -> min_score (2-d)/2
    dist = scoring.distance_to_min_score("cosine", 0.2)
    assert abs(dist - theta) < 1e-12
    got_d = graph_pl.graph_topk(idx, queries, None, ef_search=400,
                                round_decimals=6, max_distance=0.2)
    pd.testing.assert_frame_equal(got_d, exact)
    with pytest.raises(ValueError):
        graph_pl.graph_topk(idx, queries, None, min_score=0.5,
                            max_distance=0.2)


def test_graph_radial_with_filter_and_service(tmp_path):
    """Radial composes with the pre-filter (both must restrict), and the
    serving actors return the identical frame."""
    import pyarrow.compute as pc
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=97, n_centers=4, per=50, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 29].astype(np.float64) for i in range(3)}
    allowed = np.arange(0, len(vecs), 2)
    exact = knn_pl.brute_force_topk(
        ds, queries, None, metric="cosine", round_decimals=6,
        min_score=0.9,
        filter_expr=pc.field("vec_id").isin(pa.array(allowed)))
    got = graph_pl.graph_topk(idx, queries, None, ef_search=400,
                              round_decimals=6, min_score=0.9,
                              filter_ids=allowed)
    pd.testing.assert_frame_equal(got, exact)
    svc = graph_pl.GraphSearchService(idx, num_shards=2)
    try:
        got_s = svc.search(queries, None, ef_search=400, round_decimals=6,
                           min_score=0.9, filter_ids=allowed)
        pd.testing.assert_frame_equal(got_s, exact)
    finally:
        svc.shutdown()


# ---------------------------------------------------------------------------
# Filtered / radial IVF search (pre-filter + radial on the IVF engine)
# ---------------------------------------------------------------------------

def test_ivf_filtered_and_radial_full_probe_exact(tmp_path):
    """At FULL probe (every cell read) the persisted-IVF search with a
    pre-filter equals filtered brute force, and min_score/max_distance
    radial equals brute radial; at partial probe the filter still
    restricts results to the allow-list."""
    import pyarrow.compute as pc
    vecs = _clustered_vecs(seed=101, n_centers=6, per=40, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivf")
    cent = knn_pl.fixed_centroids(ds, [0, 40, 80, 120, 160, 200])
    knn_pl.build_ivf_index(ds, idx, centroids=cent)
    queries = {f"q{i}": vecs[i * 43].astype(np.float64) for i in range(3)}
    allowed = np.arange(0, len(vecs), 2)
    exact = knn_pl.brute_force_topk(
        ds, queries, 10, metric="cosine", round_decimals=6,
        filter_expr=pc.field("vec_id").isin(pa.array(allowed)))
    got = knn_pl.ivf_index_topk(idx, queries, 10, n_probe=6,
                                round_decimals=6, filter_ids=allowed)
    pd.testing.assert_frame_equal(got, exact)
    # partial probe: approximate, but the allow-list still binds
    part = knn_pl.ivf_index_topk(idx, queries, 10, n_probe=2,
                                 round_decimals=6, filter_ids=allowed)
    assert set(part.vec_id) <= set(allowed.tolist())
    # radial: full probe == brute radial; max_distance arm identical
    rexact = knn_pl.brute_force_topk(ds, queries, None, metric="cosine",
                                     round_decimals=6, min_score=0.9)
    assert len(rexact) > 0
    rgot = knn_pl.ivf_index_topk(idx, queries, None, n_probe=6,
                                 round_decimals=6, min_score=0.9)
    pd.testing.assert_frame_equal(rgot, rexact)
    rgot_d = knn_pl.ivf_index_topk(idx, queries, None, n_probe=6,
                                   round_decimals=6, max_distance=0.2)
    pd.testing.assert_frame_equal(rgot_d, rexact)
    with pytest.raises(ValueError):
        knn_pl.ivf_index_topk(idx, queries, None, min_score=0.5,
                              max_distance=0.2)


def test_ivfpq_filtered_degenerate_exact(tmp_path):
    """IVF-PQ pre-filter: at full probe + full oversample the filtered
    search equals filtered brute force; at approximate settings hits
    stay inside the allow-list."""
    import pyarrow.compute as pc
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=103, n_centers=5, per=40, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivfpq")
    pq_pl.build_ivfpq_index(ds, idx, n_centroids=5, m_subspaces=8,
                            n_codes=16)
    queries = {f"q{i}": vecs[i * 47].astype(np.float64) for i in range(3)}
    allowed = np.arange(0, len(vecs), 2)
    exact = knn_pl.brute_force_topk(
        ds, queries, 10, metric="cosine", round_decimals=6,
        filter_expr=pc.field("vec_id").isin(pa.array(allowed)))
    got = pq_pl.ivfpq_topk(idx, queries, 10, n_probe=5,
                           oversample=len(vecs) / 10,
                           round_decimals=6, filter_ids=allowed)
    pd.testing.assert_frame_equal(got, exact)
    part = pq_pl.ivfpq_topk(idx, queries, 10, n_probe=2, oversample=2.0,
                            round_decimals=6, filter_ids=allowed)
    assert set(part.vec_id) <= set(allowed.tolist())


def test_ivfpq_compacted_layout_and_fused_trainer(tmp_path):
    """The IVF-PQ (and IVF) builders must emit ONE compacted file per
    cell dir (tiny per-block files dominated query latency), and the
    fused single-sample trainer must produce bit-identical quantizers to
    the two separate trainers."""
    import glob
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=107, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    cent_sep = knn_pl.train_centroids(ds, 4, "embedding")
    book_sep = pq_pl.train_pq_codebook(ds, m_subspaces=8, n_codes=16,
                                       vec_col="embedding")
    cent_f, book_f = pq_pl._train_ivfpq(ds, n_centroids=4, m_subspaces=8,
                                        n_codes=16, vec_col="embedding")
    np.testing.assert_array_equal(cent_sep, cent_f)
    np.testing.assert_array_equal(book_sep, book_f)
    idx = str(tmp_path / "ivfpq")
    pq_pl.build_ivfpq_index(ds, idx, n_centroids=4, m_subspaces=8,
                            n_codes=16)
    cells = glob.glob(str(tmp_path / "ivfpq" / "cell=*"))
    assert cells
    for c in cells:
        assert [os.path.basename(f) for f in glob.glob(c + "/*.parquet")] \
            == ["data-0.parquet"]
    idx2 = str(tmp_path / "ivf")
    knn_pl.build_ivf_index(ds, idx2, n_centroids=4)
    for c in glob.glob(str(tmp_path / "ivf" / "cell=*")):
        assert [os.path.basename(f) for f in glob.glob(c + "/*.parquet")] \
            == ["data-0.parquet"]
    with pytest.raises(ValueError):
        pq_pl._train_ivfpq(ds, n_centroids=4, m_subspaces=8, n_codes=300,
                           vec_col="embedding")


def test_descent_wider_working_degree_breaks_uniform_plateau():
    """build_degree_mult > 1 (expanded candidate sets — descent at a
    wider working degree, pruned at finalize) must substantially lift
    NN-descent edge quality on UNIFORM data, where mult=1 plateaus
    (Dong et al. 2011 s5); graph shape contracts must hold."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(0)
    n, d, m = 6000, 64, 8
    X = rng.standard_normal((n, d))
    unit = graph_pl._unitize(X)
    dist = -(unit @ unit.T)
    np.fill_diagonal(dist, np.inf)
    exact = np.argpartition(dist, m - 1, axis=1)[:, :m]

    def quality(nbrs):
        hit = sum(len(set(nbrs[i][nbrs[i] >= 0].tolist())
                      & set(exact[i].tolist())) for i in range(n))
        return hit / (n * m)

    # pin method="descent": this test measures the DESCENT knob
    # specifically (auto would route 6k rows to exact construction)
    g1 = graph_pl.build_graph(X, m_degree=m, build_degree_mult=1,
                              method="descent")
    g2 = graph_pl.build_graph(X, m_degree=m, build_degree_mult=2,
                              method="descent")
    assert g1.shape == g2.shape == (n, m)
    q1, q2 = quality(g1), quality(g2)
    # measured: q1~0.26 (the plateau), q2~0.67
    assert q2 > q1 + 0.25, (q1, q2)
    assert q2 > 0.5, q2


def test_cli_knn_search_filter_and_radial(tmp_path):
    """--filter-ids restricts CLI hits to the allow-list; --min-score
    switches to radial; both flags on the pq engine error out."""
    import subprocess, sys
    import pyarrow.parquet as ppq
    vecs = _clustered_vecs(seed=37, n_centers=3, per=40, d=8)
    src = str(tmp_path / "vecs.parquet")
    ppq.write_table(_vec_table(vecs), src)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    idx = str(tmp_path / "gidx")
    assert subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-build",
         "--input", src, "--index", idx, "--engine", "graph",
         "--num-parts", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300).returncode == 0
    q = ",".join(str(float(x)) for x in vecs[7])
    flt = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-search",
         "--index", idx, "--engine", "graph", f"--query={q}", "--k", "3",
         "--ef", "200", "--filter-ids", "2,4,6,8"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert flt.returncode == 0, flt.stderr[-2000:]
    hits = {int(line.split()[2]) for line in
            flt.stdout.strip().splitlines()[1:]}
    assert hits <= {2, 4, 6, 8} and hits
    rad = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-search",
         "--index", idx, "--engine", "graph", f"--query={q}",
         "--ef", "200", "--min-score", "0.99"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert rad.returncode == 0, rad.stderr[-2000:]
    bad = subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", "knn-search",
         "--index", idx, "--engine", "pq", f"--query={q}",
         "--min-score", "0.5"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert bad.returncode != 0


# ---------------------------------------------------------------------------
# Deterministic sampling / split assignment (dataset-mixing machinery)
# ---------------------------------------------------------------------------

def test_hash_sample_and_split_deterministic():
    """Membership depends only on (id, salt): stable across reruns and
    input partitioning, rate approximately honored, splits partition the
    corpus exactly, different salts draw different samples."""
    from opensearch_jvector_ray.pipelines.corpus import (
        hash_sample, hash_split, sample_threshold_hex,
    )
    ids = pa.table({"doc_id": pa.array(np.arange(10000, dtype=np.int64))})
    ds = rd.from_arrow(ids)
    s1 = hash_sample(ds, "doc_id", 0.3, salt="a").to_pandas()
    s2 = hash_sample(rd.from_arrow(ids).repartition(7),
                     "doc_id", 0.3, salt="a").to_pandas()
    assert sorted(s1.doc_id) == sorted(s2.doc_id)      # partitioning-proof
    assert abs(len(s1) / 10000 - 0.3) < 0.03           # rate honored
    s3 = hash_sample(ds, "doc_id", 0.3, salt="b").to_pandas()
    assert sorted(s1.doc_id) != sorted(s3.doc_id)      # salt reseeds
    assert len(hash_sample(ds, "doc_id", 1.0).to_pandas()) == 10000
    assert len(hash_sample(ds, "doc_id", 0.0).to_pandas()) == 0
    sp = hash_split(ds, "doc_id",
                    {"train": 0.8, "val": 0.1, "test": 0.1},
                    salt="a").to_pandas()
    assert len(sp) == 10000 and set(sp.split) == {"train", "val", "test"}
    frac = sp.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    # a sampled row keeps its split: sample is a PREFIX of the hash
    # range, so sample(0.1, salt) ⊂ the first split edge range
    assert sample_threshold_hex(0.0) == "0000"
    assert sample_threshold_hex(0.5) == "8000"


def test_pack_chunks_prefix_scan_invariants():
    """pack_chunks must be a true global prefix scan: offsets contiguous
    in id order, pack boundaries exactly at multiples of the budget, and
    the result invariant to input partitioning."""
    from opensearch_jvector_ray.pipelines.corpus import pack_chunks
    rng = np.random.default_rng(5)
    words = [" ".join(f"w{rng.integers(1000)}" for _ in range(rng.integers(1, 40)))
             for _ in range(400)]
    tbl = pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64)),
                    "text": pa.array(words)})
    cfg = EngineConfig()
    out = (pack_chunks(rd.from_arrow(tbl), cfg, "doc_id", "text",
                       budget=100).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 400
    start = (out.pack_id * 100 + out.pack_offset).to_numpy()
    expect = np.zeros(400, dtype=np.int64)
    np.cumsum(out.n_tokens.to_numpy()[:-1], out=expect[1:])
    np.testing.assert_array_equal(start, expect)        # global tape
    out7 = (pack_chunks(rd.from_arrow(tbl).repartition(7), cfg,
                        "doc_id", "text", budget=100).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out7)            # partition-proof
    with pytest.raises(ValueError):
        pack_chunks(rd.from_arrow(tbl), cfg, "doc_id", "text", budget=0)


def test_ivfpq_lifecycle_add_delete_compact(tmp_path):
    """IVF-PQ refine-not-retrain lifecycle: added vectors are encoded
    with the EXISTING quantizers, tombstoned ids vanish from results, and
    compaction preserves exactness; degenerate-exact settings must equal
    brute force over the live rows at every step."""
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    vecs = _clustered_vecs(seed=109, n_centers=4, per=40, d=16)
    base, extra = vecs[:120], vecs[120:]
    ds_base = rd.from_arrow(_vec_table(base))
    idx = str(tmp_path / "ivfpq")
    pq_pl.build_ivfpq_index(ds_base, idx, n_centroids=4, m_subspaces=8,
                            n_codes=16)
    book_before = np.load(os.path.join(idx, pq_pl.CODEBOOK_NAME))
    tbl_extra = pa.table({
        "vec_id": pa.array(np.arange(120, len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in extra]),
    })
    pq_pl.add_to_ivfpq_index(rd.from_arrow(tbl_extra), idx)
    np.testing.assert_array_equal(       # refine, never retrain
        book_before, np.load(os.path.join(idx, pq_pl.CODEBOOK_NAME)))
    queries = {f"q{i}": vecs[i * 31].astype(np.float64) for i in range(3)}
    ds_all = rd.from_arrow(_vec_table(vecs))
    exact = knn_pl.brute_force_topk(ds_all, queries, 10, metric="cosine",
                                    round_decimals=6)
    got = pq_pl.ivfpq_topk(idx, queries, 10, n_probe=4,
                           oversample=len(vecs) / 10, round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    # delete some of the exact winners — they must vanish
    victims = exact.vec_id.unique()[:5].tolist()
    pq_pl.delete_from_ivfpq_index(idx, victims)
    keep_tbl = _vec_table(vecs).filter(
        pa.compute.invert(pa.compute.is_in(
            pa.array(np.arange(len(vecs), dtype=np.int64)),
            value_set=pa.array(victims, type=pa.int64()))))
    exact_live = knn_pl.brute_force_topk(rd.from_arrow(keep_tbl), queries,
                                         10, metric="cosine",
                                         round_decimals=6)
    got_live = pq_pl.ivfpq_topk(idx, queries, 10, n_probe=4,
                                oversample=len(vecs) / 10,
                                round_decimals=6)
    pd.testing.assert_frame_equal(got_live, exact_live)
    # compact: tombstones physically dropped, results unchanged
    dst = str(tmp_path / "compacted")
    pq_pl.compact_ivfpq_index(idx, dst)
    got_c = pq_pl.ivfpq_topk(dst, queries, 10, n_probe=4,
                             oversample=len(vecs) / 10, round_decimals=6)
    pd.testing.assert_frame_equal(got_c, exact_live)


def test_graph_lifecycle_add_delete_merge(tmp_path):
    """Graph-engine update lifecycle: add_to_graph_index bulk-inserts new
    rows into the frozen partition graphs (idempotent on repeat),
    delete_from_graph_index tombstones mask every search path, and a
    compacting merge drops them physically — full beam == brute force
    over the LIVE rows at every step."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=113, n_centers=4, per=50, d=16)
    base, extra = vecs[:150], vecs[150:]
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(rd.from_arrow(_vec_table(base)), idx,
                               num_parts=3, m_degree=12,
                               ef_construction=48)
    tbl_extra = pa.table({
        "vec_id": pa.array(np.arange(150, len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in extra]),
    })
    graph_pl.add_to_graph_index(rd.from_arrow(tbl_extra), idx)
    queries = {f"q{i}": vecs[i * 53].astype(np.float64) for i in range(3)}
    ds_all = rd.from_arrow(_vec_table(vecs))
    exact = knn_pl.brute_force_topk(ds_all, queries, 10, metric="cosine",
                                    round_decimals=6)
    got = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    # repeated add must be a no-op (idempotence)
    graph_pl.add_to_graph_index(rd.from_arrow(tbl_extra), idx)
    got2 = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                               round_decimals=6)
    pd.testing.assert_frame_equal(got2, exact)
    # tombstone some winners: masked in graph_topk AND the serve actors
    victims = exact.vec_id.unique()[:4].tolist()
    graph_pl.delete_from_graph_index(idx, victims)
    keep_tbl = _vec_table(vecs).filter(
        pa.compute.invert(pa.compute.is_in(
            pa.array(np.arange(len(vecs), dtype=np.int64)),
            value_set=pa.array(victims, type=pa.int64()))))
    exact_live = knn_pl.brute_force_topk(rd.from_arrow(keep_tbl), queries,
                                         10, metric="cosine",
                                         round_decimals=6)
    got_live = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                                   round_decimals=6)
    pd.testing.assert_frame_equal(got_live, exact_live)
    svc = graph_pl.GraphSearchService(idx, num_shards=2)
    try:
        got_svc = svc.search(queries, 10, ef_search=len(vecs),
                             round_decimals=6)
        pd.testing.assert_frame_equal(got_svc, exact_live)
    finally:
        svc.shutdown()
    # compacting merge reads the sidecar by default and drops dead rows
    merged = str(tmp_path / "merged")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3,
                               mode="incremental")
    assert not os.path.exists(os.path.join(merged, "_tombstones.parquet"))
    got_m = graph_pl.graph_topk(merged, queries, 10,
                                ef_search=len(vecs), round_decimals=6)
    pd.testing.assert_frame_equal(got_m, exact_live)


def test_cli_knn_add_delete(tmp_path):
    """knn-add routes new vectors into the existing graph index and
    knn-delete tombstones ids — verified through the search CLI."""
    import subprocess, sys
    import pyarrow.parquet as ppq
    vecs = _clustered_vecs(seed=41, n_centers=3, per=30, d=8)
    src = str(tmp_path / "base.parquet")
    ppq.write_table(_vec_table(vecs[:60]), src)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    idx = str(tmp_path / "gidx")
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "opensearch_jvector_ray", *a],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert run("knn-build", "--input", src, "--index", idx,
               "--engine", "graph", "--num-parts", "2").returncode == 0
    extra = pa.table({
        "vec_id": pa.array(np.arange(60, len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs[60:]]),
    })
    add_src = str(tmp_path / "extra.parquet")
    ppq.write_table(extra, add_src)
    assert run("knn-add", "--input", add_src, "--index", idx).returncode == 0
    q = ",".join(str(float(x)) for x in vecs[75])
    found = run("knn-search", "--index", idx, "--engine", "graph",
                f"--query={q}", "--k", "1", "--ef", "200")
    assert found.returncode == 0, found.stderr[-2000:]
    assert int(found.stdout.strip().splitlines()[1].split()[2]) == 75
    assert run("knn-delete", "--index", idx, "--ids", "75").returncode == 0
    gone = run("knn-search", "--index", idx, "--engine", "graph",
               f"--query={q}", "--k", "1", "--ef", "200")
    assert gone.returncode == 0
    assert int(gone.stdout.strip().splitlines()[1].split()[2]) != 75


def test_ivf_search_service_identical_to_batch_path(tmp_path):
    """IvfSearchService (resident decoded cells) must be frame-identical
    to ivf_index_topk across plain / filtered / radial / tombstoned
    searches."""
    from opensearch_jvector_ray.pipelines.knn import IvfSearchService
    vecs = _clustered_vecs(seed=127, n_centers=5, per=40, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivf")
    cent = knn_pl.fixed_centroids(ds, [0, 40, 80, 120, 160])
    knn_pl.build_ivf_index(ds, idx, centroids=cent)
    queries = {f"q{i}": vecs[i * 37].astype(np.float64) for i in range(3)}
    allowed = np.arange(0, len(vecs), 2)
    svc = IvfSearchService(idx, num_shards=2)
    try:
        for kwargs in ({}, {"filter_ids": allowed}, {"min_score": 0.9},
                       {"max_distance": 0.2}):
            want = knn_pl.ivf_index_topk(
                idx, queries, None if "min_score" in kwargs
                or "max_distance" in kwargs else 10,
                n_probe=3, round_decimals=6, **kwargs)
            got = svc.search(
                queries, None if "min_score" in kwargs
                or "max_distance" in kwargs else 10,
                n_probe=3, round_decimals=6, **kwargs)
            pd.testing.assert_frame_equal(want, got)
        knn_pl.delete_from_ivf_index(idx, [int(i) for i in
                                           np.arange(0, 40)])
        want = knn_pl.ivf_index_topk(idx, queries, 10, n_probe=3,
                                     round_decimals=6)
        got = svc.search(queries, 10, n_probe=3, round_decimals=6)
        pd.testing.assert_frame_equal(want, got)
        assert not set(got.vec_id) & set(range(40))
    finally:
        svc.shutdown()


def test_dsl_knn_routes_to_index_engines(tmp_path):
    """A knn DSL clause with vector_index= must produce the same frame
    as the engine's direct API — graph and ivf, including a term filter
    resolved to an id allow-list and radial mode; ivfpq rejects radial."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    from opensearch_jvector_ray.query_dsl import execute_query
    vecs = _clustered_vecs(seed=131, n_centers=4, per=40, d=16)
    labels = np.arange(len(vecs)) % 4
    tbl = _vec_table(vecs).set_column(
        2, "label", pa.array(labels.astype(np.int64)))
    ds = rd.from_arrow(tbl)
    gidx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds.select_columns(["vec_id", "embedding"]),
                               gidx, num_parts=2, m_degree=12,
                               ef_construction=48)
    iidx = str(tmp_path / "ivf")
    cent = knn_pl.fixed_centroids(ds, [0, 40, 80, 120])
    knn_pl.build_ivf_index(ds.select_columns(["vec_id", "embedding"]),
                           iidx, centroids=cent)
    qv = [float(x) for x in vecs[7]]
    resolver = lambda flt: np.flatnonzero(
        labels == list(flt["term"].values())[0]).astype(np.int64)
    body = {"knn": {"vector": qv, "k": 5,
                    "filter": {"term": {"label": 1}}}}
    want = graph_pl.graph_topk(gidx, {"q": np.array(qv)}, 5,
                               round_decimals=6, ef_search=400,
                               filter_ids=resolver(body["knn"]["filter"]))
    got = execute_query(body, vector_index=gidx, vector_engine="graph",
                        filter_id_resolver=resolver,
                        engine_kwargs={"ef_search": 400})
    pd.testing.assert_frame_equal(want, got)
    body_r = {"knn": {"vector": qv, "metric": "cosine", "min_score": 0.9}}
    want_r = knn_pl.ivf_index_topk(iidx, {"q": np.array(qv)}, None,
                                   n_probe=4, round_decimals=6,
                                   min_score=0.9)
    got_r = execute_query(body_r, vector_index=iidx, vector_engine="ivf")
    pd.testing.assert_frame_equal(want_r, got_r)
    with pytest.raises(ValueError):
        execute_query(body_r, vector_index=iidx, vector_engine="ivfpq")
    with pytest.raises(ValueError):
        execute_query(body, vector_index=gidx)   # filter w/o resolver


def test_merge_polish_sweeps_preserve_exactness_and_quality(tmp_path):
    """polish_sweeps re-descends incrementally-merged groups: full-beam
    exactness must hold (cycle edge re-ensured at write) and recall on
    uniform data must not regress vs the unpolished merge."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((1200, 32))
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=4, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 61].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)

    def rec(out):
        hits = 0
        for qid, g in out.groupby("query_id"):
            want = set(exact[exact.query_id == qid].vec_id)
            hits += len(set(g.vec_id) & want)
        return hits / len(exact)

    plain = str(tmp_path / "plain")
    graph_pl.merge_graph_index(idx, plain, merge_factor=4)
    pol = str(tmp_path / "polished")
    graph_pl.merge_graph_index(idx, pol, merge_factor=4,
                               polish_sweeps=2)
    # full beam: both must be EXACT (connectivity is re-ensured)
    for d in (plain, pol):
        got = graph_pl.graph_topk(d, queries, 10, ef_search=len(vecs),
                                  round_decimals=6)
        pd.testing.assert_frame_equal(got, exact)
    # approximate beam: polish must not regress recall
    r_plain = rec(graph_pl.graph_topk(plain, queries, 10, ef_search=48,
                                      round_decimals=6))
    r_pol = rec(graph_pl.graph_topk(pol, queries, 10, ef_search=48,
                                    round_decimals=6))
    assert r_pol + 0.05 >= r_plain, (r_plain, r_pol)


def test_graph_bq_traversal_exact_and_recall(tmp_path):
    """BQ mode (Lucene binary quantization, the reference's 'PQ and BQ
    support'): the beam walks on XOR-popcount lookup sums, hits are
    exact-rescored — full beam must equal brute force; approximate beam
    must clear the recall gate; merge repacks bits (training-free) and
    stays full-beam exact; bq + pq together is an error."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=137, n_centers=5, per=50, d=32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48, bq=True)
    assert os.path.exists(os.path.join(idx, "part=0", graph_pl.BQ_NAME))
    queries = {f"q{i}": vecs[i * 43].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    got = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    approx = graph_pl.graph_topk(idx, queries, 10, ef_search=48,
                                 round_decimals=6)
    hits = sum(len(set(approx[approx.query_id == q].vec_id)
                   & set(exact[exact.query_id == q].vec_id))
               for q in queries)
    assert hits / len(exact) >= 0.75
    # use_pq=False must bypass the BQ codes entirely and stay exact
    full_f = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                                 round_decimals=6, use_pq=False)
    pd.testing.assert_frame_equal(full_f, exact)
    merged = str(tmp_path / "merged")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3)
    assert os.path.exists(os.path.join(merged, "part=0",
                                       graph_pl.BQ_NAME))
    got_m = graph_pl.graph_topk(merged, queries, 10,
                                ef_search=len(vecs), round_decimals=6)
    pd.testing.assert_frame_equal(got_m, exact)
    with pytest.raises(ValueError):
        graph_pl.build_graph_index(ds, str(tmp_path / "bad"), bq=True,
                                   pq_m_subspaces=8)


def test_refine_codebook_on_merge_improves_quantization():
    """refine_codebook runs Lloyd iterations seeded from the EXISTING
    centroids: iters=0 is identity, refinement strictly reduces
    quantization error on distribution-shifted data, and empty cells
    keep their old centroid."""
    from opensearch_jvector_ray.pipelines import pq as pq_pl
    rng = np.random.default_rng(7)
    old = rng.standard_normal((2000, 16))
    book = pq_pl.train_pq_codebook(
        rd.from_arrow(pa.table({
            "embedding": pa.array([v.tolist() for v in old],
                                  type=pa.list_(pa.float32()))})),
        m_subspaces=4, n_codes=16, vec_col="embedding")
    shifted = rng.standard_normal((2000, 16)) + 2.0   # moved distribution

    def qerr(b, X):
        codes = pq_pl.pq_encode(X, b)
        m, k, dsub = b.shape
        rec = np.concatenate([b[mi][codes[:, mi]] for mi in range(m)],
                             axis=1)
        return float(((X - rec) ** 2).sum(axis=1).mean())

    same = pq_pl.refine_codebook(book, shifted, iters=0)
    np.testing.assert_array_equal(same, book)
    ref = pq_pl.refine_codebook(book, shifted, iters=3)
    assert qerr(ref, shifted) < qerr(book, shifted) * 0.9
    assert ref.shape == book.shape


def test_graph_merge_with_refined_codebook_stays_exact(tmp_path):
    """A PQ-quantized incremental merge with refine_quant_iters keeps
    full-beam exactness (refined books only reorder the walk; scores are
    always exact-rescored)."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=139, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48, pq_m_subspaces=8,
                               pq_n_codes=16, pq_min_rows=2)
    merged = str(tmp_path / "merged")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3,
                               refine_quant_iters=2)
    queries = {f"q{i}": vecs[i * 59].astype(np.float64) for i in range(3)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    got = graph_pl.graph_topk(merged, queries, 10, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    # the refined book must differ from EVERY source book — it would
    # equal the leading one verbatim had refinement not run
    mrg = graph_pl._load_part_quant(os.path.join(merged, "part=0"))
    assert mrg is not None and mrg[0] == "pq"
    for p in range(3):
        src = graph_pl._load_part_quant(os.path.join(idx, f"part={p}"))
        assert not np.array_equal(src[1], mrg[1])


def test_quantized_insert_merge_exact_and_recall(tmp_path):
    """quantized_insert runs the merge's insert waves on ADC lookup sums
    (the reference's quantized index construction): full-beam search
    stays exact, approximate recall clears the gate, and it works for
    both PQ and BQ leading segments."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=149, n_centers=4, per=60, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    queries = {f"q{i}": vecs[i * 67].astype(np.float64) for i in range(3)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    for kind, kwargs in (("pq", {"pq_m_subspaces": 8, "pq_n_codes": 16,
                                 "pq_min_rows": 2}),
                         ("bq", {"bq": True})):
        idx = str(tmp_path / f"g_{kind}")
        graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                                   ef_construction=48, **kwargs)
        merged = str(tmp_path / f"m_{kind}")
        graph_pl.merge_graph_index(idx, merged, merge_factor=3,
                                   quantized_insert=True,
                                   refine_quant_iters=1)
        got = graph_pl.graph_topk(merged, queries, 10,
                                  ef_search=len(vecs), round_decimals=6)
        pd.testing.assert_frame_equal(got, exact)
        approx = graph_pl.graph_topk(merged, queries, 10, ef_search=64,
                                     round_decimals=6)
        hits = sum(len(set(approx[approx.query_id == q].vec_id)
                       & set(exact[exact.query_id == q].vec_id))
                   for q in queries)
        assert hits / len(exact) >= 0.75


def test_bq_lut_gather_sum_equals_direct_hamming():
    """The BQ lookup-table gather-sum must equal the directly-computed
    hamming distance between sign bits for every (query, node) pair —
    the LUT math validated independently of any search."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(11)
    X = rng.standard_normal((64, 20)).astype(np.float32)   # d=20: pad path
    Q = rng.standard_normal((5, 20)).astype(np.float32)
    codes = np.packbits(X > 0, axis=1)
    lut = graph_pl._bq_lut(Q, codes.shape[1])
    M = codes.shape[1]
    off = np.arange(M, dtype=np.int64) * (lut.shape[1] // M)
    got = lut[:, codes.astype(np.int64) + off[None, :]].sum(axis=2)
    xbits = np.unpackbits(codes, axis=1)[:, :20]
    qbits = np.unpackbits(np.packbits(Q > 0, axis=1), axis=1)[:, :20]
    want = (xbits[None, :, :] != qbits[:, None, :]).sum(axis=2)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_repetition_stage_matches_duckdb_edge_cases():
    """Gopher-style repetition signals: engine batch fn == DuckDB oracle
    on empty docs, single tokens, and pure-repetition docs."""
    import duckdb
    import pyarrow as pa
    import pandas as pd
    from opensearch_jvector_ray.config import EngineConfig
    from opensearch_jvector_ray.pipelines.textstats import repetition_stage
    from opensearch_jvector_ray.oracles import repetition_sql
    cfg = EngineConfig()
    texts = ["spam spam spam spam ham", "the quick brown fox", "",
             "a a b b a b", "one", "x y x y x y x y",
             "hello world hello world hello"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    eng = (repetition_stage(cfg, "doc_id", "text")(tbl).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = (con.execute(repetition_sql(cfg)).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.loc[0, "dup_token_ratio"] == 0.6       # spam x4 + ham
    assert eng.loc[2, "dup_bigram_ratio"] == 0.0      # empty doc


def test_bulk_insert_distributed_waves_bit_identical():
    """A wave sliced over Ray tasks (beam+forward-select by rows,
    overflow re-selection by target chunks) must produce the SAME graph
    as the serial path — both are the same row-independent computation.
    wave_cap pins identical wave schedules across the two runs."""
    from opensearch_jvector_ray.pipelines import graph as g

    rng = np.random.default_rng(11)
    n, d, lead = 3000, 32, 400
    unit = g._unitize(rng.standard_normal((n, d)).astype(np.float32))
    nbrs_lead = g.build_graph(unit[:lead], m_degree=8, ef_construction=32)
    m = nbrs_lead.shape[1]

    def run(n_tasks, wave_cap):
        nbrs = np.full((n, m), -1, dtype=np.int32)
        nbrs[:lead] = nbrs_lead
        n_nbrs = np.concatenate(
            [(nbrs_lead >= 0).sum(1).astype(np.int32),
             np.zeros(n - lead, dtype=np.int32)])
        g.bulk_insert(unit, nbrs, n_nbrs, lead, m_degree=8,
                      ef_construction=32, n_tasks=n_tasks,
                      wave_cap=wave_cap)
        return nbrs, n_nbrs

    nb_s, nn_s = run(None, 100)    # serial: wave = min(built, 100, rest)
    # distributed: same schedule (per-task cap 25 x 4 tasks = 100 rows
    # per wave), beams sliced 4 ways, overflow chunks fanned out
    nb_d, nn_d = run(4, 25)
    assert np.array_equal(nn_s, nn_d)
    assert np.array_equal(nb_s, nb_d)


def test_descent_sweep_distributed_bit_identical():
    """Jacobi descent rows update from the frozen previous graph, so
    fanning row ranges out as Ray tasks must equal the serial sweep."""
    from opensearch_jvector_ray.pipelines import graph as g

    rng = np.random.default_rng(13)
    n, d, m = 4000, 24, 8
    unit = g._unitize(rng.standard_normal((n, d)).astype(np.float32))
    rand = rng.integers(0, n - 1, size=(n, m))
    rand += rand >= np.arange(n)[:, None]
    a = rand.astype(np.int32).copy()
    b = a.copy()
    ch_s = g._descent_sweep(unit, a)
    ch_d = g._descent_sweep(unit, b, n_tasks=4)
    assert ch_s == ch_d
    assert np.array_equal(a, b)


def test_merge_polish_auto_exact_and_recovers_quality(tmp_path):
    """polish_sweeps="auto" (sweep to the build's convergence rule at the
    working degree) must keep full-beam exactness and lift an insert-
    majority merge's recall toward the pre-merge level — the 100k sweep
    regime (small lead, big insert side) in miniature."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((2400, 32))
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    # 8 equal parts -> lead is only ~12.5% of the merged group
    graph_pl.build_graph_index(ds, idx, num_parts=8, m_degree=12,
                               ef_construction=48)
    queries = {f"q{i}": vecs[i * 37].astype(np.float64) for i in range(6)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)

    def rec(out):
        hits = 0
        for qid, g in out.groupby("query_id"):
            want = set(exact[exact.query_id == qid].vec_id)
            hits += len(set(g.vec_id) & want)
        return hits / len(exact)

    plain = str(tmp_path / "plain")
    graph_pl.merge_graph_index(idx, plain, merge_factor=8)
    auto = str(tmp_path / "auto")
    graph_pl.merge_graph_index(idx, auto, merge_factor=8,
                               polish_sweeps="auto")
    got = graph_pl.graph_topk(auto, queries, 10, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)      # full beam == exact
    r_plain = rec(graph_pl.graph_topk(plain, queries, 10, ef_search=48,
                                      round_decimals=6))
    r_auto = rec(graph_pl.graph_topk(auto, queries, 10, ef_search=48,
                                     round_decimals=6))
    assert r_auto + 0.05 >= r_plain, (r_plain, r_auto)


def test_finalize_graph_distributed_bit_identical():
    """Finalize rows read the frozen converged graph, so fanning row
    ranges out as Ray tasks must equal the serial pass."""
    from opensearch_jvector_ray.pipelines import graph as g

    rng = np.random.default_rng(19)
    n, d, m = 3000, 24, 10
    unit = g._unitize(rng.standard_normal((n, d)).astype(np.float32))
    rand = rng.integers(0, n - 1, size=(n, 2 * m))
    rand += rand >= np.arange(n)[:, None]
    work = rand.astype(np.int32)
    a = g._finalize_graph(unit, work, m, 1.0)
    b = g._finalize_graph(unit, work, m, 1.0, n_tasks=4)
    assert np.array_equal(a, b)


def test_build_graph_index_adaptive_num_parts(tmp_path):
    """num_parts=None sizes partitions to the matmul fast-path bound."""
    from opensearch_jvector_ray.pipelines import graph as g
    rng = np.random.default_rng(29)
    vecs = rng.standard_normal((2000, 8))
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    with_target = __import__("pytest").MonkeyPatch()
    with_target.setattr(g, "_PART_TARGET_ROWS", 600)
    try:
        g.build_graph_index(ds, idx, num_parts=None, m_degree=8,
                            ef_construction=32)
    finally:
        with_target.undo()
    parts = [d for d in os.listdir(idx) if d.startswith("part=")]
    assert len(parts) == 4        # ceil(2000 / 600)
    out = g.graph_topk(idx, {"q": vecs[5].astype(np.float64)}, 5,
                       ef_search=2000, round_decimals=6)
    exact = knn_pl.brute_force_topk(ds, {"q": vecs[5].astype(np.float64)},
                                    5, metric="cosine", round_decimals=6)
    pd.testing.assert_frame_equal(out, exact)


def test_pii_scrub_stage_edge_cases():
    """RE2 boundary cases verified against DuckDB's RE2 side by side —
    the pair of engines must agree on match extents and counts."""
    import duckdb
    from opensearch_jvector_ray.pipelines.textstats import (
        PII_PATTERNS, pii_scrub_stage)
    texts = [
        "mail me at bob.smith+x@ex-ample.co.uk or sue@a.io thanks",
        "server 10.20.30.40 and 192.168.0.1, call +1 415 555 1039",
        "no pii here, just text 1.2 v3",
        "edge a@b.cc. trailing +44 207 946 0958!",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    got = pii_scrub_stage("doc_id", "text")(t)
    con = duckdb.connect()
    for i, txt in enumerate(texts):
        cur, counts = txt, {}
        for name, pat, repl in PII_PATTERNS:
            n, cur = con.sql(
                "SELECT len(regexp_extract_all(?, ?)), "
                "regexp_replace(?, ?, ?, 'g')",
                params=[cur, pat, cur, pat, repl]).fetchone()
            counts[name] = n
        assert got["clean_text"][i].as_py() == cur
        for name, n in counts.items():
            assert got[f"n_{name}"][i].as_py() == n


def test_decontaminate_flags_planted_overlap(ray_session):
    """A doc sharing a 3-gram with a benchmark doc is contaminated; a
    disjoint doc is not; benchmark docs are never flagged."""
    from opensearch_jvector_ray.pipelines.dedup import decontaminate
    cfg = EngineConfig()
    rows = {
        0: "alpha beta gamma delta epsilon",          # benchmark (0 % 5)
        1: "prefix words then alpha beta gamma end",  # contaminated
        2: "completely different tokens here now",    # clean
        5: "another benchmark text entirely",         # benchmark
        7: "short one",                               # < k tokens, clean
        11: "text entirely unrelated to benchmarks",  # clean
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(rows), type=pa.int64()),
        "text": pa.array(list(rows.values()))}))
    out = (decontaminate(ds, cfg, "doc_id", "text", modulus=5, residue=0)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hits"] == 1
    assert out.loc[2, "contaminated"] == 0 and out.loc[2, "n_hits"] == 0
    assert (out.loc[[0, 5], "is_benchmark"] == 1).all()
    assert (out.loc[[0, 5], "contaminated"] == 0).all()
    assert out.loc[7, "n_shingles"] == 1     # one short-doc window
    assert out.loc[0, "n_shingles"] == 3     # 5 tokens -> 3 windows


def test_graph_nvq_traversal_exact_recall_and_lifecycle(tmp_path):
    """NVQ mode (the reference's nonuniform vector quantization): the
    beam walks on companded dequant-level lookup sums with a per-row
    affine correction, hits are exact-rescored — full beam must equal
    brute force; approximate beam must clear the recall gate; merge and
    add keep the leading gamma (refine-never-retrain) and stay full-beam
    exact; combining quant modes is an error."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=31, n_centers=5, per=50, d=32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48, nvq=True)
    assert os.path.exists(os.path.join(idx, "part=0", graph_pl.NVQ_NAME))
    queries = {f"q{i}": vecs[i * 43].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    got = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    approx = graph_pl.graph_topk(idx, queries, 10, ef_search=48,
                                 round_decimals=6)
    hits = sum(len(set(approx[approx.query_id == q].vec_id)
                   & set(exact[exact.query_id == q].vec_id))
               for q in queries)
    assert hits / len(exact) >= 0.75
    g0 = graph_pl._load_part_quant(os.path.join(idx, "part=0"))[1]
    merged = str(tmp_path / "merged")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3,
                               quantized_insert=True)
    mq = graph_pl._load_part_quant(os.path.join(merged, "part=0"))
    assert mq[0] == "nvq"
    got_m = graph_pl.graph_topk(merged, queries, 10,
                                ef_search=len(vecs), round_decimals=6)
    pd.testing.assert_frame_equal(got_m, exact)
    # add lifecycle: codes re-derived over the grown rows, gamma kept
    extra = _clustered_vecs(seed=77, n_centers=2, per=30, d=32)
    t2 = _vec_table(extra)
    t2 = t2.set_column(0, "vec_id", pa.array(
        np.arange(len(vecs), len(vecs) + len(extra)), type=pa.int64()))
    graph_pl.add_to_graph_index(rd.from_arrow(t2), merged)
    aq = graph_pl._load_part_quant(os.path.join(merged, "part=0"))
    assert aq[1] == mq[1] == g0          # gamma survives merge + add
    all_tbl = pa.concat_tables([_vec_table(vecs), t2])
    exact_all = knn_pl.brute_force_topk(rd.from_arrow(all_tbl), queries,
                                        10, metric="cosine",
                                        round_decimals=6)
    got_a = graph_pl.graph_topk(merged, queries, 10,
                                ef_search=len(all_tbl), round_decimals=6)
    pd.testing.assert_frame_equal(got_a, exact_all)
    with pytest.raises(ValueError):
        graph_pl.build_graph_index(ds, str(tmp_path / "bad"), nvq=True,
                                   bq=True)


@pytest.mark.parametrize("bits", [2, 4])
def test_graph_mbq_traversal_exact_recall_and_lifecycle(tmp_path, bits):
    """MBQ mode (the reference's 2/4-bit MultiBitScalarQuantizer +
    BitPacker plane-major layout): per-dimension thresholds at
    mean + iCoef*std, the beam walks XOR-popcount hamming sums over the
    concatenated bit planes, hits are exact-rescored — full beam must
    equal brute force; approximate beam must clear the recall gate;
    merge and add keep the leading thresholds (refine-never-retrain)
    and stay full-beam exact; combining quant modes is an error."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=53, n_centers=5, per=50, d=32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=12,
                               ef_construction=48, mbq_bits=bits)
    assert os.path.exists(os.path.join(idx, "part=0", graph_pl.MBQ_NAME))
    q0 = graph_pl._load_part_quant(os.path.join(idx, "part=0"))
    assert q0[0] == "mbq" and q0[1].shape[0] == bits
    # plane-major packed width: bits * ceil(d/8) bytes per row
    assert q0[2].shape[1] == bits * ((32 + 7) // 8)
    queries = {f"q{i}": vecs[i * 43].astype(np.float64) for i in range(4)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine",
                                    round_decimals=6)
    got = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    approx = graph_pl.graph_topk(idx, queries, 10, ef_search=48,
                                 round_decimals=6)
    hits = sum(len(set(approx[approx.query_id == q].vec_id)
                   & set(exact[exact.query_id == q].vec_id))
               for q in queries)
    assert hits / len(exact) >= 0.75
    merged = str(tmp_path / "merged")
    graph_pl.merge_graph_index(idx, merged, merge_factor=3)
    mq = graph_pl._load_part_quant(os.path.join(merged, "part=0"))
    assert mq[0] == "mbq"
    got_m = graph_pl.graph_topk(merged, queries, 10,
                                ef_search=len(vecs), round_decimals=6)
    pd.testing.assert_frame_equal(got_m, exact)
    # add lifecycle: codes re-derived over the grown rows, thresholds
    # kept (refine-never-retrain)
    extra = _clustered_vecs(seed=78, n_centers=2, per=30, d=32)
    t2 = _vec_table(extra)
    t2 = t2.set_column(0, "vec_id", pa.array(
        np.arange(len(vecs), len(vecs) + len(extra)), type=pa.int64()))
    graph_pl.add_to_graph_index(rd.from_arrow(t2), merged)
    aq = graph_pl._load_part_quant(os.path.join(merged, "part=0"))
    assert np.array_equal(aq[1], mq[1])   # thresholds survive add
    all_tbl = pa.concat_tables([_vec_table(vecs), t2])
    exact_all = knn_pl.brute_force_topk(rd.from_arrow(all_tbl), queries,
                                        10, metric="cosine",
                                        round_decimals=6)
    got_a = graph_pl.graph_topk(merged, queries, 10,
                                ef_search=len(all_tbl),
                                round_decimals=6)
    pd.testing.assert_frame_equal(got_a, exact_all)
    with pytest.raises(ValueError, match="at most ONE"):
        graph_pl.build_graph_index(ds, str(tmp_path / "bad"),
                                   mbq_bits=bits, bq=True)
    with pytest.raises(ValueError, match="2 or 4"):
        graph_pl.build_graph_index(ds, str(tmp_path / "bad2"),
                                   mbq_bits=3)


def test_mbq_encode_matches_reference_rule():
    """Threshold + packing identity: t_i = mean + (-1 + 2(i+1)/(b+1))std
    (MultiBitScalarQuantizer.calculateThresholds) and plane-major
    packbits (BitPacker layout), checked against a per-element
    reimplementation."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 11)).astype(np.float32)
    for bits in (2, 4):
        th = graph_pl._mbq_thresholds(X.mean(axis=0), X.std(axis=0),
                                      bits)
        for i in range(bits):
            coef = -1.0 + 2.0 * (i + 1) / (bits + 1)
            np.testing.assert_allclose(
                th[i], (X.mean(axis=0)
                        + np.float32(coef) * X.std(axis=0)),
                rtol=1e-5, atol=1e-7)     # float32 op-order slack
        codes = graph_pl._mbq_encode(X, th)
        assert codes.shape == (40, bits * 2)   # ceil(11/8) = 2 bytes
        for r in (0, 17):
            want = []
            for i in range(bits):
                bits_row = (X[r] > th[i]).astype(np.uint8)
                want.append(np.packbits(bits_row))
            np.testing.assert_array_equal(codes[r],
                                          np.concatenate(want))


def test_nvq_gamma_fit_prefers_companding_on_skewed_data():
    """The per-partition gamma grid search must pick a companding
    exponent (gamma != 1) when component mass is skewed toward the
    per-vector minimum, and the fitted quantizer must beat the uniform
    gamma=1 baseline in reconstruction MSE."""
    from opensearch_jvector_ray.pipelines.graph import (
        _nvq_encode, _nvq_levels, _train_part_nvq, _unitize)
    rng = np.random.default_rng(0)
    X = _unitize(rng.exponential(1.0, size=(2000, 32)))
    g, a, b, c = _train_part_nvq(X)
    assert g > 1.0
    recon = a[:, None] * _nvq_levels(g)[c] + b[:, None]
    a1, b1, c1 = _nvq_encode(X, 1.0)
    r1 = a1[:, None] * _nvq_levels(1.0)[c1] + b1[:, None]
    assert ((recon - X) ** 2).mean() < ((r1 - X) ** 2).mean()
    # constant rows are representable exactly (a floor, u = 0)
    C = np.full((3, 8), 0.25, dtype=np.float32)
    ac, bc, cc = _nvq_encode(C, g)
    rc = ac[:, None] * _nvq_levels(g)[cc] + bc[:, None]
    assert np.allclose(rc, C)


def test_decontaminate_separate_benchmark_dataset(ray_session):
    """bench_ds= is the production shape: the eval suite is its own
    table, stage 1 scans ONLY it, and no corpus doc is is_benchmark."""
    from opensearch_jvector_ray.pipelines.dedup import decontaminate
    cfg = EngineConfig()
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta",
                          "totally unrelated words here",
                          "ends with alpha beta gamma"])}))
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([900], type=pa.int64()),
        "text": pa.array(["the eval set says alpha beta gamma"])}))
    out = (decontaminate(corpus, cfg, "doc_id", "text", bench_ds=bench)
           .to_pandas().set_index("doc_id").sort_index())
    assert out["is_benchmark"].sum() == 0
    assert list(out["contaminated"]) == [1, 0, 1]
    with pytest.raises(ValueError):
        decontaminate(corpus, cfg, "doc_id", "text")
    with pytest.raises(ValueError):
        decontaminate(corpus, cfg, "doc_id", "text", modulus=5,
                      bench_ds=bench)


from hypothesis import given as _h_given, settings as _h_settings
from hypothesis import strategies as _h_st

_PII_ALPHABET = "ab.@+-01 9%_ABZ:/,()!\t\n'\"\\"


@_h_given(_h_st.lists(_h_st.text(alphabet=_PII_ALPHABET, max_size=60),
                      max_size=8))
@_h_settings(max_examples=60, deadline=None)
def test_pii_scrub_matches_duckdb_on_random_strings(texts):
    """Property: the engine's pyarrow-RE2 pass and DuckDB's RE2 chain
    agree on COUNTS and REPLACED TEXT for arbitrary strings over an
    alphabet dense in the patterns' trigger characters — the no-drift
    guarantee the pii_scrub oracle depends on."""
    import duckdb
    from opensearch_jvector_ray.pipelines.textstats import (
        PII_PATTERNS, pii_scrub_stage)
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    got = pii_scrub_stage("doc_id", "text")(t)
    con = duckdb.connect()
    for i, txt in enumerate(texts):
        cur = txt
        for name, pat, repl in PII_PATTERNS:
            n, cur = con.sql(
                "SELECT len(regexp_extract_all(?, ?)), "
                "regexp_replace(?, ?, ?, 'g')",
                params=[cur, pat, cur, pat, repl]).fetchone()
            assert got[f"n_{name}"][i].as_py() == n, (txt, name)
        assert got["clean_text"][i].as_py() == cur, txt


# ---------------------------------------------------------------------------
# graph build method: exact chunked-BLAS candidate generation (round 4)
# ---------------------------------------------------------------------------

def test_graph_exact_knn_edges_match_brute_force():
    """_exact_knn_edges returns the TRUE top-mw neighbor matrix (nearest
    first, self excluded) — the candidate-perfect input to finalize."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((257, 24))
    unit = graph_pl._unitize(vecs)
    mw = 12
    got = graph_pl._exact_knn_edges(unit, mw)
    d = -(unit @ unit.T)
    np.fill_diagonal(d, np.inf)
    for i in range(len(unit)):
        want = set(np.argpartition(d[i], mw - 1)[:mw].tolist())
        assert set(got[i].tolist()) == want, i
        # nearest-first ordering within the row
        dv = d[i][got[i]]
        assert (np.diff(dv) >= -1e-12).all(), i


def test_graph_exact_fanout_bit_identical_to_serial():
    """Row-range fan-out of the exact pass is bit-identical to serial
    (rows are independent and pure) — same contract as descent/finalize."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(23)
    unit = graph_pl._unitize(rng.standard_normal((1500, 16)))
    a = graph_pl._exact_rows(unit, 10, 0, len(unit))
    b = graph_pl._exact_knn_edges(unit, 10, n_tasks=4)
    np.testing.assert_array_equal(a, b)


def test_graph_method_auto_routes_and_stays_full_beam_exact(tmp_path):
    """method="auto" (the default) uses exact construction at partition
    sizes, records itself in meta, and the index stays full-beam exact;
    method="descent" remains available and pinned via meta for
    add/merge."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    vecs = _clustered_vecs(seed=41, n_centers=4, per=50, d=16)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "g_auto")
    graph_pl.build_graph_index(ds, idx, num_parts=3, m_degree=8,
                               ef_construction=24)
    with open(os.path.join(idx, graph_pl.META_NAME)) as f:
        assert json.load(f)["method"] == "auto"
    queries = {"qa": vecs[7].astype(np.float64),
               "qb": vecs[101].astype(np.float64)}
    exact = knn_pl.brute_force_topk(ds, queries, 9, metric="cosine",
                                    round_decimals=6)
    got = graph_pl.graph_topk(idx, queries, 9, ef_search=len(vecs),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    # invalid method errors clearly
    with pytest.raises(ValueError, match="method"):
        graph_pl.build_graph(vecs, m_degree=8, method="bogus")


def test_graph_method_exact_beats_descent_candidates():
    """On uniform data (the descent plateau), exact construction's kept
    near-edges strictly dominate descent mult=1's at the same degree —
    the round-4 auto rule's quality premise."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(3)
    n, d, m = 3000, 48, 8
    X = rng.standard_normal((n, d))
    unit = graph_pl._unitize(X)
    dist = -(unit @ unit.T)
    np.fill_diagonal(dist, np.inf)
    truth = np.argpartition(dist, m - 1, axis=1)[:, :m]

    def quality(nbrs):
        hit = sum(len(set(nbrs[i][nbrs[i] >= 0].tolist())
                      & set(truth[i].tolist())) for i in range(n))
        return hit / (n * m)

    qe = quality(graph_pl.build_graph(X, m_degree=m, method="exact"))
    qd = quality(graph_pl.build_graph(X, m_degree=m, method="descent"))
    assert qe > qd + 0.1, (qe, qd)
    assert qe > 0.6, qe          # diversity prune keeps most near edges
