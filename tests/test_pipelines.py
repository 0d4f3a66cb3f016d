"""Oracles for the approximate / non-SQL pipelines: MinHash-LSH, SimHash,
embedding near-dups (vs brute force), IVF recall (vs exact — the analog
of the reference's recall gate, `RecallTestsIT.java:101-180`), and the
multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines import dedup as dd
from opensearch_jvector_ray.pipelines import knn as knn_pl
from opensearch_jvector_ray.pipelines import multimodal as mm

CFG = EngineConfig()


def _doc_table(texts: list[str]) -> pa.Table:
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill every single morning")


def test_minhash_finds_planted_near_dups():
    texts = [BASE,
             BASE.replace("warm", "cold"),               # near-dup of 0
             BASE + " and then some extra words appear", # near-dup of 0
             "completely different content about database engines and queries",
             "another unrelated sentence mentioning vectors and indexes only"]
    out = dd.minhash_lsh_dedup(rd.from_arrow(_doc_table(texts)), CFG,
                               "doc_id", "text", threshold=0.4)
    clusters = dict(zip(out.doc_id, out.cluster_id))
    assert clusters.get(1) == 0 and clusters.get(2) == 0
    assert 3 not in clusters and 4 not in clusters


def test_minhash_exact_duplicates_always_cluster():
    texts = ["alpha beta gamma delta epsilon zeta eta theta"] * 3 + ["iota kappa"]
    out = dd.minhash_lsh_dedup(rd.from_arrow(_doc_table(texts)), CFG,
                               "doc_id", "text", threshold=0.9)
    clusters = dict(zip(out.doc_id, out.cluster_id))
    assert clusters == {0: 0, 1: 0, 2: 0}


def test_simhash_identical_docs_zero_hamming():
    texts = ["one two three four five six", "one two three four five six",
             "seven eight nine ten eleven twelve"]
    out = dd.simhash_near_dups(rd.from_arrow(_doc_table(texts)), CFG,
                               "doc_id", "text", max_hamming=0)
    assert [(r.id_a, r.id_b) for r in out.itertuples()] == [(0, 1)]


def _vec_table(vecs: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })


def test_embedding_near_dups_vs_bruteforce():
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[10] = vecs[3] + 1e-4          # planted near-dup
    vecs[41] = vecs[20] * 1.5          # same direction = cosine 1
    out = knn_pl.embedding_near_dups(rd.from_arrow(_vec_table(vecs)),
                                     threshold=0.999)
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    # brute-force oracle
    unit = vecs.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    sim = unit @ unit.T
    iu = np.triu_indices(len(vecs), k=1)
    exp = {(int(a), int(b)) for a, b in zip(*[x[sim[iu] >= 0.999] for x in iu])}
    # LSH may miss pairs split across all buckets, but planted pairs with
    # cosine ~1 share every bucket: they MUST be found
    assert (3, 10) in got and (20, 41) in got
    assert got <= exp                    # no false positives (exact verify)


def test_ivf_recall_vs_bruteforce():
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 32)) * 4
    vecs = np.concatenate([
        c + rng.standard_normal((50, 32)) for c in centers]).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    queries = {f"q{i}": vecs[i * 37].astype(np.float64) for i in range(5)}
    exact = knn_pl.brute_force_topk(ds, queries, 10, metric="cosine")
    approx = knn_pl.ivf_topk(ds, queries, 10, n_centroids=8, n_probe=3,
                             metric="cosine")
    recalls = []
    for q in queries:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    # recall gate: within 0.25 of perfect (reference RecallTestsIT floor)
    assert np.mean(recalls) >= 0.75, recalls


def test_multimodal_decode_stub():
    tbl = mm.synth_media_table(50)
    out = mm.decode_features(rd.from_arrow(tbl), fake=True,
                             feature_dim=8).to_pandas()
    assert len(out) == 50
    assert all(len(f) == 8 for f in out.feature)
    # deterministic across runs
    out2 = mm.decode_features(rd.from_arrow(tbl), fake=True,
                              feature_dim=8).to_pandas()
    f1 = np.stack(out.sort_values("media_id").feature.to_numpy())
    f2 = np.stack(out2.sort_values("media_id").feature.to_numpy())
    np.testing.assert_array_equal(f1, f2)


def test_multimodal_real_decode_rejects_junk():
    # image decode is REAL now (stdlib PNG): junk bytes are a malformed
    # payload (ValueError), and only unknown kinds raise NotImplemented
    stub = mm.DecodeStub(fake=False)
    with pytest.raises(ValueError, match="not a PNG"):
        stub._decode_one(b"payload", "image")
    with pytest.raises(NotImplementedError):
        stub._decode_one(b"payload", "3dmesh")


def test_hamming_topk_vs_numpy_oracle():
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((120, 32)).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    queries = {"h0": vecs[0].astype(np.float64), "h1": vecs[50].astype(np.float64)}
    out = knn_pl.hamming_topk(ds, queries, 8)
    bits = np.packbits((vecs > 0).astype(np.uint8), axis=1)
    for qid, q in queries.items():
        qb = np.packbits((q > 0).astype(np.uint8))
        d = np.unpackbits(np.bitwise_xor(bits, qb[None, :]), axis=1).sum(axis=1)
        score = 1.0 / (1.0 + d.astype(np.float64))
        order = np.lexsort((np.arange(len(vecs)), -score))[:8]
        got = out[out.query_id == qid]
        assert got.vec_id.tolist() == order.tolist()
        np.testing.assert_allclose(got.score.to_numpy(), score[order], atol=1e-12)
    # the query vector itself is its own nearest neighbor (distance 0)
    assert out[out.query_id == "h0"].iloc[0].vec_id == 0


def test_binary_quantize_batch():
    vecs = np.array([[1.0, -1.0, 0.5, -0.5] * 4], dtype=np.float32)
    tbl = _vec_table(vecs)
    out = knn_pl.binary_quantize_batch(tbl)
    bits = np.frombuffer(out["bits"][0].as_py(), dtype=np.uint8)
    assert np.unpackbits(bits).tolist() == [1, 0, 1, 0] * 4


def test_ivf_partitioned_index(tmp_path):
    """Build-time cell partitioning: query reads ONLY probed cell dirs and
    meets the recall floor on clustered data."""
    import os
    rng = np.random.default_rng(21)
    centers = rng.standard_normal((6, 24)) * 5
    vecs = np.concatenate([c + rng.standard_normal((60, 24))
                           for c in centers]).astype(np.float32)
    ds = rd.from_arrow(_vec_table(vecs))
    idx = str(tmp_path / "ivf")
    knn_pl.build_ivf_index(ds, idx, n_centroids=6)
    assert sorted(d for d in os.listdir(idx) if d.startswith("cell="))
    queries = {f"q{i}": vecs[i * 47].astype(np.float64) for i in range(4)}
    out = knn_pl.ivf_index_topk(idx, queries, 10, n_probe=2)
    exact = knn_pl.brute_force_topk(ds, queries, 10)
    recalls = [len(set(exact[exact.query_id == q].vec_id)
                   & set(out[out.query_id == q].vec_id)) / 10 for q in queries]
    assert np.mean(recalls) >= 0.75, recalls


def test_ngram_jaccard_pairs_planted():
    texts = [BASE,
             BASE.replace("warm", "cold"),   # high char-ngram overlap with 0
             "entirely different words about engines and distributed query planning",
             "more unrelated content mentioning vectors tokens and languages"]
    out = dd.ngram_jaccard_pairs(rd.from_arrow(_doc_table(texts)), CFG,
                                 "doc_id", "text", threshold=0.5,
                                 lsh_threshold=0.2)
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert (0, 1) in got
    # exact jaccard check against the kernel directly
    from opensearch_jvector_ray.pipelines.dedup import char_ngrams, jaccard
    row = out[(out.id_a == 0) & (out.id_b == 1)].iloc[0]
    exp = jaccard(char_ngrams(texts[0], 5), char_ngrams(texts[1], 5))
    assert abs(row.jaccard - round(exp, 6)) < 1e-9
    assert not any(2 in p or 3 in p for p in got)


def test_vectorized_pair_jaccard_matches_set_kernels():
    # the batched hash-intersection verify must reproduce the reference
    # set kernels exactly (absent 64-bit collisions) — including the
    # both-empty -> 1.0 and short-text single-window rules
    texts_a = [BASE, "", "ab", "alpha beta gamma", None, "xy z"]
    texts_b = [BASE.replace("warm", "cold"), "", "ab", "beta gamma alpha",
               "something else entirely", "xy z"]
    # char n-gram path (_pair_jaccard distinct-s the raw multisets)
    ha, ra = dd._char_window_hashes(pa.array(texts_a, type=pa.string()), 5)
    hb, rb = dd._char_window_hashes(pa.array(texts_b, type=pa.string()), 5)
    js = dd._pair_jaccard(ha, ra, hb, rb, len(texts_a))
    exp = [dd.jaccard(dd.char_ngrams(a or "", 5), dd.char_ngrams(b or "", 5))
           for a, b in zip(texts_a, texts_b)]
    assert np.allclose(js, exp, atol=0), (list(js), exp)
    # word-shingle path (texts here are already analyzer-normalized,
    # so the pre_tokenized whitespace split is token-identical)
    for pt in (False, True):
        ha, ra = dd._window_hashes(pa.array(texts_a, type=pa.string()),
                                   CFG, 3, pre_tokenized=pt)
        hb, rb = dd._window_hashes(pa.array(texts_b, type=pa.string()),
                                   CFG, 3, pre_tokenized=pt)
        js = dd._pair_jaccard(ha, ra, hb, rb, len(texts_a))
        exp = [dd.jaccard(dd.word_shingles((a or "").split(), 3),
                          dd.word_shingles((b or "").split(), 3))
               for a, b in zip(texts_a, texts_b)]
        assert np.allclose(js, exp, atol=0), (pt, list(js), exp)


def test_encoded_pair_jaccard_doc_order_with_short_texts():
    """Regression (round-4 review): _char_window_hashes appended
    short-text (< n chars) windows AFTER the full-text block, breaking
    _expand_windows' doc-contiguous offset contract — a short text
    preceding longer ones misattributed windows through the FULL
    _encoded_pair_jaccard path (the unit kernel test above bypasses
    _expand_windows and could not catch it)."""
    texts_a = ["ab", "hello world", "xy", "hello worlz", ""]
    texts_b = ["hello world", "ab", "hello world", "ab", "ab"]
    js = dd._encoded_pair_jaccard(
        pa.array(texts_a, type=pa.string()),
        pa.array(texts_b, type=pa.string()),
        lambda t: dd._char_window_hashes(t, 3))
    exp = [dd.jaccard(dd.char_ngrams(a, 3), dd.char_ngrams(b, 3))
           for a, b in zip(texts_a, texts_b)]
    assert np.allclose(js, exp, atol=0), (list(js), exp)


def test_bounded_bucket_edges_unit():
    ids = np.arange(5, dtype=np.int64)
    a, b = dd.bounded_bucket_edges(ids, cap=10)
    assert len(a) == 10                      # all 5*4/2 pairs
    assert (a < b).all()
    a2, b2 = dd.bounded_bucket_edges(ids, cap=3)   # oversize -> star
    assert len(a2) == 4 and (a2 == 0).all()
    assert sorted(b2.tolist()) == [1, 2, 3, 4]


def test_minhash_hot_bucket_bounded():
    """A 10k-member identical-text bucket must complete in bounded time
    (star edges, not O(n^2) pairs) and still cluster every member."""
    import time
    n = 10_000
    texts = [BASE] * n
    ds = rd.from_arrow(_doc_table(texts))
    t0 = time.perf_counter()
    out = dd.minhash_lsh_dedup(ds, CFG, "doc_id", "text", threshold=0.5)
    elapsed = time.perf_counter() - t0
    assert len(out) == n
    assert (out["cluster_id"] == 0).all()
    assert elapsed < 180, f"hot bucket took {elapsed:.1f}s - unbounded?"


def test_simhash_hot_bucket_bounded():
    """Oversize simhash buckets go through the sorted-window path; exact
    duplicates (hamming 0) must still pair up."""
    texts = [BASE] * 50 + [f"unique doc number {i} talking about topic {i}"
                           for i in range(20)]
    ds = rd.from_arrow(_doc_table(texts))
    out = dd.simhash_near_dups(ds, CFG, "doc_id", "text", max_hamming=3,
                               bucket_cap=16)   # force the windowed path
    # identical docs sort adjacently -> every consecutive pair found; the
    # union of windowed pairs must cover all 50 identical docs
    ids = set(out["id_a"]) | set(out["id_b"])
    assert set(range(50)) <= ids
    assert (out["hamming"] <= 3).all()


def test_embedding_near_dups_banded_recall():
    """Planted near-identical vectors must survive the banded LSH."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32))
    dup = base[:10] + 1e-4 * rng.standard_normal((10, 32))
    vecs = np.concatenate([base, dup]).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                    "embedding": pa.array([v for v in vecs],
                                          type=pa.list_(pa.float32()))})
    out = knn_pl.embedding_near_dups(rd.from_arrow(tbl), threshold=0.999)
    found = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    assert {(i, 40 + i) for i in range(10)} <= found


def test_audio_decode_is_real():
    """Audio WAV payloads decode for REAL (stdlib wave): a planted sine's
    dominant frequency lands in the expected pooled-spectrum bin, and
    duration/RMS come out physically right."""
    rate = 16000
    t = np.arange(int(0.2 * rate)) / rate
    low = mm.wav_bytes(0.7 * np.sin(2 * np.pi * 300 * t), rate)    # ~300 Hz
    high = mm.wav_bytes(0.7 * np.sin(2 * np.pi * 6000 * t), rate)  # ~6 kHz
    stub = mm.DecodeStub(feature_dim=16, fake=False)
    f_low = stub._decode_one(low, "audio")
    f_high = stub._decode_one(high, "audio")
    assert abs(f_low[0] - 0.2) < 1e-3          # duration
    assert abs(f_low[1] - 0.7 / np.sqrt(2)) < 0.01   # sine RMS
    spec_low, spec_high = f_low[3:], f_high[3:]
    assert spec_low.argmax() < spec_high.argmax()    # freq ordering
    # distributed real decode over an audio table
    tbl = mm.synth_audio_table(40)
    out = mm.decode_features(rd.from_arrow(tbl), fake=False).to_pandas()
    assert len(out) == 40 and all(len(f) == 16 for f in out.feature)


def test_image_decode_rejects_non_png():
    stub = mm.DecodeStub(fake=False)
    with pytest.raises(ValueError, match="not a PNG"):
        stub._decode_one(b"notanimage", "image")


def test_minhash_pair_distinct_fallback_identical(monkeypatch):
    """Above _UNION_MAX_PAIRS the pair distinct falls back to a groupby
    exchange; both paths must return the same distinct pair set."""
    texts = [BASE,
             BASE.replace("warm", "cold"),
             BASE + " and then some extra words appear",
             "completely different content about database engines and queries"]
    ds = rd.from_arrow(_doc_table(texts))
    fast = dd.minhash_candidate_pairs(ds, CFG, "doc_id", "text").to_pandas()
    monkeypatch.setattr(dd, "_UNION_MAX_PAIRS", 0)    # force groupby path
    slow = dd.minhash_candidate_pairs(ds, CFG, "doc_id", "text").to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].to_numpy()))
    assert key(fast) == key(slow) and len(fast) > 0


def test_simhash_pair_distinct_fallback_identical(monkeypatch):
    """Simhash's cross-chunk distinct has the same two paths as minhash
    (per-block unique + one union task vs groupby fallback); both must
    return the same (id_a, id_b, hamming) set."""
    texts = [BASE,
             BASE,                              # exact dup: hamming 0
             BASE + " tail tokens",
             "completely different content about database engines"]
    ds = rd.from_arrow(_doc_table(texts))
    fast = dd.simhash_near_dups(ds, CFG, "doc_id", "text")
    monkeypatch.setattr(dd, "_UNION_MAX_PAIRS", 0)    # force groupby path
    slow = dd.simhash_near_dups(ds, CFG, "doc_id", "text")
    key = lambda df: sorted(map(tuple,
                                df[["id_a", "id_b", "hamming"]].to_numpy()))
    assert key(fast) == key(slow) and len(fast) > 0


def _uf_components(edges) -> dict:
    """Reference driver-rule union-find: cluster_id = min member id."""
    parent: dict = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {m: find(m) for m in parent}


def test_pairs_components_matches_union_find_random_graph():
    rng = np.random.default_rng(11)
    # sparse random graph + a 120-node chain (exercises pointer jumping
    # over a long diameter) + isolated-pair islands
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 400, (300, 2))
             if a != b}
    edges |= {(1000 + i, 1001 + i) for i in range(120)}      # chain
    edges |= {(5000, 5001), (6000, 6002)}
    ea, eb = zip(*sorted(edges))
    ds = rd.from_arrow(pa.table({"id_a": pa.array(ea, type=pa.int64()),
                                 "id_b": pa.array(eb, type=pa.int64())}))
    out = dd.pairs_components(ds, num_parts=4).to_pandas()
    got = dict(zip(out.id, out.cluster_id))
    assert got == _uf_components(edges)


def test_pairs_components_string_ids_single_part():
    edges = [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("zzz", "yyy")]
    ds = rd.from_arrow(pa.table({"id_a": [a for a, _ in edges],
                                 "id_b": [b for _, b in edges]}))
    out = dd.pairs_components(ds, num_parts=1).to_pandas()
    got = dict(zip(out.id, out.cluster_id))
    assert got == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                   "yyy": "yyy", "zzz": "yyy"}


def test_minhash_scale_path_identical_to_driver_union_find():
    """Verdict item: mirror-heavy corpus (50% planted duplicates) must
    cluster identically whether the verified pairs run the driver
    union-find or the distributed pairs_components fallback."""
    rng = np.random.default_rng(3)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    base = [" ".join(rng.choice(vocab, 12)) for _ in range(40)]
    texts = base + base                      # 50% exact duplicates
    ds = rd.from_arrow(_doc_table(texts))
    drv = dd.minhash_lsh_dedup(ds, CFG, "doc_id", "text", threshold=0.9)
    dist = dd.minhash_lsh_dedup(ds, CFG, "doc_id", "text", threshold=0.9,
                                uf_max_pairs=0)   # force the scale path
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dist.reset_index(drop=True))
    assert len(drv) >= 80 * 0.5              # every planted dup clustered
    # the 100-TB shape: labels stay a Dataset (no driver materialization)
    lab_ds = dd.minhash_lsh_dedup(ds, CFG, "doc_id", "text",
                                  threshold=0.9, uf_max_pairs=0,
                                  as_dataset=True)
    lab = lab_ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(lab, drv.reset_index(drop=True),
                                  check_dtype=False)
    # the driver-side cliff is now an explicit error, not an OOM
    with pytest.raises(ValueError, match="driver_result_cap"):
        dd.minhash_lsh_dedup(ds, CFG, "doc_id", "text", threshold=0.9,
                             uf_max_pairs=0, driver_result_cap=3)
