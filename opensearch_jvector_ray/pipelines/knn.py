"""Similarity search over an embedding column (list<float>).

Brute-force top-k is the exact baseline (per-batch numpy matmul against a
broadcast query matrix -> bounded per-batch partial top-k -> driver merge
— the same partial+final reduce shape as BM25's A1); IVF is the scale
path (k-means coarse quantizer trained on a sample — the analog of the
reference's PQ training-then-encode lifecycle T2,
`JVectorWriter.java:381-414`: sample -> train once -> broadcast -> encode
in parallel).

Distance kernels + score translations come from functions/scoring.py
(the KNNScoringUtil surface, §2.8).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from opensearch_jvector_ray.functions import scoring

METRICS: dict[str, tuple[Callable, Callable, bool]] = {
    # name -> (raw kernel, lucene score translation, higher_is_better_raw)
    "l2": (scoring.l2_squared, scoring.l2_score, False),
    "cosine": (scoring.cosine_similarity, scoring.cosine_score, True),
    "innerproduct": (scoring.inner_product, scoring.inner_product_score, True),
    "l1": (scoring.l1_norm, scoring.l1_score, False),
    "linf": (scoring.linf_norm, scoring.linf_score, False),
}


def _partial_topk(ids: np.ndarray, score: np.ndarray,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch bounded top-k with EXACT boundary ties (score desc, id
    asc) — argpartition's arbitrary pick at tied boundaries would make the
    result depend on batching (same fix as the BM25 collector)."""
    n = min(k, len(ids))
    if n == 0:
        return ids[:0], score[:0]
    if len(ids) > n:
        part = np.argpartition(-score, n - 1)[:n]
        boundary = score[part].min()
        above = np.flatnonzero(score > boundary)
        tie_pos = np.flatnonzero(score == boundary)
        tie_idx = tie_pos[np.argsort(ids[tie_pos], kind="stable")][: n - len(above)]
        sel = np.concatenate([above, tie_idx])
    else:
        sel = np.arange(len(ids))
    order = np.lexsort((ids[sel], -score[sel]))
    sel = sel[order]
    return ids[sel], score[sel]


def _vecs_from_batch(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def brute_force_topk(ds: "rd.Dataset", queries: dict[str, np.ndarray],
                     k: int, metric: str = "cosine", id_col: str = "vec_id",
                     vec_col: str = "embedding") -> pd.DataFrame:
    """Exact top-k for each query vector.

    Returns (query_id, rank, id, score) with Lucene-style score ordering
    (higher = closer) and (score desc, id asc) tie-break.  The query
    matrix is put in the object store ONCE and read per task — never
    re-shipped per batch.
    """
    kernel, translate, higher = METRICS[metric]
    qids = sorted(queries)
    qmat_ref = ray.put(np.stack([queries[q] for q in qids]).astype(np.float64))

    def score_batch(batch: pa.Table) -> pa.Table:
        qmat = ray.get(qmat_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            raw = kernel(vecs, qmat[qi])
            score = translate(raw)
            sel_ids, sel_sc = _partial_topk(ids, score, k)
            out_q.extend([qid] * len(sel_ids))
            out_id.append(sel_ids)
            out_s.append(sel_sc)
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    out = (parts.sort_values(["query_id", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search — the scale path
# ---------------------------------------------------------------------------

def train_centroids(ds: "rd.Dataset", n_centroids: int, vec_col: str,
                    sample_frac: float = 0.25, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """k-means on a sample (sample stage -> single training task ->
    broadcastable centroid matrix; T2 lifecycle)."""
    sample = ds.random_sample(min(1.0, sample_frac), seed=seed)
    mats = [
        _vecs_from_batch(b, vec_col)
        for b in sample.iter_batches(batch_format="pyarrow", batch_size=65536)]
    X = np.concatenate(mats) if mats else np.zeros((0, 2))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, max(1, len(X)))
    cent = X[rng.choice(len(X), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
    return cent


def ivf_topk(ds: "rd.Dataset", queries: dict[str, np.ndarray], k: int,
             *, n_centroids: int = 16, n_probe: int = 4,
             metric: str = "cosine", id_col: str = "vec_id",
             vec_col: str = "embedding", centroids: np.ndarray | None = None,
             ) -> pd.DataFrame:
    """Approximate top-k: probe the n_probe nearest coarse cells per query
    and brute-force only within them.  At scale the assignment is a build-
    time partitioning (write one parquet dir per cell — pruned reads);
    here the cell filter runs inline to keep the pipeline one-pass."""
    if centroids is None:
        centroids = train_centroids(ds, n_centroids, vec_col)
    cent_ref = ray.put(centroids)
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    # cells to probe per query (by centroid L2)
    qd = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :n_probe]
    probe_sets = {qid: set(probe[i].tolist()) for i, qid in enumerate(qids)}
    kernel, translate, _ = METRICS[metric]
    qmat_ref = ray.put(qmat)
    probe_ref = ray.put(probe_sets)

    def score_batch(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        qm = ray.get(qmat_ref)
        probes = ray.get(probe_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cell, list(probes[qid]))
            if not mask.any():
                continue
            sub = vecs[mask]
            sub_ids = ids[mask]
            score = translate(kernel(sub, qm[qi]))
            sel_ids, sel_sc = _partial_topk(sub_ids, score, k)
            out_q.extend([qid] * len(sel_ids))
            out_id.append(sel_ids)
            out_s.append(sel_sc)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    out = (parts.sort_values(["query_id", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


def binary_quantize_batch(batch: pa.Table, vec_col: str = "embedding",
                          out_col: str = "bits") -> pa.Table:
    """Sign-bit binary quantization: float vector -> packed uint8 bytes,
    1 bit/dimension (the reference's `binary` VectorDataType,
    `VectorDataType.java:38` — dimension counted in bits)."""
    vecs = _vecs_from_batch(batch, vec_col)
    bits = np.packbits((vecs > 0).astype(np.uint8), axis=1)
    return batch.append_column(out_col, pa.array([b.tobytes() for b in bits],
                                                 type=pa.binary()))


def hamming_topk(ds: "rd.Dataset", queries: dict[str, np.ndarray], k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 ) -> pd.DataFrame:
    """Top-k by bit-level hamming over sign-quantized vectors; score =
    1/(1+d) (`SpaceType.HAMMING` ordering).  Same partial+final reduce
    shape as brute_force_topk."""
    qids = sorted(queries)
    qbits = np.stack([np.packbits((queries[q] > 0).astype(np.uint8))
                      for q in qids])
    qref = ray.put(qbits)

    def score_batch(batch: pa.Table) -> pa.Table:
        qb = ray.get(qref)
        vecs = _vecs_from_batch(batch, vec_col)
        bits = np.packbits((vecs > 0).astype(np.uint8), axis=1)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            d = np.unpackbits(np.bitwise_xor(bits, qb[qi][None, :]),
                              axis=1).sum(axis=1).astype(np.float64)
            score = 1.0 / (1.0 + d)
            sel_ids, sel_sc = _partial_topk(ids, score, k)
            out_q.extend([qid] * len(sel_ids))
            out_id.append(sel_ids)
            out_s.append(sel_sc)
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    out = (parts.sort_values(["query_id", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


def build_ivf_index(ds: "rd.Dataset", index_dir: str, *,
                    n_centroids: int = 16, vec_col: str = "embedding",
                    id_col: str = "vec_id", sample_frac: float = 0.25,
                    seed: int = 42) -> np.ndarray:
    """Persist an IVF index: one parquet DIRECTORY per coarse cell.

    The scale path promised by ``ivf_topk``'s docstring: train the coarse
    quantizer on a sample (T2 lifecycle), broadcast the centroids, assign
    cells in one vectorized pass, and write ``cell=K/`` partition
    directories so query-time probing READS ONLY the probed cells
    (prune-at-the-read, not a post-read filter).  Centroids are saved to
    ``centroids.npy`` alongside.
    """
    import os
    os.makedirs(index_dir, exist_ok=True)
    centroids = train_centroids(ds, n_centroids, vec_col,
                                sample_frac=sample_frac, seed=seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column("cell", pa.array(d.argmin(axis=1).astype(np.int32)))

    (ds.map_batches(assign, batch_format="pyarrow")
       .write_parquet(index_dir, partition_cols=["cell"]))
    # "_"-prefixed files are ignored by parquet dataset discovery
    np.save(os.path.join(index_dir, "_centroids.npy"), centroids)
    return centroids


def ivf_index_topk(index_dir: str, queries: dict[str, np.ndarray], k: int,
                   *, n_probe: int = 4, metric: str = "cosine",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   ) -> pd.DataFrame:
    """Query a persisted IVF index: per query, read ONLY the n_probe
    nearest cell directories, brute-force within, merge.  Union of probed
    cells is read once and scored per query with its own probe mask."""
    import os
    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    qd = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :n_probe]
    probe_sets = {qid: set(probe[i].tolist()) for i, qid in enumerate(qids)}
    union_cells = sorted({c for s in probe_sets.values() for c in s})
    kernel, translate, _ = METRICS[metric]

    # prune at the read: ONLY the probed cell directories are listed
    import glob as globmod
    from ray.data.datasource.partitioning import Partitioning
    paths = sorted(f for c in union_cells
                   for f in globmod.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    if not paths:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    ds = rd.read_parquet(paths,
                         partitioning=Partitioning("hive", base_dir=index_dir))
    qref = ray.put((qmat, probe_sets))

    def score_batch(batch: pa.Table) -> pa.Table:
        qm, probes = ray.get(qref)
        import pyarrow.compute as pc
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cells = pc.cast(batch["cell"], pa.int64()).to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cells, list(probes[qid]))
            if not mask.any():
                continue
            score = translate(kernel(vecs[mask], qm[qi]))
            sel_ids, sel_sc = _partial_topk(ids[mask], score, k)
            out_q.extend([qid] * len(sel_ids))
            out_id.append(sel_ids)
            out_s.append(sel_sc)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    parts = ds.map_batches(score_batch, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    out = (parts.sort_values(["query_id", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


def embedding_near_dups(ds: "rd.Dataset", threshold: float = 0.995,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_planes: int = 8, seed: int = 7) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH buckets:
    sign-signature groupby, exact cosine verify within buckets."""
    def bucket(batch: pa.Table) -> pa.Table:
        vecs = _vecs_from_batch(batch, vec_col)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        signs = (vecs @ planes) > 0
        sig = (signs.astype(np.uint64)
               << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        return pa.table({"bucket": pa.array(sig.astype(np.int64)),
                         id_col: batch[id_col], vec_col: batch[vec_col]})

    def verify(group: pa.Table) -> pa.Table:
        vecs = _vecs_from_batch(group, vec_col)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sim = unit @ unit.T
        iu = np.triu_indices(len(ids), k=1)
        hit = sim[iu] >= threshold
        a, b = ids[iu[0][hit]], ids[iu[1][hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                         "cosine": pa.array(np.round(sim[iu][hit], 6))})

    out = (ds.map_batches(bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(verify, batch_format="pyarrow")
             .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    return (out.drop_duplicates(subset=["id_a", "id_b"])
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
