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

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from opensearch_jvector_ray.functions import scoring

class _MetricTable(dict):
    """dict with a helpful error: a typo'd metric name lists the valid
    vocabulary instead of a bare KeyError."""

    def __missing__(self, key):
        raise ValueError(f"unknown metric {key!r} "
                         f"(valid: {sorted(self)})")


METRICS: "dict[str, tuple[Callable, Callable, bool]]" = _MetricTable({
    # name -> (raw kernel, lucene score translation, higher_is_better_raw)
    "l2": (scoring.l2_squared, scoring.l2_score, False),
    "cosine": (scoring.cosine_similarity, scoring.cosine_score, True),
    "innerproduct": (scoring.inner_product, scoring.inner_product_score, True),
    "l1": (scoring.l1_norm, scoring.l1_score, False),
    "linf": (scoring.linf_norm, scoring.linf_score, False),
})


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


def _rounder(round_decimals: int | None):
    """One tie rule on BOTH sides: when an entry is oracle-checked, scores
    are rounded BEFORE top-k selection (the DuckDB oracle ranks on the
    rounded value too) — ranking raw here and rounded there lets sub-5e-7
    raw gaps produce different orders (the rounding-drift rule in
    CLAUDE.md)."""
    if round_decimals is None:
        return lambda s: s
    return lambda s: np.round(s, round_decimals)


def _vecs_from_batch(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 1), dtype=np.float64)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type) or \
            pa.types.is_fixed_size_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    else:   # object column of per-row arrays (post-pandas-join payloads)
        flat = np.concatenate([np.asarray(v, dtype=np.float64)
                               for v in col.to_pylist()])
    return flat.reshape(n, -1)


def brute_force_topk(ds: "rd.Dataset", queries: dict[str, np.ndarray],
                     k: int | None, metric: str = "cosine",
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     *, round_decimals: int | None = None,
                     filter_expr=None,
                     min_score: float | None = None,
                     max_distance: float | None = None,
                     as_dataset: bool = False):
    """Exact top-k (or radial, if ``min_score`` given) for each query vector.

    Returns (query_id, rank, id, score) with Lucene-style score ordering
    (higher = closer) and (score desc, id asc) tie-break.  The query
    matrix is put in the object store ONCE and read per task — never
    re-shipped per batch.

    ``filter_expr`` is a pyarrow dataset expression applied to each batch
    BEFORE scoring — the pre-filter semantics of the reference's filtered
    knn (`KNNQueryBuilder.java:534-539`, J2 for vectors).  ``min_score``
    switches to radial search: EVERY vector scoring >= min_score is
    returned, unbounded (`KNNQueryBuilder.java:438-472` min_score path);
    ``k`` is ignored in that mode.  ``max_distance`` is the reference's
    other radial form: it is translated per-space into the equivalent
    min_score (`KNNEngine.distanceToRadialThreshold`,
    `KNNEngine.java:100-192`) and follows the same path; passing both is
    an error.  ``as_dataset=True`` (radial only) returns the qualifying
    rows as a streaming Dataset — unranked, never driver-materialized —
    mirroring the BM25 side's Dataset radial.
    """
    if max_distance is not None:
        if min_score is not None:
            raise ValueError("pass min_score OR max_distance, not both "
                             "(KNNQueryBuilder.java:438-472)")
        min_score = scoring.distance_to_min_score(metric, max_distance)
    if as_dataset and min_score is None:
        raise ValueError("as_dataset=True is radial-only (pass min_score "
                         "or max_distance); ranked top-k is inherently a "
                         "driver-side result")
    kernel, translate, higher = METRICS[metric]
    rnd = _rounder(round_decimals)
    qids = sorted(queries)
    qmat_ref = ray.put(np.stack([queries[q] for q in qids]).astype(np.float64))

    def score_batch(batch: pa.Table) -> pa.Table:
        qmat = ray.get(qmat_ref)
        if filter_expr is not None:
            batch = batch.filter(filter_expr)
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            score = rnd(translate(kernel(vecs, qmat[qi])))
            if min_score is not None:
                keep = score >= min_score
                sel_ids, sel_sc = ids[keep], score[keep]
            else:
                sel_ids, sel_sc = _partial_topk(ids, score, k)
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

    scored = ds.map_batches(score_batch, batch_format="pyarrow",
                            batch_size=8192)
    if min_score is not None and as_dataset:
        # radial output is result-sized by definition; this variant keeps
        # it a streaming Dataset (unranked — the global rank would force a
        # full materialization) for the 100-TB serving path
        return scored
    parts = scored.to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    out = (parts.sort_values(["query_id", "score", id_col],
                             ascending=[True, False, True], kind="mergesort"))
    if min_score is None:
        out = out.groupby("query_id", sort=False).head(k)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


def byte_topk(ds: "rd.Dataset", queries: dict[str, np.ndarray],
              k: int | None, metric: str = "l2",
              id_col: str = "vec_id", vec_col: str = "embedding",
              *, round_decimals: int | None = None,
              min_score: float | None = None,
              max_distance: float | None = None) -> pd.DataFrame:
    """``byte`` (int8) vector search (`VectorDataType.java:31-84`): every
    vector and query is validated to whole numbers in [-128, 127]
    (`KNNValidationUtil.validateByteVectorValue`), STORED as list<int8>
    (4x smaller than float32 through the object store), and scored with
    the shared float64 kernels — int8 values are exactly representable,
    so scores are bit-identical to the float path on the same numbers."""
    qv = {q: scoring.validate_byte_vector(v) for q, v in queries.items()}

    def to_int8(batch: pa.Table) -> pa.Table:
        # no empty-batch early-out: the int8 cast must apply to EVERY
        # block or an empty block keeps the float list type and the
        # stream's schemas diverge
        vecs = scoring.validate_byte_vector(_vecs_from_batch(batch, vec_col))
        n, d = vecs.shape
        offs = pa.array(np.arange(0, (n + 1) * d, max(d, 1),
                                  dtype=np.int32)[: n + 1])
        lst = pa.ListArray.from_arrays(
            offs, pa.array(vecs.astype(np.int8).ravel()))
        return batch.set_column(batch.column_names.index(vec_col),
                                vec_col, lst)

    byte_ds = ds.map_batches(to_int8, batch_format="pyarrow")
    return brute_force_topk(byte_ds, qv, k, metric, id_col, vec_col,
                            round_decimals=round_decimals,
                            min_score=min_score, max_distance=max_distance)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search — the scale path
# ---------------------------------------------------------------------------

def _sq_dists(vecs: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via one pass per centroid — exact
    ((v-c)^2 summed, the same pairwise op the SQL oracle's list_distance
    uses) without the (n, k, d) broadcast blow-up."""
    n, k = len(vecs), len(cent)
    d = np.empty((n, k), dtype=np.float64)
    for c in range(k):
        diff = vecs - cent[c][None, :]
        d[:, c] = np.einsum("ij,ij->i", diff, diff)
    return d


def _argmin_cells_mm(vecs: np.ndarray, cent: np.ndarray,
                     chunk: int = 4096) -> np.ndarray:
    """Row-wise argmin of squared L2 — argmax(v.c - ||c||^2/2) via
    CHUNKED matmul, never materializing the full (n, k) distance matrix
    (each (chunk, k) block stays cache-resident; on this memory-
    throttled box the k-per-centroid-passes form cost the IVF trainer
    ~200s and the full (n, k) float64 intermediates another ~4x).
    Ties go to the lowest index (argmax-first == argmin's rule).

    For TRAINER / ENCODER paths only: the expansion reorders float
    summation, so near-tie argmins can flip vs the pairwise form.  That
    is immaterial where it's used — k-means is a heuristic and every
    PQ/IVF-PQ driver oracle is degenerate-exact (codes only reorder the
    walk; full probe/oversample/beam + exact rescore decide the rows) —
    but cell ASSIGNMENT and PROBING with fixed centroids are mirrored
    verbatim by the SQL oracles, so those stay on ``_sq_dists``."""
    c2h = 0.5 * np.einsum("ij,ij->i", cent, cent)
    centT = np.ascontiguousarray(cent.T)
    out = np.empty(len(vecs), dtype=np.int64)
    for lo in range(0, len(vecs), chunk):
        blk = vecs[lo: lo + chunk] @ centT          # (B, k)
        np.subtract(blk, c2h[None, :], out=blk)
        out[lo: lo + chunk] = blk.argmax(axis=1)
    return out


def _assign_cells(vecs: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Coarse-cell assignment: argmin squared-L2, ties to the LOWEST cell
    index (np.argmin's rule — the SQL oracle uses (dist asc, cell asc))."""
    return _sq_dists(vecs, cent).argmin(axis=1)


def _probe_cells(qmat: np.ndarray, cent: np.ndarray, n_probe: int) -> np.ndarray:
    """(n_queries, n_probe) nearest cells per query; ties to lower cell id
    (stable sort — same rule as the oracle's (dist asc, cell asc))."""
    qd = _sq_dists(qmat, cent)
    return np.argsort(qd, axis=1, kind="stable")[:, :n_probe]


def train_centroids(ds: "rd.Dataset", n_centroids: int, vec_col: str,
                    sample_size: int = 65536, iters: int = 10,
                    seed: int = 42, sample_frac: float | None = None,
                    ) -> np.ndarray:
    """k-means coarse quantizer trained on a BOUNDED sample (T2 lifecycle,
    `JVectorWriter.java:381-414`: train on bounded segment data, broadcast).

    Scale shape: the sample is thinned distributedly (seeded
    ``random_sample`` sized off the row count, capped at ``sample_size``
    rows), its blocks stay in the object store, and Lloyd iterations run in
    ONE Ray task over the bounded matrix — trainer memory is independent of
    corpus size and nothing concentrates on the driver.
    """
    if sample_frac is None:
        n_rows = ds.count() or 1
        # 1.5x headroom so the Bernoulli thinning rarely undershoots; the
        # limit() below enforces the hard cap either way
        sample_frac = min(1.0, 1.5 * sample_size / n_rows)
    sample = ds.select_columns([vec_col])
    if sample_frac < 1.0:
        sample = sample.random_sample(sample_frac, seed=seed)
    refs = sample.limit(sample_size).to_arrow_refs()

    @ray.remote
    def _train(*blocks) -> np.ndarray:
        mats = [_vecs_from_batch(b, vec_col) for b in blocks if b.num_rows]
        X = np.concatenate(mats) if mats else np.zeros((0, 2))
        return _kmeans_rows(X, n_centroids, iters=iters, seed=seed)

    return ray.get(_train.remote(*refs))


def _cell_sums(X: np.ndarray, assign: np.ndarray, k: int) -> np.ndarray:
    """Per-cell column sums via one bincount per column (np.add.at is an
    unbuffered scatter, ~10x slower on wide matrices)."""
    sums = np.empty((k, X.shape[1]), dtype=np.float64)
    for j in range(X.shape[1]):
        sums[:, j] = np.bincount(assign, weights=X[:, j], minlength=k)
    return sums


def _kmeans_rows(X: np.ndarray, n_centroids: int, iters: int = 10,
                 seed: int = 42) -> np.ndarray:
    """Lloyd k-means over rows X (the single-task trainer core shared by
    ``train_centroids`` and the fused IVF-PQ trainer)."""
    if len(X) == 0:
        raise ValueError("cannot train centroids on an empty dataset "
                         "(no vectors reached the trainer sample)")
    rng = np.random.default_rng(seed)
    k = min(n_centroids, max(1, len(X)))
    cent = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = _argmin_cells_mm(X, cent)
        sums = _cell_sums(X, assign, k)
        counts = np.bincount(assign, minlength=k)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    return cent


def fixed_centroids(ds: "rd.Dataset", centroid_ids: list[int],
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    ) -> np.ndarray:
    """Deterministic coarse centers taken from FIXED data rows (by id).

    A valid coarse quantizer whose centers are SQL-expressible — the
    driver-oracle path for the IVF machinery (assignment, probing, ranked
    merge) runs with these; k-means-quality centers (``train_centroids``)
    are the recall path, gated in pytest."""
    tbl = pa.concat_tables(
        ds.filter(expr=f"{id_col} in {[int(i) for i in centroid_ids]!r}")
          .select_columns([id_col, vec_col])
          .iter_batches(batch_format="pyarrow"))
    order = np.argsort(tbl[id_col].to_numpy(zero_copy_only=False), kind="stable")
    return _vecs_from_batch(tbl, vec_col)[order]


def ivf_topk(ds: "rd.Dataset", queries: dict[str, np.ndarray], k: int,
             *, n_centroids: int = 16, n_probe: int = 4,
             metric: str = "cosine", id_col: str = "vec_id",
             vec_col: str = "embedding", centroids: np.ndarray | None = None,
             round_decimals: int | None = None) -> pd.DataFrame:
    """Approximate top-k: probe the n_probe nearest coarse cells per query
    and brute-force only within them.  At scale the assignment is a build-
    time partitioning (write one parquet dir per cell — pruned reads);
    here the cell filter runs inline to keep the pipeline one-pass."""
    if centroids is None:
        centroids = train_centroids(ds, n_centroids, vec_col)
    cent_ref = ray.put(centroids)
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    probe = _probe_cells(qmat, centroids, n_probe)
    probe_sets = {qid: set(probe[i].tolist()) for i, qid in enumerate(qids)}
    kernel, translate, _ = METRICS[metric]
    rnd = _rounder(round_decimals)
    qmat_ref = ray.put(qmat)
    probe_ref = ray.put(probe_sets)

    def score_batch(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        qm = ray.get(qmat_ref)
        probes = ray.get(probe_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cell = _assign_cells(vecs, cent)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cell, list(probes[qid]))
            if not mask.any():
                continue
            sub = vecs[mask]
            sub_ids = ids[mask]
            score = rnd(translate(kernel(sub, qm[qi])))
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
                 round_decimals: int | None = None) -> pd.DataFrame:
    """Top-k by bit-level hamming over sign-quantized vectors; score =
    1/(1+d) (`SpaceType.HAMMING` ordering).  Same partial+final reduce
    shape as brute_force_topk."""
    qids = sorted(queries)
    qbits = np.stack([np.packbits((queries[q] > 0).astype(np.uint8))
                      for q in qids])
    qref = ray.put(qbits)
    rnd = _rounder(round_decimals)

    def score_batch(batch: pa.Table) -> pa.Table:
        qb = ray.get(qref)
        vecs = _vecs_from_batch(batch, vec_col)
        bits = np.packbits((vecs > 0).astype(np.uint8), axis=1)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            d = np.unpackbits(np.bitwise_xor(bits, qb[qi][None, :]),
                              axis=1).sum(axis=1).astype(np.float64)
            score = rnd(1.0 / (1.0 + d))
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
                    n_centroids: int | None = 16,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id", sample_size: int = 65536,
                    seed: int = 42,
                    centroids: np.ndarray | None = None) -> np.ndarray:
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
    if centroids is None:
        if n_centroids is None:      # sqrt(n): the standard IVF sizing
            n_centroids = max(8, int((ds.count() or 1) ** 0.5))
        centroids = train_centroids(ds, n_centroids, vec_col,
                                    sample_size=sample_size, seed=seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        cell = _assign_cells(vecs, cent).astype(np.int32)
        return batch.append_column("cell", pa.array(cell))

    _stage_and_compact_cells(ds.map_batches(assign, batch_format="pyarrow"),
                             index_dir)
    # "_"-prefixed files are ignored by parquet dataset discovery
    np.save(os.path.join(index_dir, "_centroids.npy"), centroids)
    return centroids


def _stage_and_compact_cells(assigned: "rd.Dataset", index_dir: str) -> None:
    """Disk-staged cell routing + per-cell COMPACTION.

    A bare ``write_parquet(partition_cols=["cell"])`` emits one file per
    (input block x cell) — hundreds of tiny files whose per-file metadata
    fetch dominates query latency (measured 5.4s -> 0.3s on the read at
    bench scale).  Instead: stage the partitioned write under ``_stage``
    (no all-to-all sort — the graph-build routing trick), then one Ray
    task per cell rewrites it as a single ``data-0.parquet`` (tmp +
    atomic rename, so a finished file is a resume checkpoint; the
    ``cell`` column is dropped — hive dir names carry it).  At 100 TB
    the unit of work stays one cell per task; a size-sharded variant
    would emit data-N.parquet per row-group budget, same layout."""
    import glob as globmod
    import os
    import shutil
    stage = os.path.join(index_dir, "_stage")
    shutil.rmtree(stage, ignore_errors=True)
    assigned.write_parquet(stage, partition_cols=["cell"])
    cdirs = sorted(globmod.glob(os.path.join(stage, "cell=*")))

    def compact(batch: pa.Table) -> pa.Table:
        for cdir in batch["dir"].to_pylist():
            out = os.path.join(index_dir, os.path.basename(cdir))
            final = os.path.join(out, "data-0.parquet")
            if os.path.exists(final):
                continue
            tbl = pq.read_table(cdir)
            if "cell" in tbl.column_names:
                tbl = tbl.drop_columns(["cell"])
            os.makedirs(out, exist_ok=True)
            tmp = final + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, final)
        return batch

    if cdirs:
        (rd.from_items([{"dir": d} for d in cdirs])
           .map_batches(compact, batch_format="pyarrow", batch_size=1)
           .materialize())
    shutil.rmtree(stage, ignore_errors=True)


TOMBSTONES_NAME = "_tombstones.parquet"


def add_to_ivf_index(new_ds: "rd.Dataset", index_dir: str, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> None:
    """Incremental add: assign NEW vectors with the EXISTING coarse
    centroids (refine-not-retrain — the merge rule of the reference's
    quantizer lifecycle, `JVectorWriter.java:886-913`) and append files
    into the cell directories.  No existing data is rewritten."""
    import os
    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        cell = _assign_cells(vecs, cent).astype(np.int32)
        return batch.append_column("cell", pa.array(cell))

    (new_ds.map_batches(assign, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["cell"]))


def delete_from_ivf_index(index_dir: str, vec_ids: list[int],
                          id_col: str = "vec_id") -> None:
    """Record tombstones (update = delete + insert, D3): deleted ids are
    masked at query time and physically dropped by ``compact_ivf_index``
    — the reference's deletes-route-to-rebuild decision, deferred."""
    import os
    path = os.path.join(index_dir, TOMBSTONES_NAME)
    ids = set(int(i) for i in vec_ids)
    if os.path.exists(path):
        ids |= set(pq.read_table(path)[id_col].to_pylist())
    pq.write_table(pa.table({id_col: pa.array(sorted(ids),
                                              type=pa.int64())}), path)


def _load_tombstones(index_dir: str, id_col: str) -> np.ndarray | None:
    import os
    path = os.path.join(index_dir, TOMBSTONES_NAME)
    if not os.path.exists(path):
        return None
    return np.asarray(pq.read_table(path)[id_col].to_numpy(
        zero_copy_only=False), dtype=np.int64)


def compact_ivf_index(index_dir: str, dst_dir: str,
                      id_col: str = "vec_id") -> None:
    """Rewrite cell partitions dropping tombstoned rows; centroids are
    carried over unchanged (refine-not-retrain).  Cell-parallel, per-cell
    resumable (a finished cell dir is complete output)."""
    import glob as globmod
    import os
    os.makedirs(dst_dir, exist_ok=True)
    dead = _load_tombstones(index_dir, id_col)
    dead_ref = ray.put(dead)

    def compact(batch: pa.Table) -> pa.Table:
        dead_ids = ray.get(dead_ref)
        for cdir in batch["dir"].to_pylist():
            out = os.path.join(dst_dir, os.path.basename(cdir))
            final = os.path.join(out, "data.parquet")
            # resume checkpoint is the DATA FILE, not the dir: a crash
            # between makedirs and write must not look complete on rerun
            if os.path.exists(final):
                continue
            tbl = pq.read_table(cdir)
            if dead_ids is not None:
                keep = ~np.isin(tbl[id_col].to_numpy(zero_copy_only=False),
                                dead_ids)
                tbl = tbl.filter(pa.array(keep))
            if "cell" in tbl.column_names:  # partition col re-read inline
                tbl = tbl.drop_columns(["cell"])
            os.makedirs(out, exist_ok=True)
            tmp = final + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, final)          # atomic publish
        return batch

    cdirs = sorted(globmod.glob(os.path.join(index_dir, "cell=*")))
    if cdirs:
        # one Ray task per cell — the docstring's cell-parallel promise
        # (this was a sequential driver loop, the same tiny-file-era
        # shape _stage_and_compact_cells already fixed for builds)
        (rd.from_items([{"dir": d} for d in cdirs])
           .map_batches(compact, batch_format="pyarrow", batch_size=1)
           .materialize())
    np.save(os.path.join(dst_dir, "_centroids.npy"),
            np.load(os.path.join(index_dir, "_centroids.npy")))


def ivf_index_topk(index_dir: str, queries: dict[str, np.ndarray],
                   k: int | None,
                   *, n_probe: int = 4, metric: str = "cosine",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_decimals: int | None = None,
                   filter_ids: np.ndarray | list[int] | None = None,
                   min_score: float | None = None,
                   max_distance: float | None = None) -> pd.DataFrame:
    """Query a persisted IVF index: per query, read ONLY the n_probe
    nearest cell directories, brute-force within, merge.  Union of probed
    cells is read once and scored per query with its own probe mask.

    ``filter_ids`` is the reference's PRE-FILTER allow-list
    (`KNNQueryBuilder.java:534-539`): rows outside it are dropped before
    scoring — at full probe the result is exactly filtered brute force.
    ``min_score`` switches to RADIAL mode (unbounded score>=theta, ``k``
    ignored — `KNNQueryBuilder.java:438-472`); ``max_distance`` is the
    per-space translated radial form.  The allow-list ships to the
    cluster ONCE via ``ray.put``."""
    import os
    from opensearch_jvector_ray.functions import scoring as _scoring
    if max_distance is not None:
        if min_score is not None:
            raise ValueError("pass min_score OR max_distance, not both "
                             "(KNNQueryBuilder.java:438-472)")
        min_score = _scoring.distance_to_min_score(metric, max_distance)
    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    probe = _probe_cells(qmat, centroids, n_probe)
    probe_sets = {qid: set(probe[i].tolist()) for i, qid in enumerate(qids)}
    union_cells = sorted({c for s in probe_sets.values() for c in s})
    kernel, translate, _ = METRICS[metric]
    rnd = _rounder(round_decimals)
    allowed = (np.asarray(filter_ids, dtype=np.int64)
               if filter_ids is not None else None)

    # prune at the read: ONLY the probed cell directories are listed
    import glob as globmod
    from ray.data.datasource.partitioning import Partitioning
    paths = sorted(f for c in union_cells
                   for f in globmod.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    if not paths:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    ds = rd.read_parquet(paths,
                         partitioning=Partitioning("hive", base_dir=index_dir))
    dead = _load_tombstones(index_dir, id_col)
    qref = ray.put((qmat, probe_sets, dead, allowed))

    def score_batch(batch: pa.Table) -> pa.Table:
        qm, probes, dead_ids, allow = ray.get(qref)
        import pyarrow.compute as pc
        row_ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = None
        if dead_ids is not None:
            keep = ~np.isin(row_ids, dead_ids)
        if allow is not None:
            amask = np.isin(row_ids, allow)
            keep = amask if keep is None else (keep & amask)
        if keep is not None:
            batch = batch.filter(pa.array(keep))
            if batch.num_rows == 0:
                # id type mirrors the input column (string ids included)
                # so empty blocks never diverge from scored blocks
                return pa.table({"query_id": pa.array([], type=pa.string()),
                                 id_col: pa.array([], type=batch[id_col].type),
                                 "score": pa.array([], type=pa.float64())})
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cells = pc.cast(batch["cell"], pa.int64()).to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cells, list(probes[qid]))
            if not mask.any():
                continue
            score = rnd(translate(kernel(vecs[mask], qm[qi])))
            if min_score is not None:
                r_keep = score >= min_score
                sel_ids, sel_sc = ids[mask][r_keep], score[r_keep]
            else:
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
    out = parts.sort_values(["query_id", "score", id_col],
                            ascending=[True, False, True], kind="mergesort")
    if min_score is None:
        out = out.groupby("query_id", sort=False).head(k)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


@ray.remote
class IvfShardActor:
    """Serving-shape IVF search: owns a static subset of CELLS, decoded
    once in ``__init__`` (the held-open-reader analog of
    serve.SegmentShardActor / graph.GraphShardActor) — `ivf_index_topk`
    re-reads parquet per call, right for batch pipelines, wasteful for
    query serving."""

    def __init__(self, cell_dirs: list[str], id_col: str, vec_col: str):
        self.id_col = id_col
        self.cells = []
        for cdir in cell_dirs:
            cell_id = int(os.path.basename(cdir).split("=", 1)[1])
            tbl = pq.read_table(cdir)
            if tbl.num_rows == 0:
                continue
            self.cells.append({
                "cell": cell_id,
                "ids": tbl[id_col].to_numpy(zero_copy_only=False),
                "vecs": _vecs_from_batch(tbl, vec_col),
            })

    def search(self, qids: list[str], qmat: np.ndarray,
               probe_sets: dict[str, set], k: int | None, metric: str,
               round_decimals: int | None,
               min_score: float | None = None,
               filter_ids: np.ndarray | None = None,
               dead: np.ndarray | None = None) -> pd.DataFrame:
        kernel, translate, _ = METRICS[metric]
        rnd = _rounder(round_decimals)
        out_q, out_id, out_s = [], [], []
        for c in self.cells:
            q_here = [qi for qi, qid in enumerate(qids)
                      if c["cell"] in probe_sets[qid]]
            if not q_here:
                continue
            ids, vecs = c["ids"], c["vecs"]
            keep = None
            if dead is not None:
                keep = ~np.isin(ids, dead)
            if filter_ids is not None:
                amask = np.isin(ids, filter_ids)
                keep = amask if keep is None else (keep & amask)
            if keep is not None:
                ids, vecs = ids[keep], vecs[keep]
            if len(ids) == 0:
                continue
            for qi in q_here:
                score = rnd(translate(kernel(vecs, qmat[qi])))
                if min_score is not None:
                    r_keep = score >= min_score
                    sel_ids, sel_sc = ids[r_keep], score[r_keep]
                else:
                    sel_ids, sel_sc = _partial_topk(ids, score, k)
                out_q.extend([qids[qi]] * len(sel_ids))
                out_id.append(sel_ids)
                out_s.append(sel_sc)
        if not out_q:
            return pd.DataFrame(columns=["query_id", self.id_col, "score"])
        return pd.DataFrame({
            "query_id": out_q,
            self.id_col: np.concatenate(out_id),
            "score": np.concatenate(out_s)})


class IvfSearchService:
    """N long-lived actors, each owning a static subset of cells;
    results are frame-identical to ``ivf_index_topk`` (same probe rule,
    masks, tie/round rules) — asserted by tests."""

    def __init__(self, index_dir: str, num_shards: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import glob as globmod
        self.index_dir, self.id_col = index_dir, id_col
        self.centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
        cells = sorted(globmod.glob(os.path.join(index_dir, "cell=*")))
        n = max(1, min(num_shards, len(cells)))
        shards = [cells[i::n] for i in range(n)]
        self.actors = [IvfShardActor.remote(s, id_col, vec_col)
                       for s in shards if s]

    def search(self, queries: dict[str, np.ndarray], k: int | None, *,
               n_probe: int = 4, metric: str = "cosine",
               round_decimals: int | None = None,
               filter_ids: np.ndarray | list[int] | None = None,
               min_score: float | None = None,
               max_distance: float | None = None) -> pd.DataFrame:
        from opensearch_jvector_ray.functions import scoring as _scoring
        if max_distance is not None:
            if min_score is not None:
                raise ValueError("pass min_score OR max_distance, not both "
                                 "(KNNQueryBuilder.java:438-472)")
            min_score = _scoring.distance_to_min_score(metric, max_distance)
        qids = sorted(queries)
        qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
        probe = _probe_cells(qmat, self.centroids, n_probe)
        probe_sets = {qid: set(probe[i].tolist())
                      for i, qid in enumerate(qids)}
        allow = (ray.put(np.asarray(filter_ids, dtype=np.int64))
                 if filter_ids is not None else None)
        dead = _load_tombstones(self.index_dir, self.id_col)
        dref = ray.put(dead) if dead is not None else None
        futs = [a.search.remote(qids, qmat, probe_sets, k, metric,
                                round_decimals, min_score, allow, dref)
                for a in self.actors]
        parts = ray.get(futs)
        out = (pd.concat(parts, ignore_index=True) if parts
               else pd.DataFrame(columns=["query_id", self.id_col,
                                          "score"]))
        if out.empty:
            return pd.DataFrame(
                columns=["query_id", "rank", self.id_col, "score"])
        out = out.sort_values(["query_id", "score", self.id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
        if min_score is None:
            out = out.groupby("query_id", sort=False).head(k)
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return out[["query_id", "rank", self.id_col,
                    "score"]].reset_index(drop=True)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def embedding_near_dups(ds: "rd.Dataset", threshold: float = 0.995,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_bands: int = 8, band_planes: int = 16,
                        seed: int = 7,
                        bucket_cap: int = 512) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs via BANDED random-hyperplane LSH.

    n_bands independent sign-signatures of band_planes hyperplanes each
    (the minhash-banding shape: a pair is a candidate if ANY band's 16-bit
    signature matches — recall ~1-(1-p^16)^8 with p = 1-theta/pi, ~0.999
    at cos 0.995).  Buckets carry (band, signature, id) rows ONLY — no
    vectors ride the shuffle; per-bucket candidate edges are BOUNDED
    (all-pairs up to bucket_cap, star edges above), and the exact cosine
    verify runs distributed over the pairs Dataset with vectors attached
    by hash-co-partitioned joins (attach_pair_payloads).
    """
    from opensearch_jvector_ray.pipelines.dedup import (
        attach_pair_payloads, bounded_bucket_edges, candidate_payloads,
    )
    from ray.data.aggregate import Count

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = _vecs_from_batch(batch, vec_col)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_bands * band_planes))
        signs = ((vecs @ planes) > 0).astype(np.uint64)
        sig = signs.reshape(len(vecs), n_bands, band_planes)
        sig = (sig << np.arange(band_planes, dtype=np.uint64)[None, None, :]
               ).sum(axis=2)
        ids = batch[id_col]
        parts = [pa.table({
            "band": pa.array(np.full(len(vecs), b, dtype=np.int32)),
            "sig": pa.array(sig[:, b].astype(np.int64)),
            id_col: ids}) for b in range(n_bands)]
        return pa.concat_tables(parts)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group[id_col].to_numpy(zero_copy_only=False))
        a, b = bounded_bucket_edges(ids, cap=bucket_cap)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    pairs = (ds.map_batches(bucket, batch_format="pyarrow")
               .groupby(["band", "sig"])
               .map_groups(bucket_pairs, batch_format="pyarrow")
               .groupby(["id_a", "id_b"])
               .aggregate(Count(alias_name="__n"))
               .drop_columns(["__n"])
               .materialize())

    def payload(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col], "__payload": batch[vec_col]})

    cand_vecs, n_ids = candidate_payloads(ds, pairs, id_col, payload)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        va = _vecs_from_batch(batch, "text_a")
        vb = _vecs_from_batch(batch, "text_b")
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        denom = na * nb
        denom[denom == 0] = 1.0
        cos = np.einsum("ij,ij->i", va, vb) / denom
        hit = cos >= threshold
        return pa.table({
            "id_a": batch["id_a"].filter(pa.array(hit)),
            "id_b": batch["id_b"].filter(pa.array(hit)),
            "cosine": pa.array(np.round(cos[hit], 6))})

    out = (attach_pair_payloads(pairs, cand_vecs, id_col, "__payload",
                                n_candidate_ids=n_ids)
           .map_batches(verify, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    return (out.drop_duplicates(subset=["id_a", "id_b"])
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def semdedup(ds: "rd.Dataset", centroids: np.ndarray,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding") -> "rd.Dataset":
    """SemDeDup [Abbas et al. 2023, arXiv:2303.09540 — public method]:
    semantic deduplication = cluster the embeddings, then inside each
    cluster drop the members of cosine-similar pairs above a threshold.

    This implementation uses the engine's DETERMINISTIC fixed-row coarse
    centers (``fixed_centroids`` — the SQL-expressible quantizer that
    carries the IVF hard oracles; k-means-quality centers via
    ``train_centroids`` are the recall path) and a min-id keep rule:
    a vector is dropped iff a SMALLER-id member of its cluster is
    cosine-similar at >= threshold.  (The paper keeps the item with the
    lowest similarity to the centroid; any deterministic single-
    representative rule preserves the method's shape.)

    Distribution shape: assignment is one broadcast matmul per Arrow
    batch; the within-cluster pass is a ``groupby(cell).map_groups``
    with an O(c^2) per-cluster similarity matmul — SemDeDup runs
    k ~ sqrt(n) clusters, so per-cluster cost stays bounded; at 100 TB
    the groupby is the one (cell-keyed) shuffle.

    Returns a Dataset of (id_col, cell, keep) — keep=0 rows are the
    semantic duplicates to drop.
    """
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        X = _vecs_from_batch(batch, vec_col)
        cells = _assign_cells(X, cent)
        return pa.table({
            id_col: batch[id_col],
            "cell": pa.array(cells.astype(np.int64), type=pa.int64()),
            vec_col: batch[vec_col],
        })

    def per_cluster(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(id_col).reset_index(drop=True)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        Xn = X / n[:, None]
        S = Xn @ Xn.T
        # dup iff any SMALLER-id row is >= threshold similar
        tri = np.tril(S >= threshold, k=-1)
        dup = tri.any(axis=1)
        return pd.DataFrame({
            id_col: df[id_col],
            "cell": df["cell"],
            "keep": (~dup).astype(np.int64),
        })

    return (ds.select_columns([id_col, vec_col])
              .map_batches(assign, batch_format="pyarrow")
              .groupby("cell")
              .map_groups(per_cluster, batch_format="pandas"))
