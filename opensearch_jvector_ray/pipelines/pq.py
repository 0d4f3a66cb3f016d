"""Product-quantization lifecycle: train -> encode -> approx+rerank query
-> refine-on-merge.

The vector-side analog of the BM25 two-pass rescore already shipped, and
of the reference's PQ lifecycle: codebook trained once per index on
bounded data (`JVectorWriter.java:381-414` trains PQ on flush from the
segment's vectors), merges REFINE the existing codebook instead of
retraining (`JVectorWriter.java:886-913`), and queries run a
PQ-approximate first pass with an exact rerank of the oversampled
candidate set (`JVectorReader.java:154-166`).

Ray-Data shapes:
  - training: bounded sample -> ONE remote task -> per-subspace k-means
    (trainer memory independent of corpus size), codebook broadcast via
    ``ray.put``;
  - encoding: stateless vectorized map_batches (no shuffle);
  - query: one map_batches pass per batch does BOTH phases — ADC
    lookup-table scoring over the codes, then EXACT metric scoring of the
    batch's top-(k*oversample) survivors only (their float vectors are in
    the same batch: no second read) -> bounded partials -> driver merge.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from opensearch_jvector_ray.functions import scoring
from opensearch_jvector_ray.pipelines.knn import (
    METRICS, _argmin_cells_mm, _cell_sums, _partial_topk, _rounder,
    _vecs_from_batch,
)

CODEBOOK_NAME = "_pq_codebook.npy"


def derive_pq_subspaces(dim: int, target: int = 8) -> int:
    """Derived PQ parameter: the largest subspace count <= ``target`` that
    divides ``dim`` (the `JVectorFormat` ships a default-subspaces-per-
    vector derivation fn the same way, `JVectorFormat.java:22-196`)."""
    for m in range(min(target, dim), 0, -1):
        if dim % m == 0:
            return m
    return 1


def default_oversample(dim: int) -> float:
    """Dimension-based default rescore oversample — the reference's rule
    verbatim (`RescoreContext.java:28-36`): 1x for dim >= 1000 (rerank
    gains little), 2x for 768 <= dim < 1000, 3x below 768 (aggressive
    compression needs a wider exact-rerank net)."""
    if dim >= 1000:
        return 1.0
    if dim >= 768:
        return 2.0
    return 3.0


def first_pass_k(k: int, oversample: float | None, dim: int,
                 m_subspaces: int | None = None) -> int:
    """Candidates surviving the approximate first pass: k' =
    min(10000, max(floor, ceil(k * oversample))) — the reference's
    firstPassK clamp (`RescoreContext.java:17-97`) with a
    COMPRESSION-AWARE floor.

    The reference's flat floor of 100 assumes light compression; at
    32x PQ (128-d float32 -> 16 uint8 codes) the ADC ordering is noisy
    enough that the floor is the binding constraint at small k.
    Measured on the 100k IID-gaussian worst case (50% cells probed,
    where float IVF recalls 0.87): k'=100 -> recall 0.56, k'=300 ->
    0.73, k'=400 -> ~0.75, k'=500 -> 0.78, all at or below ~2/3 of
    brute-force query cost (the rerank reads k' vectors; the scan cost
    is the codes, unchanged).  Floor rule: 100 x max(1, ratio // 8)
    where ratio = 4*dim/m is the bytes compression — light compression
    (ratio <= 8) keeps the reference's exact floor.

    ``oversample=None`` means not-user-provided -> the dimension rule,
    and the 10000 cap applies (bounds the DEFAULT rerank).  An EXPLICIT
    oversample is trusted uncapped — deliberate deviation from the
    reference, which clamps user values too: the repo's
    degenerate-exact contract (full probe + oversample covering the
    corpus == brute force, the driver-gate identity) requires that an
    explicit full-corpus oversample really scan the corpus."""
    floor = 100
    if m_subspaces:
        ratio = 4 * dim // m_subspaces
        floor = 100 * max(1, ratio // 8)
    if oversample is None:
        oversample = default_oversample(dim)
        return max(k, min(10_000,
                          max(floor, int(np.ceil(k * oversample)))))
    return max(k, floor, int(np.ceil(k * oversample)))


def _kmeans_subspaces(X: np.ndarray, m_subspaces: int, n_codes: int,
                      iters: int = 10, seed: int = 42) -> np.ndarray:
    """Per-subspace k-means codebook (m_subspaces, k, d/m) over rows X.
    The single-task trainer core, also called locally by the graph
    engine's per-partition quantizer."""
    d = X.shape[1]
    if d % m_subspaces != 0:
        raise ValueError(f"dim {d} not divisible by m={m_subspaces}")
    dsub = d // m_subspaces
    if len(X) == 0:
        raise ValueError("cannot train a PQ codebook on an empty dataset "
                         "(no vectors reached the trainer sample)")
    rng = np.random.default_rng(seed)
    k = min(n_codes, len(X))
    book = np.zeros((m_subspaces, k, dsub), dtype=np.float64)
    for m in range(m_subspaces):
        Xm = np.ascontiguousarray(X[:, m * dsub:(m + 1) * dsub])
        cent = Xm[rng.choice(len(Xm), size=k, replace=False)].astype(
            np.float64).copy()
        for _ in range(iters):
            assign = _argmin_cells_mm(Xm, cent)
            sums = _cell_sums(Xm, assign, k)
            counts = np.bincount(assign, minlength=k)
            nz = counts > 0
            cent[nz] = sums[nz] / counts[nz, None]
        book[m] = cent
    return book


def train_pq_codebook(ds: "rd.Dataset", *, m_subspaces: int = 8,
                      n_codes: int = 16, vec_col: str = "embedding",
                      sample_size: int = 65536, iters: int = 10,
                      seed: int = 42) -> np.ndarray:
    """Codebook (m_subspaces, n_codes, d/m) from per-subspace k-means on a
    BOUNDED distributed sample (same shape as knn.train_centroids)."""
    if n_codes > 256:
        raise ValueError(f"n_codes={n_codes} > 256: PQ codes are stored as "
                         f"uint8; larger codebooks would silently wrap")
    n_rows = ds.count() or 1
    frac = min(1.0, 1.5 * sample_size / n_rows)
    sample = ds.select_columns([vec_col])
    if frac < 1.0:
        sample = sample.random_sample(frac, seed=seed)
    refs = sample.limit(sample_size).to_arrow_refs()

    @ray.remote
    def _train(*blocks) -> np.ndarray:
        mats = [_vecs_from_batch(b, vec_col) for b in blocks if b.num_rows]
        X = (np.concatenate(mats) if mats
             else np.zeros((0, m_subspaces)))   # clean empty-data error
        return _kmeans_subspaces(X, m_subspaces, n_codes, iters=iters,
                                 seed=seed)

    return ray.get(_train.remote(*refs))


def _train_ivfpq(ds: "rd.Dataset", *, n_centroids: int, m_subspaces: int,
                 n_codes: int, vec_col: str, sample_size: int = 65536,
                 iters: int = 10, seed: int = 42,
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Both IVF-PQ quantizers (coarse centroids + PQ codebook) from ONE
    bounded distributed sample and ONE remote task — output-identical to
    calling ``train_centroids`` then ``train_pq_codebook`` with the same
    seed (same sample, same k-means inits), at half the pipeline runs."""
    from opensearch_jvector_ray.pipelines.knn import _kmeans_rows
    if n_codes > 256:
        raise ValueError(f"n_codes={n_codes} > 256: PQ codes are stored as "
                         f"uint8; larger codebooks would silently wrap")
    n_rows = ds.count() or 1
    frac = min(1.0, 1.5 * sample_size / n_rows)
    sample = ds.select_columns([vec_col])
    if frac < 1.0:
        sample = sample.random_sample(frac, seed=seed)
    refs = sample.limit(sample_size).to_arrow_refs()

    @ray.remote
    def _train(*blocks) -> tuple[np.ndarray, np.ndarray]:
        mats = [_vecs_from_batch(b, vec_col) for b in blocks if b.num_rows]
        X = (np.concatenate(mats) if mats
             else np.zeros((0, m_subspaces)))   # clean empty-data error
        return (_kmeans_rows(X, n_centroids, iters=iters, seed=seed),
                _kmeans_subspaces(X, m_subspaces, n_codes, iters=iters,
                                  seed=seed))

    return ray.get(_train.remote(*refs))


def refine_codebook(book: np.ndarray, X: np.ndarray,
                    iters: int = 2, sample: int = 65536,
                    seed: int = 42) -> np.ndarray:
    """REFINE an existing codebook against new data: a few Lloyd
    iterations per subspace SEEDED from the current centroids — the
    reference's quantization-refinement-during-merge ('more accurate
    quantization and better recall without the penalty of full codebook
    recomputation', `README.md:30`; `JVectorWriter.java:886-913`).
    iters=0 returns the book unchanged; empty sub-cells keep their old
    centroid (never re-randomized, so refinement is monotone-stable)."""
    m, k, dsub = book.shape
    if iters <= 0 or len(X) == 0:
        return book.copy()
    if len(X) > sample:
        rng = np.random.default_rng(seed)
        X = X[np.sort(rng.choice(len(X), size=sample, replace=False))]
    out = book.astype(np.float64).copy()
    for mi in range(m):
        Xm = np.ascontiguousarray(X[:, mi * dsub:(mi + 1) * dsub])
        cent = out[mi]
        for _ in range(iters):
            assign = _argmin_cells_mm(Xm, cent)
            sums = _cell_sums(Xm, assign, k)
            counts = np.bincount(assign, minlength=k)
            nz = counts > 0
            cent[nz] = sums[nz] / counts[nz, None]
        out[mi] = cent
    return out


def pq_encode(vecs: np.ndarray, book: np.ndarray) -> np.ndarray:
    """(n, M) uint8 codes: nearest sub-centroid per subspace (ties to the
    lowest code, argmin rule)."""
    m, k, dsub = book.shape
    if k > 256:
        raise ValueError(f"codebook has {k} codes > 256: uint8 code storage "
                         f"would wrap argmin indices")
    codes = np.empty((len(vecs), m), dtype=np.uint8)
    for mi in range(m):
        codes[:, mi] = _argmin_cells_mm(
            np.ascontiguousarray(vecs[:, mi * dsub:(mi + 1) * dsub]),
            book[mi]).astype(np.uint8)
    return codes


def build_pq_index(ds: "rd.Dataset", index_dir: str, *,
                   m_subspaces: int = 8, n_codes: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   codebook: np.ndarray | None = None,
                   part: int = 0) -> np.ndarray:
    """Persist codes + vectors, partitioned for resumable writes.

    One parquet directory per ``part`` (an incoming segment of vectors);
    ``refine_pq_index`` appends further parts WITHOUT retraining — the
    reference's merge rule (reuse the already-trained quantizer,
    `JVectorWriter.java:886-913`)."""
    os.makedirs(index_dir, exist_ok=True)
    book_path = os.path.join(index_dir, CODEBOOK_NAME)
    if codebook is None:
        if os.path.exists(book_path):
            codebook = np.load(book_path)     # refine: NEVER retrain
        else:
            codebook = train_pq_codebook(ds, m_subspaces=m_subspaces,
                                         n_codes=n_codes, vec_col=vec_col)
    book_ref = ray.put(codebook)

    def encode(batch: pa.Table) -> pa.Table:
        book = ray.get(book_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        codes = pq_encode(vecs, book)
        return pa.table({
            id_col: batch[id_col],
            vec_col: batch[vec_col],
            "codes": pa.array([c.tobytes() for c in codes],
                              type=pa.binary()),
        })

    out_dir = os.path.join(index_dir, f"part={part}")
    (ds.map_batches(encode, batch_format="pyarrow").write_parquet(out_dir))
    if not os.path.exists(book_path):
        np.save(book_path, codebook)
    return codebook


def refine_pq_index(new_ds: "rd.Dataset", index_dir: str, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    ) -> int:
    """Merge-refine: encode NEW vectors with the EXISTING codebook and
    append them as the next part.  Returns the new part id."""
    parts = [int(d.split("=")[1]) for d in os.listdir(index_dir)
             if d.startswith("part=")]
    nxt = (max(parts) + 1) if parts else 0
    book = np.load(os.path.join(index_dir, CODEBOOK_NAME))
    build_pq_index(new_ds, index_dir, id_col=id_col, vec_col=vec_col,
                   codebook=book, part=nxt)
    return nxt


def _adc_lut(book: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    """(M, K) lookup table of per-subspace partial contributions for one
    query: dot products for cosine/innerproduct, squared distances for l2
    (asymmetric distance computation)."""
    m, k, dsub = book.shape
    lut = np.empty((m, k), dtype=np.float64)
    for mi in range(m):
        qm = q[mi * dsub:(mi + 1) * dsub]
        if metric == "l2":
            diff = book[mi] - qm[None, :]
            lut[mi] = np.einsum("ij,ij->i", diff, diff)
        else:                      # cosine / innerproduct: partial dots
            lut[mi] = book[mi] @ qm
    return lut


def pq_rerank_topk(source: "rd.Dataset | str",
                   queries: dict[str, np.ndarray], k: int, *,
                   oversample: float | None = None,
                   metric: str = "cosine",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   codebook: np.ndarray | None = None,
                   round_decimals: int | None = None) -> pd.DataFrame:
    """Two-phase PQ search: ADC-approximate first pass prunes each batch to
    k' = first_pass_k(k, oversample, dim) candidates (the reference's
    min(10000, max(100, ceil(k*oversample))) clamp with the
    dimension-based default when ``oversample`` is None), exact metric
    scores ONLY those (vectors are co-resident in the batch), driver
    merges exact partials.

    ``source`` is a built index dir (reads codes; skips re-encoding) or a
    raw Dataset (codes computed on the fly from ``codebook``)."""
    if isinstance(source, str):
        import glob as globmod
        book = np.load(os.path.join(source, CODEBOOK_NAME))
        files = sorted(f for d in os.listdir(source) if d.startswith("part=")
                       for f in globmod.glob(os.path.join(source, d,
                                                          "*.parquet")))
        ds = rd.read_parquet(files)
        have_codes = True
    else:
        ds = source
        book = codebook
        if book is None:
            raise ValueError("raw-Dataset source needs an explicit codebook")
        have_codes = False

    kernel, translate, _ = METRICS[metric]
    rnd = _rounder(round_decimals)
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    luts = np.stack([_adc_lut(book, qmat[i], metric)
                     for i in range(len(qids))])
    payload_ref = ray.put((book, qmat, luts))
    k_prime = first_pass_k(k, oversample,
                           book.shape[0] * book.shape[2],
                           book.shape[0])
    approx_best = metric != "l2"        # l2 LUT is a distance: lower=better

    def score_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # id type mirrors the input column (string ids included)
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "score": pa.array([], type=pa.float64())})
        book_, qm, luts_ = ray.get(payload_ref)
        vecs = _vecs_from_batch(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if have_codes:
            raw = b"".join(batch["codes"].to_pylist())
            codes = np.frombuffer(raw, dtype=np.uint8).reshape(len(ids), -1)
        else:
            codes = pq_encode(vecs, book_)
        m = codes.shape[1]
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            approx = luts_[qi][np.arange(m)[None, :], codes].sum(axis=1)
            if not approx_best:
                approx = -approx
            n_keep = min(k_prime, len(ids))
            cand = np.argpartition(-approx, n_keep - 1)[:n_keep] \
                if len(ids) > n_keep else np.arange(len(ids))
            exact = rnd(translate(kernel(vecs[cand], qm[qi])))
            sel_ids, sel_sc = _partial_topk(ids[cand], exact, k)
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

# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells prune the READ, PQ codes prune the BYTES
# ---------------------------------------------------------------------------

IVFPQ_CENTROIDS = "_centroids.npy"


def build_ivfpq_index(ds: "rd.Dataset", index_dir: str, *,
                      n_centroids: int | None = 16, m_subspaces: int = 8,
                      n_codes: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding", sample_size: int = 65536,
                      seed: int = 42,
                      centroids: np.ndarray | None = None,
                      codebook: np.ndarray | None = None) -> None:
    """Persist an IVF-PQ index: ``cell=K/`` parquet dirs carrying
    (id, vector, pq-codes) rows.

    The combined scale path for similarity search — the composition of
    the coarse-cell routing of ``build_ivf_index`` with the quantized
    first pass of the reference's PQ lifecycle
    (`JVectorWriter.java:381-414`, `JVectorReader.java:154-166`): at
    query time only the probed cell DIRECTORIES are listed (prune at the
    read) and the first pass reads ONLY the (id, codes) columns — the
    fat float vector column never leaves storage except for the final
    exact rerank of the candidate ids.

    One GLOBAL codebook over raw vectors (not per-cell residuals): the
    rerank is always exact full-precision, so the codebook only shapes
    candidate ORDER — and a global book lets every cell share one
    broadcast LUT per query.  Both quantizers train on bounded
    distributed samples; both are saved beside the cells, and incoming
    merges would refine (re-encode), never retrain.
    """
    from opensearch_jvector_ray.pipelines.knn import (
        _assign_cells, train_centroids,
    )
    os.makedirs(index_dir, exist_ok=True)
    if n_centroids is None:          # sqrt(n): the standard IVF sizing
        n_centroids = max(8, int((ds.count() or 1) ** 0.5))
    if centroids is None and codebook is None:
        # FUSED trainer: one bounded sample fetch, one remote task doing
        # BOTH k-means — identical outputs to the two separate trainers
        # (same seed -> same sample -> same inits), one less full
        # Dataset execution (pytest-asserted identity)
        centroids, codebook = _train_ivfpq(
            ds, n_centroids=n_centroids, m_subspaces=m_subspaces,
            n_codes=n_codes, vec_col=vec_col, sample_size=sample_size,
            seed=seed)
    if centroids is None:
        centroids = train_centroids(ds, n_centroids, vec_col,
                                    sample_size=sample_size, seed=seed)
    if codebook is None:
        codebook = train_pq_codebook(ds, m_subspaces=m_subspaces,
                                     n_codes=n_codes, vec_col=vec_col,
                                     sample_size=sample_size, seed=seed)
    ref = ray.put((centroids, codebook))

    def assign_encode(batch: pa.Table) -> pa.Table:
        cent, book = ray.get(ref)
        vecs = _vecs_from_batch(batch, vec_col)
        cell = _assign_cells(vecs, cent).astype(np.int32)
        codes = pq_encode(vecs, book)
        return pa.table({
            id_col: batch[id_col],
            vec_col: batch[vec_col],
            "codes": pa.array([c.tobytes() for c in codes],
                              type=pa.binary()),
            "cell": pa.array(cell),
        })

    from opensearch_jvector_ray.pipelines.knn import _stage_and_compact_cells
    _stage_and_compact_cells(
        ds.map_batches(assign_encode, batch_format="pyarrow"), index_dir)
    np.save(os.path.join(index_dir, IVFPQ_CENTROIDS), centroids)
    np.save(os.path.join(index_dir, CODEBOOK_NAME), codebook)


def ivfpq_topk(index_dir: str, queries: dict[str, np.ndarray], k: int, *,
               n_probe: int = 4, oversample: float | None = None,
               metric: str = "cosine", id_col: str = "vec_id",
               vec_col: str = "embedding",
               round_decimals: int | None = None,
               filter_ids: np.ndarray | list[int] | None = None,
               ) -> pd.DataFrame:
    """Query an IVF-PQ index: probe -> codes-only ADC pass -> exact rerank.

    ``filter_ids`` is the reference's PRE-FILTER allow-list
    (`KNNQueryBuilder.java:534-539`): rows outside it are dropped in the
    ADC pass, before candidate selection — so every candidate (and hence
    every hit) is allowed, and at the degenerate-exact setting (full
    probe + full oversample) the result equals filtered brute force.

    1. probe the ``n_probe`` nearest cells per query (tie to lower cell,
       same rule as the IVF oracle);
    2. FIRST PASS over the probed cells reading ONLY (id, codes): per
       batch, ADC lookup-sum scores for every probing query, partial
       approx top-k' (k' = first_pass_k(k, oversample, dim) — the
       reference's clamped rescore rule); the driver merges the
       BOUNDED partials to a global approx top-k' candidate set per
       query — approx scores pick candidates, never final ranks;
    3. SECOND PASS reads (id, vector) of the probed cells and
       exact-scores ONLY candidate rows; final ranking is
       (rounded score desc, id asc) — identical tie/round rules to
       ``brute_force_topk``, so full probe + full oversample IS brute
       force (the degenerate-exact driver gate).
    """
    import glob as globmod

    from ray.data.datasource.partitioning import Partitioning

    from opensearch_jvector_ray.pipelines.knn import _probe_cells

    centroids = np.load(os.path.join(index_dir, IVFPQ_CENTROIDS))
    book = np.load(os.path.join(index_dir, CODEBOOK_NAME))
    kernel, translate, _ = METRICS[metric]
    rnd = _rounder(round_decimals)
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    probe = _probe_cells(qmat, centroids, n_probe)
    probe_sets = {qid: set(probe[i].tolist()) for i, qid in enumerate(qids)}
    union_cells = sorted({c for s in probe_sets.values() for c in s})
    paths = sorted(
        f for c in union_cells
        for f in globmod.glob(os.path.join(index_dir, f"cell={c}",
                                           "*.parquet")))
    empty = pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    if not paths:
        return empty
    k_prime = first_pass_k(k, oversample,
                           book.shape[0] * book.shape[2],
                           book.shape[0])
    luts = np.stack([_adc_lut(book, qmat[i], metric)
                     for i in range(len(qids))])
    approx_best = metric != "l2"
    part_scheme = Partitioning("hive", base_dir=index_dir)
    allowed = (np.asarray(filter_ids, dtype=np.int64)
               if filter_ids is not None else None)
    from opensearch_jvector_ray.pipelines.knn import _load_tombstones
    dead = _load_tombstones(index_dir, id_col)
    pass1_ref = ray.put((luts, probe_sets, allowed, dead))

    def adc_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        luts_, probes, allow, dead_ids = ray.get(pass1_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:                # reshape(0, -1) raises
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "approx": pa.array([], type=pa.float64())})
        raw = b"".join(batch["codes"].to_pylist())
        codes = np.frombuffer(raw, dtype=np.uint8).reshape(len(ids), -1)
        cells = pc.cast(batch["cell"], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = None
        if dead_ids is not None:
            keep = ~np.isin(ids, dead_ids)
        if allow is not None:
            amask = np.isin(ids, allow)
            keep = amask if keep is None else (keep & amask)
        if keep is not None:
            ids, codes, cells = ids[keep], codes[keep], cells[keep]
        m = codes.shape[1]
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cells, list(probes[qid]))
            if not mask.any():
                continue
            approx = luts_[qi][np.arange(m)[None, :],
                               codes[mask]].sum(axis=1)
            if not approx_best:
                approx = -approx
            sel_ids, sel_sc = _partial_topk(ids[mask], approx, k_prime)
            out_q.extend([qid] * len(sel_ids))
            out_id.append(sel_ids)
            out_s.append(sel_sc)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "approx": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "approx": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    cands = (rd.read_parquet(paths, partitioning=part_scheme,
                             columns=[id_col, "codes", "cell"])
             .map_batches(adc_batch, batch_format="pyarrow",
                          batch_size=8192)
             .to_pandas())
    if cands.empty:
        return empty
    # global approx top-k' per query (candidate SELECTION only); ties on
    # approx scores break by id asc for determinism
    cands = (cands.sort_values(["query_id", "approx", id_col],
                               ascending=[True, False, True],
                               kind="mergesort")
             .groupby("query_id", sort=False).head(k_prime))
    cand_ids = {qid: np.sort(g[id_col].to_numpy())
                for qid, g in cands.groupby("query_id", sort=False)}
    union_ids = np.unique(cands[id_col].to_numpy())
    pass2_ref = ray.put((qmat, cand_ids, union_ids))

    def exact_batch(batch: pa.Table) -> pa.Table:
        qm, cand, union = ray.get(pass2_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, union)
        if not keep.any():
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "score": pa.array([], type=pa.float64())})
        batch = batch.filter(pa.array(keep))
        ids = ids[keep]
        vecs = _vecs_from_batch(batch, vec_col)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            cq = cand.get(qid)
            if cq is None:
                continue
            mask = np.isin(ids, cq)
            if not mask.any():
                continue
            exact = rnd(translate(kernel(vecs[mask], qm[qi])))
            sel_ids, sel_sc = _partial_topk(ids[mask], exact, k)
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

    parts = (rd.read_parquet(paths, partitioning=part_scheme,
                             columns=[id_col, vec_col])
             .map_batches(exact_batch, batch_format="pyarrow",
                          batch_size=8192)
             .to_pandas())
    if parts.empty:
        return empty
    out = (parts.sort_values(["query_id", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF-PQ update lifecycle (refine-not-retrain, the merge rule)
# ---------------------------------------------------------------------------

def add_to_ivfpq_index(new_ds: "rd.Dataset", index_dir: str, *,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> None:
    """Incremental add: NEW vectors are assigned with the EXISTING coarse
    centroids and encoded with the EXISTING codebook (refine-never-
    retrain — `JVectorWriter.java:886-913`), appended as new files into
    the cell dirs.  No existing data is rewritten; ``compact_ivfpq_index``
    re-packs fragmented cells."""
    centroids = np.load(os.path.join(index_dir, IVFPQ_CENTROIDS))
    book = np.load(os.path.join(index_dir, CODEBOOK_NAME))
    from opensearch_jvector_ray.pipelines.knn import _assign_cells
    ref = ray.put((centroids, book))

    def assign_encode(batch: pa.Table) -> pa.Table:
        cent, bk = ray.get(ref)
        vecs = _vecs_from_batch(batch, vec_col)
        cell = _assign_cells(vecs, cent).astype(np.int32)
        codes = pq_encode(vecs, bk)
        return pa.table({
            id_col: batch[id_col],
            vec_col: batch[vec_col],
            "codes": pa.array([c.tobytes() for c in codes],
                              type=pa.binary()),
            "cell": pa.array(cell),
        })

    (new_ds.map_batches(assign_encode, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["cell"]))


def delete_from_ivfpq_index(index_dir: str, vec_ids: list[int],
                            id_col: str = "vec_id") -> None:
    """Tombstone deletes (the IVF rule — same sidecar file, masked in
    the ADC pass, physically dropped by ``compact_ivfpq_index``)."""
    from opensearch_jvector_ray.pipelines.knn import delete_from_ivf_index
    delete_from_ivf_index(index_dir, vec_ids, id_col=id_col)


def compact_ivfpq_index(index_dir: str, dst_dir: str,
                        id_col: str = "vec_id") -> None:
    """Rewrite cells dropping tombstoned rows; quantizers carry over
    unchanged (refine-not-retrain).  Per-cell resumable on the data
    file, like ``compact_ivf_index``."""
    from opensearch_jvector_ray.pipelines.knn import compact_ivf_index
    # IVFPQ_CENTROIDS shares the IVF sidecar name, so the base compaction
    # already carries the coarse quantizer; only the codebook is extra
    compact_ivf_index(index_dir, dst_dir, id_col=id_col)
    np.save(os.path.join(dst_dir, CODEBOOK_NAME),
            np.load(os.path.join(index_dir, CODEBOOK_NAME)))
