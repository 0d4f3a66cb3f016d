"""Graph ANN index: per-partition best-first-search graphs (the engine
family of the reference — jVector is a DiskANN-style graph,
`JVectorWriter.writeGraph` `/root/reference/src/main/java/org/opensearch/
knn/index/codec/jvector/JVectorWriter.java:311-379`; search
`JVectorReader.search` `JVectorReader.java:131-212`; query type
`JVectorKnnFloatVectorQuery.java:21`).

Public-knowledge algorithm: a single-layer navigable graph built by
wave-batched insertion with lockstep beam search + degree-capped
bidirectional linking (the NSW/Vamana construction family — Malkov &
Yashunin 2016, Subramanya et al. 2019; the array-based batched beam is
the standard GPU-style formulation).  No reference code involved.

Ray-Data shape (mirrors the BM25 substrate):
  - BUILD (T4 per-partition index builder): vectors are hash-bucketed to
    ``num_parts`` partitions with ONE shuffle; each partition builds its
    own graph with WAVE-BATCHED insertion — each wave of new nodes beam-
    searches the frozen prefix graph in numpy lockstep (no per-vector
    Python iteration), then links bidirectionally — and persists
    (vec_id, embedding, neighbors) parquet + a meta record.  Resumable
    (skip parts whose meta exists).
  - QUERY (A1 leaf->global reduce): each partition runs ONE batched beam
    search for all queries from its medoid entry set, emits its local
    top-k, and the driver merges the small k-lists — never a global sort.
  - MERGE: two branches, like the postings side.  ``mode="incremental"``
    (default) mirrors the reference's headline incremental graph merge
    (`JVectorWriter.java:922-941` buildAndMergeNewNodes): pick the
    LARGEST partition in each merge group as the leading graph
    (leading-reader selection, `JVectorWriter.java:640-698`), keep its
    edges (compacted past tombstones — the neighbors-state reuse the
    reference gets from its neighbors-score cache,
    `JVectorWriter.java:277-300`), and bulk-insert only the smaller
    partitions' nodes.  ``mode="rebuild"`` concatenates and rebuilds
    (the delete-heavy branch).

Scores are the Lucene-ordered translations from functions/scoring.py,
rounded before ranking when ``round_decimals`` is set (one tie rule).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from opensearch_jvector_ray.functions import scoring
from opensearch_jvector_ray.pipelines.knn import (
    METRICS, _partial_topk, _rounder, _vecs_from_batch,
)

META_NAME = "_graph_meta.json"
# adaptive wave cap: bound the (wave, n) visited bitmap to ~64M entries
_VISITED_BUDGET = 64 * 1024 * 1024


# ---------------------------------------------------------------------------
# per-partition graph build (numpy; one partition fits one task by design)
# ---------------------------------------------------------------------------

def _unitize(vecs: np.ndarray) -> np.ndarray:
    """float32 unit rows: graph CONSTRUCTION and beam pruning run in f32
    (2x the flops of f64; the graph is approximate by nature) — final
    hit scores are always an exact f64 rescore of the candidates."""
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    return (vecs / norms[:, None]).astype(np.float32)


def _entry_set(n_valid: int,
               n_entries: int | None = None) -> list[int]:
    """Deterministic spread of entry points over [0, n_valid), sized
    ~sqrt(n) (capped 512) by default: on clustered data the beam only
    finds a cluster it was seeded near, so the entry set must grow with
    the number of clusters a partition can hold.  Measured: 24k+3x1.6k
    merged graph recall@10 0.27 with 8 entries -> 0.91 with sqrt-n
    entries, same beam width.  Entry evaluation is one (E, d) matvec —
    noise next to the beam itself."""
    if n_entries is None:
        n_entries = max(8, min(512, int(n_valid ** 0.5)))
    if n_valid <= n_entries:
        return list(range(n_valid))
    stride = n_valid / n_entries
    return sorted({int(j * stride) for j in range(n_entries)})


def _beam_batch(unit: np.ndarray, nbrs: np.ndarray,
                entries: list[int], Q: np.ndarray, ef: int,
                n_valid: int | None = None,
                lut: np.ndarray | None = None,
                codes: np.ndarray | None = None,
                affine: tuple | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Lockstep beam search for B queries at once over the frozen graph.

    Array-based DiskANN-style search: each query keeps a pool of its
    ``ef`` best candidates; every numpy iteration expands the closest
    unexpanded pool entry of EVERY active query simultaneously (neighbor
    gather + one batched einsum + one per-row merge sort) — the loop runs
    O(ef) times total, never once per vector.

    When ``lut``/``codes`` are given, traversal distances come from PQ
    asymmetric lookup sums instead of float dots (the quantized search
    mode of `JVectorReader.search`, `JVectorReader.java:154-166`):
    ``lut`` is (B, M*K) per-query negated partial dots, ``codes`` is the
    (n, M) uint8 code matrix — a node's distance is M table gathers, no
    vector memory is touched during the walk.  Exhaustiveness under full
    beam is unchanged (pool ORDER is approximate, coverage is not).

    Returns (dists (B, ef) ascending, nodes (B, ef)); pads with
    (inf, -1).  With ``ef`` >= reachable-set size the search is
    exhaustive over the connected component (the full-beam == exact
    degenerate case the tests and oracles rely on).
    """
    B = len(Q)
    n = len(unit) if n_valid is None else n_valid
    ef = max(1, ef)
    ent = np.array(sorted({e for e in entries if 0 <= e < n}),
                   dtype=np.int64)
    if len(ent) == 0 or B == 0:
        return (np.full((B, ef), np.inf),
                np.full((B, ef), -1, dtype=np.int64))
    Q = np.asarray(Q, dtype=np.float32)
    pq_off = None
    if lut is not None:
        M = codes.shape[1]
        pq_off = np.arange(M, dtype=np.int64) * (lut.shape[1] // M)
    a_ = b_ = qneg = nvq_lev = None
    if affine is not None:                              # NVQ mode
        a_, b_, qneg, nvq_lev = affine
    quantized = lut is not None or nvq_lev is not None
    # bandwidth-aware: below the matmul threshold, ALL query->node dots
    # are one BLAS (B, n) matmul up front and the beam only gathers
    # floats — the per-iteration (A, m, d) row gather + einsum is what
    # dominates on this memory-throttled sandbox
    d_all = None
    if not quantized and len(unit) * B <= _FULL_MM_MAX_N * 64:
        d_all = -(Q @ unit.T)                           # (B, n)
    if lut is not None:
        idx0 = codes[ent].astype(np.int64) + pq_off     # (E, M)
        d0 = lut[:, idx0].sum(axis=2)                   # (B, E)
    elif nvq_lev is not None:
        deq = nvq_lev[codes[ent]]                       # (E, d) float32
        d0 = -(deq @ Q.T).T                             # (B, E)
        d0 = d0 * a_[ent][None, :] + b_[ent][None, :] * qneg[:, None]
    else:
        d0 = -(unit[ent] @ Q.T).T                       # (B, E)
    order = np.argsort(d0, axis=1, kind="stable")
    e0 = min(len(ent), ef)
    pool_d = np.full((B, ef), np.inf)
    pool_v = np.full((B, ef), -1, dtype=np.int64)
    pool_x = np.ones((B, ef), dtype=bool)               # padding = expanded
    pool_d[:, :e0] = np.take_along_axis(d0, order, 1)[:, :e0]
    pool_v[:, :e0] = ent[order[:, :e0]]
    pool_x[:, :e0] = False
    visited = np.zeros((B, len(unit)), dtype=bool)
    visited[:, ent] = True

    rows = np.arange(B)
    while True:
        masked = np.where(pool_x, np.inf, pool_d)       # (B, ef)
        sel = masked.argmin(axis=1)
        sel_d = masked[rows, sel]
        act = np.flatnonzero(np.isfinite(sel_d))
        if len(act) == 0:
            break
        u = pool_v[act, sel[act]]                       # (A,)
        pool_x[act, sel[act]] = True
        neigh = nbrs[u].astype(np.int64)                # (A, m)
        valid = neigh >= 0
        if n_valid is not None:
            valid &= neigh < n_valid
        neigh_c = np.where(valid, neigh, 0)
        valid &= ~visited[act[:, None], neigh_c]
        if not valid.any():
            continue
        r, c = np.nonzero(valid)
        visited[act[r], neigh[r, c]] = True
        if lut is not None:
            idxn = codes[neigh_c].astype(np.int64) + pq_off   # (A, m, M)
            dn = np.take_along_axis(lut[act][:, None, :], idxn,
                                    axis=2).sum(axis=2)
        elif nvq_lev is not None:
            deq = nvq_lev[codes[neigh_c]]               # (A, m, d)
            dn = -np.einsum("amd,ad->am", deq, Q[act])
            dn = dn * a_[neigh_c] + b_[neigh_c] * qneg[act][:, None]
        elif d_all is not None:
            dn = np.take_along_axis(d_all[act], neigh_c, axis=1)
        else:
            dn = -np.einsum("amd,ad->am", unit[neigh_c], Q[act])
        dn = np.where(valid, dn, np.inf)
        md = np.concatenate([pool_d[act], dn], axis=1)
        mv = np.concatenate([pool_v[act],
                             np.where(valid, neigh, -1)], axis=1)
        mx = np.concatenate([pool_x[act],
                             np.ones_like(dn, dtype=bool)], axis=1)
        mx[:, ef:] = ~valid                             # new = unexpanded
        ord_ = np.argsort(md, axis=1, kind="stable")[:, :ef]
        pool_d[act] = np.take_along_axis(md, ord_, 1)
        pool_v[act] = np.take_along_axis(mv, ord_, 1)
        pool_x[act] = np.take_along_axis(mx, ord_, 1)
    return pool_d, pool_v


def _diverse_select_batch(d: np.ndarray, cc: np.ndarray, valid: np.ndarray,
                          m: int, alpha: float = 1.0
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Batched HNSW select-neighbors heuristic (Malkov & Yashunin 2016,
    Alg. 4; Vamana's robust prune is the same shape), run LOCKSTEP over R
    candidate lists: walk candidates ascending by distance to the node,
    skip any candidate closer to an already-kept neighbor than to the
    node (dominated — a kept edge already routes there), then backfill
    skipped nearest to reach degree m.  Diversity keeps inter-cluster
    edges alive that plain farthest-eviction would drop, which is what
    keeps the graph CONNECTED on clustered data.

    d: (R, C) candidate->node distances; cc: (R, C, C) candidate pairwise
    distances; valid: (R, C).  Returns (kept_cols (R, m) padded -1 — kept
    entries first in distance order, then backfill — and counts (R,)).
    The loop runs C times over vectorized rows, never once per list.

    ``alpha`` > 1 is Vamana's robust-prune relaxation (Subramanya et al.
    2019): a candidate is dominated only when alpha * d(c, kept) <
    d(c, node) on TRUE angular distance (1 - dot), so longer-range edges
    survive and navigability improves on unstructured data.  Inputs stay
    neg-dot; the +1 shift to [0, 2] happens here.
    """
    R, C = d.shape
    if alpha != 1.0:
        d = d + 1.0
        cc = cc + 1.0
        cc = cc * alpha
    dmask = np.where(valid, d, np.inf)
    order = np.argsort(dmask, axis=1, kind="stable")
    dominated = ~valid
    kept = np.zeros((R, C), dtype=bool)
    kcount = np.zeros(R, dtype=np.int64)
    rows = np.arange(R)
    for p in range(C):
        col = order[:, p]
        take = valid[rows, col] & ~dominated[rows, col] & (kcount < m)
        kept[rows, col] |= take
        kcount += take
        if take.any():
            # keeping col dominates every c with d(c, col) < d(c, node)
            sl = cc[rows, :, col]                       # (R, C)
            dominated |= take[:, None] & (sl < dmask)
    # backfill skipped-nearest to reach m: order by (kept-first, distance)
    rank = np.empty_like(order)
    np.put_along_axis(rank, order, np.arange(C)[None, :].repeat(R, 0), 1)
    key = rank + np.where(kept, 0, C) + np.where(valid, 0, 4 * C)
    sel = np.argsort(key, axis=1, kind="stable")[:, :m]
    sel_ok = np.take_along_axis(key, sel, 1) < 4 * C
    counts = sel_ok.sum(axis=1)
    return np.where(sel_ok, sel, -1), counts


def _pairwise_cc(unit: np.ndarray, cand: np.ndarray,
                 cvecs: np.ndarray | None = None) -> np.ndarray:
    """(R, C, C) neg-dot distances between candidates (cand must be
    index-safe; invalid slots masked by the caller's ``valid``).
    ``cvecs`` reuses a gather the caller already paid for."""
    if cvecs is None:
        cvecs = unit[cand]
    return -np.einsum("rcd,red->rce", cvecs, cvecs)


def _forward_select(unit: np.ndarray, D: np.ndarray, V: np.ndarray,
                    m_degree: int, alpha: float = 1.0
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Forward half of wave linking, PURE (no graph mutation): diverse-
    select each wave node's forward neighbors from its beam pool.
    Row-independent, so wave slices computed in parallel tasks
    concatenate to exactly the single-call result.  Returns
    (tgts (W, m) int64 padded -1, dsel (W, m) float, counts (W,))."""
    W = len(D)
    # cap the selection pool (sorted ascending already): 2m candidates is
    # the standard working set for the heuristic, 4x cheaper than full ef
    C_sel = min(D.shape[1], max(2 * m_degree, 32))
    D, V = D[:, :C_sel], V[:, :C_sel]
    valid = np.isfinite(D) & (V >= 0)
    if not valid.any():
        return (np.full((W, m_degree), -1, dtype=np.int64),
                np.zeros((W, m_degree)), np.zeros(W, dtype=np.int64))
    Vc = np.where(valid, V, 0)
    cc = _pairwise_cc(unit, Vc)
    kept_cols, counts = _diverse_select_batch(
        np.where(valid, D, np.inf), cc, valid, m_degree, alpha)
    kmask = kept_cols >= 0
    safe = np.where(kmask, kept_cols, 0)
    tgts = np.where(kmask, np.take_along_axis(V, safe, 1), -1)
    dsel = np.take_along_axis(D, safe, 1)
    if tgts.shape[1] < m_degree:            # tiny-ef pad to a fixed width
        pad = m_degree - tgts.shape[1]
        tgts = np.pad(tgts, ((0, 0), (0, pad)), constant_values=-1)
        dsel = np.pad(dsel, ((0, 0), (0, pad)))
    return tgts, dsel, counts


def _link_wave(unit: np.ndarray, nbrs: np.ndarray, n_nbrs: np.ndarray,
               wave_idx: np.ndarray, D: np.ndarray, V: np.ndarray,
               m_degree: int, alpha: float = 1.0) -> None:
    """Link a whole wave in batch: diverse-select each node's forward
    neighbors from its beam pool, fill them directly (wave nodes are
    new), then reciprocate grouped by target with the same heuristic."""
    tgts, dsel, counts = _forward_select(unit, D, V, m_degree, alpha)
    _apply_wave_links(unit, nbrs, n_nbrs, wave_idx, tgts, dsel, counts,
                      m_degree, alpha)


def _apply_wave_links(unit: np.ndarray, nbrs: np.ndarray,
                      n_nbrs: np.ndarray, wave_idx: np.ndarray,
                      tgts: np.ndarray, dsel: np.ndarray,
                      counts: np.ndarray, m_degree: int,
                      alpha: float = 1.0, reselect_exec=None) -> None:
    """Scatter a wave's forward selections into the graph, then
    reciprocate grouped by target (``reselect_exec`` fans the overflow
    re-selection chunks out as Ray tasks; None = inline)."""
    nbrs[wave_idx, : tgts.shape[1]] = tgts.astype(np.int32)
    n_nbrs[wave_idx] = counts.astype(np.int32)
    e_r, e_c = np.nonzero(tgts >= 0)
    _reciprocal_link_batch(unit, nbrs, n_nbrs,
                           tgt=tgts[e_r, e_c].astype(np.int64),
                           src=wave_idx[e_r].astype(np.int64),
                           dist=dsel[e_r, e_c],
                           m=m_degree, alpha=alpha,
                           reselect_exec=reselect_exec)


_RECIP_CHUNK = 4096


def _reselect_chunk(unit: np.ndarray, cand: np.ndarray,
                    q_idx: np.ndarray, m: int, alpha: float
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Re-select the neighbor sets of overflowing targets q_idx from
    their candidate matrices (existing + incoming edges).  PURE and
    chunk-independent — chunks partition the overflowing targets, so
    fanning chunks out as Ray tasks is exactly the serial computation."""
    valid = cand >= 0
    safe = np.where(valid, cand, 0)
    cvecs = unit[safe]          # ONE gather shared by d and cc
    d = _cand_neg_dots(unit, q_idx, safe, valid, cvecs=cvecs)
    cc = _pairwise_cc(unit, safe, cvecs=cvecs)
    kept_cols, cnts = _diverse_select_batch(d, cc, valid, m, alpha)
    kmask = kept_cols >= 0
    ksafe = np.where(kmask, kept_cols, 0)
    new_nb = np.where(kmask, np.take_along_axis(cand, ksafe, 1), -1)
    return new_nb.astype(np.int32)[:, :m], cnts.astype(np.int32)


def _reciprocal_link_batch(unit: np.ndarray, nbrs: np.ndarray,
                           n_nbrs: np.ndarray, tgt: np.ndarray,
                           src: np.ndarray, dist: np.ndarray,
                           m: int, alpha: float = 1.0,
                           reselect_exec=None) -> None:
    """Apply back-edges src->tgt grouped by target: append while degree
    allows (one vectorized scatter), else re-select the target's neighbor
    set from {existing + incoming} with the batched heuristic.

    ``reselect_exec(cand, q_idx) -> ObjectRef`` submits an overflow
    chunk's re-selection as a Ray task (resolved at the end with
    ray.get); None runs chunks inline.  Chunks read only rows they
    write, so both paths produce bit-identical graphs."""
    order = np.lexsort((src, dist, tgt))
    tgt, src, dist = tgt[order], src[order], dist[order]
    uniq, starts, counts = np.unique(tgt, return_index=True,
                                     return_counts=True)
    within = np.arange(len(tgt)) - np.repeat(starts, counts)
    keep = within < m                 # >m incoming can never all survive
    tgt, src, within = tgt[keep], src[keep], within[keep]
    uniq, starts, counts = np.unique(tgt, return_index=True,
                                     return_counts=True)
    within = np.arange(len(tgt)) - np.repeat(starts, counts)
    k_exist = n_nbrs[uniq].astype(np.int64)
    fits = (k_exist + counts) <= m
    edge_fits = np.repeat(fits, counts)
    if edge_fits.any():               # fast path: room to append
        pos = np.repeat(k_exist, counts)[edge_fits] + within[edge_fits]
        nbrs[tgt[edge_fits], pos] = src[edge_fits].astype(np.int32)
        n_nbrs[uniq[fits]] = (k_exist + counts)[fits].astype(np.int32)
    ov = np.flatnonzero(~fits)
    if len(ov) == 0:
        return
    urank = np.searchsorted(uniq, tgt)          # edge -> uniq row
    ov_rank = np.full(len(uniq), -1, dtype=np.int64)
    pending = []
    for lo in range(0, len(ov), _RECIP_CHUNK):  # bound (R, C, C) memory
        chunk = ov[lo: lo + _RECIP_CHUNK]
        ov_rank[:] = -1
        ov_rank[chunk] = np.arange(len(chunk))
        er = ov_rank[urank]
        sel = er >= 0
        Cr = m + int(counts[chunk].max())
        cand = np.full((len(chunk), Cr), -1, dtype=np.int64)
        cand[:, :m] = nbrs[uniq[chunk], :m]
        cand[er[sel], m + within[sel]] = src[sel]
        qrows = uniq[chunk]
        if reselect_exec is not None:
            pending.append((qrows, reselect_exec(cand, qrows)))
        else:
            new_nb, cnts = _reselect_chunk(unit, cand, qrows, m, alpha)
            nbrs[qrows, :m] = new_nb
            n_nbrs[qrows] = cnts
    if pending:
        import ray
        for qrows, ref in pending:
            new_nb, cnts = ray.get(ref)
            nbrs[qrows, :m] = new_nb
            n_nbrs[qrows] = cnts


def _wave_search_select(unit: np.ndarray, nbrs: np.ndarray,
                        entries: list[int],
                        lo: int, hi: int, ef: int, n_valid: int,
                        m_degree: int, alpha: float, quant
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One wave slice: beam-search the frozen snapshot for rows
    [lo, hi) and diverse-select their forward neighbors.  PURE — both
    halves are row-independent, so slice results concatenate to exactly
    the single-call result."""
    Q = unit[lo:hi]
    lut = codes = affine = None
    if quant is not None:
        lut, codes, affine = _quant_lut_codes(quant, Q)
    D, V = _beam_batch(unit, nbrs, entries, Q, ef,
                       n_valid=n_valid, lut=lut, codes=codes,
                       affine=affine)
    return _forward_select(unit, D, V, m_degree, alpha)


_wave_search_remote = ray.remote(num_cpus=1)(_wave_search_select)
_reselect_remote = ray.remote(num_cpus=1)(_reselect_chunk)

# minimum rows per distributed wave slice: below this the per-beam-
# iteration numpy fixed costs dominate the slice's useful work
_MIN_SLICE_ROWS = 128
# sweep budget for polish_sweeps="auto" (seeded descent converges in
# fewer sweeps than the from-random build; this is a runaway cap)
_POLISH_MAX_SWEEPS = 8
# adaptive num_parts=None target: keep per-partition builds inside the
# matmul fast path (_FULL_MM_MAX_N)
_PART_TARGET_ROWS = 16384


def bulk_insert(unit: np.ndarray, nbrs: np.ndarray, n_nbrs: np.ndarray,
                start: int, *, m_degree: int, ef_construction: int,
                seed: int = 42, alpha: float = 1.0,
                quant=None, n_tasks: int | None = None,
                wave_cap: int | None = None) -> None:
    """Insert nodes [start, n) into the frozen graph over [0, start) in
    geometrically-growing waves: each wave beam-searches the snapshot in
    ONE numpy lockstep pass, then links.  Shared by build (start = the
    bootstrap clique) and incremental merge (start = the leading graph's
    size — the `buildAndMergeNewNodes` analog).

    ``quant`` — a tagged ("pq", book, codes) / ("bq", codes) tuple —
    switches the wave beams to QUANTIZED construction (the reference's
    'index construction w/ quantized vectors', `README.md:28`):
    traversal distances come from per-wave ADC lookup sums over the
    codes instead of float dots — no vector memory is touched during the
    walk, at slightly approximate edge selection (the link step's
    diversity pass stays full-precision).

    ``n_tasks`` > 1 distributes each wave over that many Ray tasks:
    the graph is FROZEN during a wave's search+select phase and both
    halves are row-independent, so slicing a wave by rows (and the
    overflow re-selection by target chunks) is bit-identical to the
    serial computation — while waves grow ``n_tasks`` x larger (each
    task keeps its own visited bitmap within budget).  This is what
    keeps a single merge group from pinning one CPU while the rest of
    the cluster idles.  ``wave_cap`` overrides the per-task visited-
    budget row cap (tests use it to pin identical wave schedules)."""
    n = len(unit)
    mem_cap = wave_cap or max(32, _VISITED_BUDGET // max(n, 1))
    # explicit wave_cap (tests) pins the wave schedule exactly:
    # quality cap off (waves = mem_cap * t), no slice-size floor
    min_slice = _MIN_SLICE_ROWS if wave_cap is None else 1
    t = max(1, int(n_tasks or 1))
    unit_ref = quant_ref = None
    if t > 1:
        unit_ref = ray.put(unit)
        quant_ref = ray.put(quant)
    built = max(1, start)
    while built < n:
        if t <= 1:
            # wave <= built: every wave node searches a snapshot at
            # least as large as itself (geometric growth, O(log n)
            # waves); mem_cap bounds the visited bitmap
            wave = int(min(built, mem_cap, n - built))
        else:
            # distributed: mem_cap only bounds the per-task SLICE, so
            # the wave is bounded by QUALITY instead — nodes in one
            # wave cannot link to each other (they all search the same
            # frozen snapshot), so a wave is capped at built/8
            # (intra-wave blindness <= ~11% of the graph).  Uncapped
            # mem_cap*t waves measured recall@10 0.578 -> 0.131 on the
            # 100k sweep merge: the last giant wave's nodes compete
            # for back-edge slots and end up nearly unreachable.
            qcap = (mem_cap * t if wave_cap is not None
                    else max(mem_cap, built // 8))
            wave = int(min(built, n - built, qcap))
        idx = np.arange(built, built + wave)
        entries = _entry_set(built)
        if t <= 1 or wave <= max(mem_cap, min_slice):
            tgts, dsel, counts = _wave_search_select(
                unit, nbrs, entries, built, built + wave,
                ef_construction, built, m_degree, alpha, quant)
            reselect_exec = None
        else:
            nbrs_ref = ray.put(nbrs)
            # slices: >= min_slice rows each (beam-iteration fixed
            # costs amortize), <= mem_cap rows (visited budget)
            nslices = max(min(t, -(-wave // min_slice)),
                          -(-wave // mem_cap))
            futs = [
                _wave_search_remote.remote(
                    unit_ref, nbrs_ref, entries,
                    int(s[0]), int(s[-1]) + 1, ef_construction,
                    built, m_degree, alpha, quant_ref)
                for s in np.array_split(idx, nslices) if len(s)]
            parts = ray.get(futs)
            tgts = np.concatenate([p[0] for p in parts])
            dsel = np.concatenate([p[1] for p in parts])
            counts = np.concatenate([p[2] for p in parts])

            def reselect_exec(cand, qrows):
                return _reselect_remote.remote(
                    unit_ref, cand, qrows, m_degree, alpha)
        _apply_wave_links(unit, nbrs, n_nbrs, idx, tgts, dsel, counts,
                          m_degree, alpha, reselect_exec=reselect_exec)
        built += wave


_DESCENT_CHUNK = 512
# below this many rows, candidate distances come from ONE BLAS matmul
# against the whole partition + a (R, C) float gather instead of the
# (R, C, d) row gather + einsum — this sandbox is memory-bandwidth
# throttled (~0.6 GB/s, see BASELINE.md) and the row gather's ~40 MB of
# traffic cost 0.3s per sweep at n=267; the matmul path is ~40x faster
_FULL_MM_MAX_N = 16384


def _cand_neg_dots(unit: np.ndarray, q_idx: np.ndarray,
                   cand_safe: np.ndarray, valid: np.ndarray,
                   cvecs: np.ndarray | None = None) -> np.ndarray:
    """(R, C) neg-dot distances from node q_idx[r] to cand_safe[r, c],
    inf where invalid.  ``cvecs`` — the (R, C, d) gather a caller already
    holds (the pairwise-cc pass gathers the same rows) — skips this
    function's own gather on the big-n branch: at n > _FULL_MM_MAX_N the
    gather IS the cost (~0.5s per 4k-row chunk on this 0.6 GB/s box),
    not the einsum."""
    if len(unit) <= _FULL_MM_MAX_N:
        d_all = unit[q_idx] @ unit.T
        d = -np.take_along_axis(d_all, cand_safe, axis=1)
    else:
        cv = cvecs if cvecs is not None else unit[cand_safe]
        d = -np.einsum("rcd,rd->rc", cv, unit[q_idx])
    return np.where(valid, d, np.inf)


def _descent_rev(nbrs: np.ndarray) -> np.ndarray:
    """Reverse adjacency, capped at m per target (deterministic)."""
    n, m = nbrs.shape
    src = np.repeat(np.arange(n, dtype=np.int64), m)
    tgt = nbrs.ravel().astype(np.int64)
    ok = tgt >= 0
    src, tgt = src[ok], tgt[ok]
    order = np.lexsort((src, tgt))
    src, tgt = src[order], tgt[order]
    uniq, starts, counts = np.unique(tgt, return_index=True,
                                     return_counts=True)
    within = np.arange(len(tgt)) - np.repeat(starts, counts)
    keep = within < m
    rev = np.full((n, m), -1, dtype=np.int64)
    rev[tgt[keep], within[keep]] = src[keep]
    return rev


def _descent_rows(unit: np.ndarray, nbrs: np.ndarray, rev: np.ndarray,
                  lo: int, hi: int) -> tuple[np.ndarray, int]:
    """The descent update for rows [lo, hi) against the FROZEN previous
    graph — Jacobi semantics make row ranges independent, so fanning
    ranges out as Ray tasks is bit-identical to the serial sweep."""
    n, m = nbrs.shape
    out = np.empty((hi - lo, m), dtype=nbrs.dtype)
    changed = 0
    for clo in range(lo, hi, _DESCENT_CHUNK):
        idx = np.arange(clo, min(clo + _DESCENT_CHUNK, hi))
        B = len(idx)
        base = np.concatenate([nbrs[idx].astype(np.int64), rev[idx]],
                              axis=1)                       # (B, 2m)
        bsafe = np.where(base >= 0, base, 0)
        expand = nbrs[bsafe].reshape(B, -1).astype(np.int64)  # (B, 2m*m)
        exp_ok = (base >= 0)[:, :, None] & (nbrs[bsafe] >= 0)
        cand = np.concatenate([base, expand], axis=1)       # (B, C)
        valid = np.concatenate([base >= 0, exp_ok.reshape(B, -1)], axis=1)
        valid &= cand != idx[:, None]
        # vectorized per-row dedupe: sort, flag equal-neighbors
        cs = np.where(valid, cand, n)
        o = np.argsort(cs, axis=1, kind="stable")
        sc = np.take_along_axis(cs, o, 1)
        dup = np.zeros_like(valid)
        dup[:, 1:] = sc[:, 1:] == sc[:, :-1]
        dmark = np.zeros_like(valid)
        np.put_along_axis(dmark, o, dup, 1)
        valid &= ~dmark
        # COMPACT before the gather: as the graph converges, neighbor
        # lists overlap heavily and the post-dedupe valid count drops
        # far below the padded width C = 2m + 2m*m — pushing valid
        # candidates left (stable: relative order of finite candidates,
        # hence distance-tie resolution, is unchanged) shrinks the
        # (B, C, d) vector gather, the dominant memory traffic on the
        # big-n branch.  Bit-identical to the uncompacted pass.
        c_ord = np.argsort(~valid, axis=1, kind="stable")
        cmax = max(1, int(valid.sum(axis=1).max()))
        c_ord = c_ord[:, :cmax]
        cand = np.take_along_axis(cand, c_ord, 1)
        valid = np.take_along_axis(valid, c_ord, 1)
        safe = np.where(valid, cand, 0)
        d = _cand_neg_dots(unit, idx, safe, valid)
        k = min(m, d.shape[1])
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        dp = np.take_along_axis(d, part, 1)
        o2 = np.argsort(dp, axis=1, kind="stable")
        sel = np.take_along_axis(part, o2, 1)
        nb_new = np.where(np.isfinite(np.take_along_axis(d, sel, 1)),
                          np.take_along_axis(cand, sel, 1), -1)
        if k < m:
            nb_new = np.pad(nb_new, ((0, 0), (0, m - k)),
                            constant_values=-1)
        changed += int((nb_new != nbrs[idx]).sum())
        out[idx - lo] = nb_new.astype(np.int32)
    return out, changed


_descent_rows_remote = ray.remote(num_cpus=1)(_descent_rows)


def _descent_sweep(unit: np.ndarray, nbrs: np.ndarray,
                   n_tasks: int | None = None,
                   unit_ref=None) -> int:
    """One NN-descent iteration (Dong, Moses & Li 2011), fully
    vectorized: every node's new neighbor list is the m nearest among
    {current forward neighbors} ∪ {reverse neighbors (capped m)} ∪
    {neighbors of both} — Jacobi-style (all rows update from the
    previous graph), chunked to bound the (B, C, d) gather.  Returns the
    number of changed adjacency entries (convergence signal).

    ``n_tasks`` > 1 fans row ranges out as Ray tasks against the frozen
    snapshot — bit-identical to serial (Jacobi) — so merge-time polish
    sweeps over a big merged group use the whole cluster.  Pass
    ``unit_ref`` (ray.put of unit) to reuse one object-store copy
    across sweeps."""
    n = len(nbrs)
    rev = _descent_rev(nbrs)
    t = max(1, int(n_tasks or 1))
    if t <= 1 or n < 2 * _DESCENT_CHUNK:
        out, changed = _descent_rows(unit, nbrs, rev, 0, n)
        nbrs[:] = out
        return changed
    uref = unit_ref if unit_ref is not None else ray.put(unit)
    nref = ray.put(nbrs)
    rref = ray.put(rev)
    bounds = np.linspace(0, n, t + 1).astype(np.int64)
    futs = [_descent_rows_remote.remote(uref, nref, rref,
                                        int(bounds[i]), int(bounds[i + 1]))
            for i in range(t) if bounds[i] < bounds[i + 1]]
    changed = 0
    pos = 0
    for out, ch in ray.get(futs):
        nbrs[pos: pos + len(out)] = out
        pos += len(out)
        changed += ch
    return changed


def _finalize_rows(unit: np.ndarray, nbrs: np.ndarray, m: int,
                   alpha: float, keep_m: int, n_long: int, stride: int,
                   lo: int, hi: int) -> np.ndarray:
    """Finalize rows [lo, hi) — pure and row-independent (reads the
    frozen converged graph), so ranges fan out as Ray tasks
    bit-identically to the serial pass."""
    n = len(nbrs)
    out = np.full((hi - lo, m), -1, dtype=np.int32)
    for clo in range(lo, hi, _DESCENT_CHUNK):
        idx = np.arange(clo, min(clo + _DESCENT_CHUNK, hi))
        cand = nbrs[idx].astype(np.int64)
        valid = cand >= 0
        safe = np.where(valid, cand, 0)
        cvecs = unit[safe]          # ONE gather shared by d and cc
        d = _cand_neg_dots(unit, idx, safe, valid, cvecs=cvecs)
        cc = _pairwise_cc(unit, safe, cvecs=cvecs)
        kept_cols, cnts = _diverse_select_batch(d, cc, valid, keep_m, alpha)
        kmask = kept_cols >= 0
        ksafe = np.where(kmask, kept_cols, 0)
        sel = np.where(kmask, np.take_along_axis(cand, ksafe, 1), -1)
        rows = idx - lo
        out[rows, :keep_m] = sel.astype(np.int32)[:, :keep_m]
        # long jumps into the reserved tail slots (skip self/duplicates)
        for j in range(n_long):
            lj = (idx + (j + 1) * stride) % n
            lj = np.where(lj == idx, (lj + 1) % n, lj)
            seen = (out[rows] == lj[:, None]).any(axis=1)
            out[rows, keep_m + j] = np.where(seen, -1, lj).astype(np.int32)
    return out


_finalize_rows_remote = ray.remote(num_cpus=1)(_finalize_rows)


def _finalize_graph(unit: np.ndarray, nbrs: np.ndarray, m: int,
                    alpha: float, n_long: int = 2,
                    n_tasks: int | None = None,
                    unit_ref=None) -> np.ndarray:
    """Navigability pass over the converged KNN graph: per node keep a
    DIVERSE m - n_long selection of its nearest candidates (select-
    neighbors heuristic) and reserve ``n_long`` slots for deterministic
    long-range jumps (golden-ratio index stride — the Kleinberg
    small-world shortcut), so beam search can cross clusters that pure
    KNN edges would isolate.  ``n_tasks`` > 1 fans row ranges out as Ray
    tasks (rows are independent — bit-identical to serial)."""
    n = len(nbrs)
    keep_m = max(1, m - n_long)
    n_long = m - keep_m                # clamp for tiny degrees (m <= n_long)
    stride = max(1, int(round(n * 0.6180339887)))
    t = max(1, int(n_tasks or 1))
    if t <= 1 or n < 2 * _DESCENT_CHUNK:
        return _finalize_rows(unit, nbrs, m, alpha, keep_m, n_long,
                              stride, 0, n)
    uref = unit_ref if unit_ref is not None else ray.put(unit)
    nref = ray.put(nbrs)
    bounds = np.linspace(0, n, t + 1).astype(np.int64)
    futs = [_finalize_rows_remote.remote(uref, nref, m, alpha, keep_m,
                                         n_long, stride,
                                         int(bounds[i]),
                                         int(bounds[i + 1]))
            for i in range(t) if bounds[i] < bounds[i + 1]]
    return np.concatenate(ray.get(futs))


_EXACT_BUILD_MAX_N = 16384   # exact-KNN construction bound: n^2*d BLAS
                             # flops stay under ~70 GFLOP at dim 128 —
                             # measured CHEAPER than descent below this
                             # (12.5k x 128 single-thread: exact 8.4s vs
                             # descent 26s mult=1 / 40s mult=2), and the
                             # adaptive partitioner (_PART_TARGET_ROWS)
                             # keeps partitions under it by construction


def _exact_rows(unit: np.ndarray, mw: int, lo: int, hi: int) -> np.ndarray:
    """EXACT top-``mw`` neighbors (nearest first) for rows [lo, hi) by
    chunked BLAS matmul against all rows — row-independent and pure, so
    ranges fan out as Ray tasks bit-identically to the serial pass."""
    n = len(unit)
    out = np.empty((hi - lo, mw), dtype=np.int32)
    chunk = max(256, (1 << 24) // max(n, 1))   # ~64 MB distance block
    for clo in range(lo, hi, chunk):
        chi = min(clo + chunk, hi)
        d = -(unit[clo:chi] @ unit.T)
        d[np.arange(chi - clo), np.arange(clo, chi)] = np.inf
        part = np.argpartition(d, mw - 1, axis=1)[:, :mw]
        dp = np.take_along_axis(d, part, 1)
        o = np.argsort(dp, axis=1, kind="stable")
        out[clo - lo: chi - lo] = np.take_along_axis(
            part, o, 1).astype(np.int32)
    return out


_exact_rows_remote = ray.remote(num_cpus=1)(_exact_rows)


def _exact_knn_edges(unit: np.ndarray, mw: int,
                     n_tasks: int | None = None,
                     unit_ref=None) -> np.ndarray:
    """(n, mw) exact nearest-neighbor matrix (self excluded), the
    perfect-candidate input to ``_finalize_graph``.  ``n_tasks`` > 1
    fans row ranges out as Ray tasks."""
    n = len(unit)
    mw = min(mw, n - 1)
    t = max(1, int(n_tasks or 1))
    if t <= 1 or n < 2 * _DESCENT_CHUNK:
        return _exact_rows(unit, mw, 0, n)
    uref = unit_ref if unit_ref is not None else ray.put(unit)
    bounds = np.linspace(0, n, t + 1).astype(np.int64)
    futs = [_exact_rows_remote.remote(uref, mw, int(bounds[i]),
                                      int(bounds[i + 1]))
            for i in range(t) if bounds[i] < bounds[i + 1]]
    return np.concatenate(ray.get(futs))


def build_graph(vecs: np.ndarray, *, m_degree: int = 16,
                ef_construction: int = 64, seed: int = 42,
                alpha: float = 1.0, max_iters: int = 10,
                build_degree_mult: int = 1,
                n_tasks: int | None = None,
                method: str = "auto") -> np.ndarray:
    """Build a navigable graph over unit-normalized rows.

    Construction is NN-descent (random init, neighbor-of-neighbor
    refinement sweeps until <1% of edges change), then a finalize pass
    adds diversity + long-range jump edges for navigability.  Everything
    is batched numpy — there is no per-vector Python loop anywhere.
    Returns an (n, m_degree) int32 neighbor matrix padded with -1.
    ``ef_construction`` is accepted for API stability (it sizes the beam
    in ``bulk_insert``-based incremental merges; descent needs no beam).

    ``build_degree_mult`` > 1 runs descent at a WIDER working degree
    (m_degree * mult internal lists, pruned to m_degree by the finalize
    pass) — the expanded-candidate-set cure for NN-descent's plateau on
    uniform high-intrinsic-dim data (Dong et al. 2011 §5): measured
    edge quality@16 on 20k x 64 uniform rows 0.51 (mult=1, the plateau)
    -> 0.91 (mult=2), at ~4x the descent flops.  Clustered/real
    embeddings already converge near 1.0 at mult=1, so the default
    spends nothing.

    ``method`` picks the CANDIDATE-GENERATION stage feeding the shared
    finalize pass:

    - ``"exact"``: chunked-BLAS exact top-(2m) KNN edges — perfect
      candidates, cost n^2*d flops, independent of data distribution.
    - ``"descent"``: NN-descent as above — cost ~linear in n, quality
      data-dependent (the uniform plateau).
    - ``"auto"`` (default): exact when n <= ``_EXACT_BUILD_MAX_N``,
      descent above.  Measured at 12.5k x 128 single-thread (the
      in-task regime): exact 8.4s vs descent 26s (mult=1) / 40s
      (mult=2) on uniform, 7.3s vs 14s / 18s on clustered — exact is
      3-5x cheaper AND candidate-perfect below the bound, while the
      n^2 term loses to descent's ~linear cost above ~50k.  Note the
      uniform-data recall ceiling is the graph's greedy ROUTABILITY,
      not construction: an exact-candidate graph scores ef100
      recall@10 0.511 vs descent-mult=2's 0.523 at 12.5k x 128 IID
      gaussian — construction quality is saturated; more beam (ef256:
      0.80) is the remaining lever on such data.
    """
    n = len(vecs)
    nbrs = np.full((n, m_degree), -1, dtype=np.int32)
    if n <= 1:
        return nbrs
    unit = _unitize(vecs)
    if n <= m_degree + 1:
        d0 = -(unit @ unit.T)
        np.fill_diagonal(d0, np.inf)
        order = np.argsort(d0, axis=1, kind="stable")[:, : n - 1]
        nbrs[:, : n - 1] = order
        return nbrs
    if method not in ("auto", "exact", "descent"):
        raise ValueError(f"unknown graph build method {method!r}")
    if method == "auto":
        method = "exact" if n <= _EXACT_BUILD_MAX_N else "descent"
    mw = m_degree * max(2 if method == "exact" else 1,
                        int(build_degree_mult))
    mw = min(mw, n - 1)
    uref = ray.put(unit) if (n_tasks or 1) > 1 else None
    if method == "exact":
        work = _exact_knn_edges(unit, mw, n_tasks=n_tasks, unit_ref=uref)
    else:
        work = np.full((n, mw), -1, dtype=np.int32)
        rng = np.random.default_rng(seed)
        rand = rng.integers(0, n - 1, size=(n, mw))
        rand += rand >= np.arange(n)[:, None]             # skip self
        work[:] = rand
        for _ in range(max_iters):
            changed = _descent_sweep(unit, work, n_tasks=n_tasks,
                                     unit_ref=uref)
            if changed <= n * mw // 50:         # <2% of edges moved
                break
    return _finalize_graph(unit, work, m_degree, alpha,
                           n_tasks=n_tasks, unit_ref=uref)


def _medoid(unit: np.ndarray, sample: int = 1024, seed: int = 7) -> int:
    """Entry point: the sample row closest to the mean direction."""
    n = len(unit)
    if n == 0:
        return 0
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, size=min(sample, n), replace=False)
    mean = unit[idx].mean(axis=0)
    return int(idx[int((unit[idx] @ mean).argmax())])


def _decode_adjacency(tbl: pa.Table, width: int | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ragged list<int32> -> (-1)-padded rect matrix via the
    offsets math (no per-row Python loop)."""
    nb_col = tbl["neighbors"].combine_chunks() \
        if isinstance(tbl["neighbors"], pa.ChunkedArray) else tbl["neighbors"]
    offs = np.asarray(nb_col.offsets.to_numpy(zero_copy_only=False))
    lens = np.diff(offs).astype(np.int64)
    n = len(lens)
    maxd = int(lens.max()) if n else 0
    w = max(1, maxd if width is None else max(width, maxd))
    nbrs = np.full((n, w), -1, dtype=np.int32)
    if maxd:
        flat = nb_col.flatten().to_numpy(zero_copy_only=False)
        mask = np.arange(maxd)[None, :] < lens[:, None]
        nbrs[:, :maxd][mask] = flat
    return nbrs, lens.astype(np.int32)


def _coprime_stride(n: int) -> int:
    """Golden-ratio stride nudged to be coprime with n, so the chain
    i -> (i + s) % n is one Hamilton cycle."""
    import math
    s = max(1, int(round(n * 0.6180339887)))
    while math.gcd(s, n) != 1:
        s += 1
    return s % n if n > 1 else 1


def _ensure_cycle(nbrs: np.ndarray) -> np.ndarray:
    """Guarantee strong connectivity: make sure every row i has an edge
    to (i + s) % n for a stride s coprime with n (one Hamilton cycle
    through all nodes).  Inserted into a free slot when one exists, else
    over the last (farthest-kept) slot.  This is what makes full-beam
    search EXHAUSTIVE — the degenerate-exact oracle contract."""
    n = len(nbrs)
    if n <= 1:
        return nbrs
    s = _coprime_stride(n)
    tgt = ((np.arange(n) + s) % n).astype(np.int32)
    has = (nbrs == tgt[:, None]).any(axis=1)
    free = nbrs == -1
    slot = np.where(free.any(axis=1), free.argmax(axis=1),
                    nbrs.shape[1] - 1)
    rows = np.flatnonzero(~has)
    nbrs[rows, slot[rows]] = tgt[rows]
    return nbrs


PQ_NAME = "pq.npz"


def _pq_neg_lut(book: np.ndarray, Qn: np.ndarray) -> np.ndarray:
    """(B, M*K) float32 flattened lookup tables of NEGATED per-subspace
    dots between unit queries and the partition codebook — the beam's
    smaller-is-better convention, so a node's approximate distance is a
    plain gather-sum over its M codes (asymmetric distance computation)."""
    M, K, dsub = book.shape
    Qs = np.asarray(Qn, dtype=np.float32).reshape(len(Qn), M, dsub)
    lut = -np.einsum("mkd,bmd->bmk", book.astype(np.float32), Qs)
    return np.ascontiguousarray(lut.reshape(len(Qn), M * K))


def _train_part_pq(vecs_unit: np.ndarray, m_subspaces: int, n_codes: int,
                   sample: int = 65536,
                   seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Per-partition quantizer: codebook from a bounded seeded sample of
    the partition's UNIT rows (traversal geometry), codes for every row.
    The flush-time segment-local PQ train of `JVectorWriter.flush`
    (`JVectorWriter.java:381-414`)."""
    from opensearch_jvector_ray.pipelines.pq import (
        _kmeans_subspaces, pq_encode,
    )
    X = vecs_unit
    if len(X) > sample:
        rng = np.random.default_rng(seed)
        X = X[np.sort(rng.choice(len(X), size=sample, replace=False))]
    book = _kmeans_subspaces(X, m_subspaces, n_codes, seed=seed)
    return book, pq_encode(vecs_unit, book)


BQ_NAME = "bq.npz"
# per-byte popcount table: the BQ "codebook" is implicit (sign bits)
_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.float32)


def _hamming_lut(qbits: np.ndarray, nbytes: int) -> np.ndarray:
    """(B, nbytes*256) hamming lookup tables from packed query bits:
    entry [b, j*256 + v] is popcount(v XOR query_bits[b, j]) — bit-code
    traversal is the SAME gather-sum ADC the PQ beam uses, with M =
    nbytes and K = 256 (smaller hamming = closer, matching the beam's
    smaller-is-better convention)."""
    if qbits.shape[1] < nbytes:           # pad to the stored byte width
        qbits = np.pad(qbits, ((0, 0), (0, nbytes - qbits.shape[1])))
    v = np.arange(256, dtype=np.uint8)
    x = np.bitwise_xor(qbits[:, :, None], v[None, None, :])
    return np.ascontiguousarray(
        _POPCNT[x].reshape(len(qbits), -1))


def _bq_lut(Qn: np.ndarray, nbytes: int) -> np.ndarray:
    """One-bit hamming LUT: query sign bits vs stored sign bits (the
    Lucene BQ analog of the reference's 'PQ and BQ support',
    `README.md:33`)."""
    return _hamming_lut(np.packbits(np.asarray(Qn) > 0, axis=1), nbytes)


MBQ_NAME = "mbq.npz"
_MBQ_TRAIN_SAMPLE = 25000    # the reference quantizer's segment-level
                             # training sample (MultiBitScalarQuantizer
                             # DEFAULT_SAMPLE_SIZE)


def _mbq_thresholds(mean: np.ndarray, std: np.ndarray,
                    bits: int) -> np.ndarray:
    """(bits, d) per-dimension thresholds t_i = mean + iCoef * std with
    iCoef = -1 + 2(i+1)/(bits+1) — the reference's equal-probability
    split rule (`MultiBitScalarQuantizer.java:153-165`
    calculateThresholds)."""
    icoef = (-1.0 + 2.0 * (np.arange(bits, dtype=np.float32) + 1.0)
             / np.float32(bits + 1))
    return (mean[None, :] + icoef[:, None] * std[None, :]) \
        .astype(np.float32)


def _mbq_encode(vecs_unit: np.ndarray,
                thresholds: np.ndarray) -> np.ndarray:
    """Plane-major packed multi-bit codes: plane i is packbits(x > t_i)
    and the stored code concatenates the planes
    (`BitPacker.quantizeAndPackBits` layout) — hamming over the
    concatenation sums the per-plane hammings, so the existing
    XOR-popcount gather-sum traversal applies unchanged with
    M = bits * ceil(d/8)."""
    X = np.asarray(vecs_unit, dtype=np.float32)
    return np.concatenate(
        [np.packbits(X > t[None, :], axis=1) for t in thresholds],
        axis=1)


def _train_part_mbq(vecs_unit: np.ndarray, bits: int, seed: int = 42
                    ) -> tuple[np.ndarray, np.ndarray]:
    """MBQ quantizer for one partition: per-dimension mean/std over a
    bounded seeded sample -> (bits, d) thresholds -> plane-major packed
    codes for every row (the reference's 2/4-bit scalar quantizer,
    `MultiBitScalarQuantizer.java:108-119` train;
    training-free re-encode given thresholds)."""
    if bits not in (2, 4):
        raise ValueError("mbq bits must be 2 or 4")
    X = np.asarray(vecs_unit, dtype=np.float32)
    S = X
    if len(S) > _MBQ_TRAIN_SAMPLE:
        rng = np.random.default_rng(seed)
        S = S[np.sort(rng.choice(len(S), size=_MBQ_TRAIN_SAMPLE,
                                 replace=False))]
    thresholds = _mbq_thresholds(S.mean(axis=0), S.std(axis=0), bits)
    return thresholds, _mbq_encode(X, thresholds)


NVQ_NAME = "nvq.npz"
# companding exponents tried by the per-partition NVQ fit; gamma > 1
# spends more of the 8-bit budget near 0 (where unit-vector mass sits)
_NVQ_GAMMA_GRID = (0.5, 0.667, 0.8, 1.0, 1.25, 1.5, 2.0)
_NVQ_FIT_SAMPLE = 65536


def _nvq_levels(gamma: float) -> np.ndarray:
    """256 dequantization levels on [0, 1]: f(c) = (c/255)^gamma."""
    return ((np.arange(256, dtype=np.float32) / np.float32(255.0))
            ** np.float32(gamma))


def _nvq_encode(vecs_unit: np.ndarray, gamma: float
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vector affine + shared companding encode: codes c =
    round(255 * u^(1/gamma)) of u = (x - min_i) / (max_i - min_i);
    dequant x^ = a_i * (c/255)^gamma + b_i.  Training-free given gamma
    (a/b are per-vector statistics, not learned parameters)."""
    X = np.asarray(vecs_unit, dtype=np.float32)
    mn, mx = X.min(axis=1), X.max(axis=1)
    a = mx - mn
    a[a <= 0] = 1.0                       # constant rows: u = 0 everywhere
    b = mn
    u = (X - b[:, None]) / a[:, None]
    codes = np.rint(255.0 * u ** np.float32(1.0 / gamma)).astype(np.uint8)
    return a, b, codes


def _train_part_nvq(vecs_unit: np.ndarray, seed: int = 42
                    ) -> tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """NVQ quantizer for one partition: nonuniform (companded) 8-bit
    scalar quantization with PER-VECTOR affine normalization — the
    reference's NVQ family (jVector's nonuniform vector quantization,
    `README.md:33`) re-expressed for the numpy ADC path.  The companding
    exponent gamma is fit per partition by reconstruction-MSE grid search
    over a bounded sample (the flush-time segment-local train rule the PQ
    mode follows, `JVectorWriter.java:381-414`); per-vector (a, b) are
    closed-form, so encode stays training-free."""
    X = np.asarray(vecs_unit, dtype=np.float32)
    S = X
    if len(S) > _NVQ_FIT_SAMPLE:
        rng = np.random.default_rng(seed)
        S = S[np.sort(rng.choice(len(S), size=_NVQ_FIT_SAMPLE,
                                 replace=False))]
    mn, mx = S.min(axis=1), S.max(axis=1)
    a = mx - mn
    a[a <= 0] = 1.0
    u = (S - mn[:, None]) / a[:, None]
    best_g, best_err = 1.0, np.inf
    for g in _NVQ_GAMMA_GRID:
        c = np.rint(255.0 * u ** np.float32(1.0 / g)).astype(np.uint8)
        recon = _nvq_levels(g)[c]
        # true squared error carries the per-vector scale a_i^2
        err = float(((recon - u) ** 2).sum(axis=1) @ (a * a))
        if err < best_err:
            best_g, best_err = float(g), err
    a_all, b_all, codes = _nvq_encode(X, best_g)
    return best_g, a_all, b_all, codes


def _quant_lut_codes(part_quant, Qn
                     ) -> tuple[np.ndarray | None, np.ndarray,
                                tuple | None]:
    """(lut, codes, affine) for any quantization kind.  PQ/BQ feed
    _beam_batch's generic gather-sum traversal through ``lut``; NVQ
    returns ``lut=None`` plus ``affine = (a, b, qneg, levels)`` — the
    beam dequantizes candidate code ROWS through the 256-entry level
    table (L1-resident) and takes a BLAS dot, then corrects with the
    per-row affine: dist = a_i * (-(deq_i . q)) + b_i * (-sum(q)).
    A per-query LUT would carry d*256 entries here (M = d subspaces) —
    measured ~4x slower than dequant-then-dot from the per-iteration
    LUT row copies."""
    if part_quant[0] == "pq":
        return _pq_neg_lut(part_quant[1], Qn), part_quant[2], None
    if part_quant[0] == "nvq":
        _, gamma, a, b, codes = part_quant
        qneg = -np.asarray(Qn, dtype=np.float32).sum(axis=1)
        return None, codes, (a, b, qneg, _nvq_levels(gamma))
    if part_quant[0] == "mbq":
        # query quantized against the SAME per-dimension thresholds,
        # plane-major packed — hamming ADC identical to BQ with
        # M = bits * ceil(d/8)
        _, thresholds, codes = part_quant
        qbits = _mbq_encode(np.asarray(Qn, dtype=np.float32), thresholds)
        return _hamming_lut(qbits, codes.shape[1]), codes, None
    codes = part_quant[1]
    return _bq_lut(Qn, codes.shape[1]), codes, None


def _load_part_pq(pdir: str) -> tuple[np.ndarray, np.ndarray] | None:
    path = os.path.join(pdir, PQ_NAME)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return z["book"], z["codes"]


def _load_part_quant(pdir: str):
    """None | ("pq", book, codes) | ("bq", codes) |
    ("nvq", gamma, a, b, codes) | ("mbq", thresholds, codes)."""
    p = _load_part_pq(pdir)
    if p is not None:
        return ("pq", p[0], p[1])
    path = os.path.join(pdir, BQ_NAME)
    if os.path.exists(path):
        return ("bq", np.load(path)["codes"])
    path = os.path.join(pdir, NVQ_NAME)
    if os.path.exists(path):
        z = np.load(path)
        return ("nvq", float(z["gamma"]), z["a"], z["b"], z["codes"])
    path = os.path.join(pdir, MBQ_NAME)
    if os.path.exists(path):
        z = np.load(path)
        return ("mbq", z["thresholds"], z["codes"])
    return None


def _merge_quant(lead_q, unit: np.ndarray, refine_iters: int):
    """Quantization artifacts for a merged partition from its LEADING
    segment's quantizer: PQ books are (optionally) refined against the
    merged rows then re-encoded; BQ bits are repacked (training-free);
    an unquantized leading segment yields None."""
    if lead_q is None or len(unit) == 0:
        return None
    if lead_q[0] == "pq":
        from opensearch_jvector_ray.pipelines.pq import (
            pq_encode, refine_codebook,
        )
        book = refine_codebook(lead_q[1], unit, iters=refine_iters)
        return ("pq", book, pq_encode(unit, book))
    if lead_q[0] == "nvq":
        # gamma comes from the leading segment (refine-never-retrain);
        # per-vector (a, b) are closed-form statistics, so re-encoding
        # the merged rows is training-free
        gamma = lead_q[1]
        a, b, codes = _nvq_encode(unit, gamma)
        return ("nvq", gamma, a, b, codes)
    if lead_q[0] == "mbq":
        # thresholds come from the leading segment (refine-never-
        # retrain, `JVectorWriter.java:886-913`); encode is threshold
        # comparisons — training-free
        thresholds = lead_q[1]
        return ("mbq", thresholds, _mbq_encode(unit, thresholds))
    return ("bq", np.packbits(unit > 0, axis=1))


def _write_part(out: str, ids: np.ndarray, vecs: np.ndarray,
                nbrs: np.ndarray, id_col: str, vec_col: str,
                pq_book: np.ndarray | None = None,
                pq_codes: np.ndarray | None = None,
                bq_codes: np.ndarray | None = None,
                nvq_params: tuple | None = None,
                mbq_params: tuple | None = None,
                unit: np.ndarray | None = None) -> None:
    os.makedirs(out, exist_ok=True)
    nbrs = _ensure_cycle(np.ascontiguousarray(nbrs))
    # offsets-math ListArrays, no per-row Python: vectors are a flat
    # reshape with uniform offsets; ragged neighbor lists drop the -1
    # padding via one boolean mask (row-major order == per-row order)
    vmat = np.asarray(vecs, dtype=np.float32)
    if vmat.ndim == 1:                      # empty: (0,) -> (0, 0)
        vmat = vmat.reshape(0, 0)
    n, dim = vmat.shape
    voffs = np.arange(n + 1, dtype=np.int64) * dim
    varr = pa.LargeListArray.from_arrays(
        pa.array(voffs),
        pa.array(np.ascontiguousarray(vmat).reshape(-1)))
    keep = nbrs >= 0
    noffs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(keep.sum(axis=1), out=noffs[1:])
    narr = pa.ListArray.from_arrays(pa.array(noffs),
                                    pa.array(nbrs[keep].astype(np.int32)))
    tbl = pa.table({
        id_col: pa.array(np.asarray(ids, dtype=np.int64)),
        vec_col: varr.cast(pa.list_(pa.float32())),
        "neighbors": narr,
    })
    pq.write_table(tbl, os.path.join(out, "graph.parquet"))
    if pq_book is not None:
        np.savez(os.path.join(out, PQ_NAME), book=pq_book, codes=pq_codes)
    if bq_codes is not None:
        np.savez(os.path.join(out, BQ_NAME), codes=bq_codes)
    if nvq_params is not None:
        gamma, a, b, codes = nvq_params
        np.savez(os.path.join(out, NVQ_NAME), gamma=gamma, a=a, b=b,
                 codes=codes)
    if mbq_params is not None:
        thresholds, codes = mbq_params
        np.savez(os.path.join(out, MBQ_NAME), thresholds=thresholds,
                 codes=codes)
    if unit is None:                # callers with it in hand pass it —
        unit = _unitize(vecs)       # this box is bandwidth-bound
    entries = sorted({_medoid(unit), *_entry_set(len(ids))})
    with open(os.path.join(out, "_META"), "w") as f:
        json.dump({"entries": entries, "n": int(len(ids))}, f)


# ---------------------------------------------------------------------------
# distributed build / query
# ---------------------------------------------------------------------------

def build_graph_index(ds: "rd.Dataset", index_dir: str, *,
                      num_parts: int | None = 8, m_degree: int = 16,
                      ef_construction: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      pq_m_subspaces: int | None = None,
                      pq_n_codes: int = 256, pq_min_rows: int = 1024,
                      build_degree_mult: int = 1,
                      bq: bool = False,
                      nvq: bool = False,
                      mbq_bits: int | None = None,
                      method: str = "auto",
                      ) -> None:
    """Hash-partition vectors, build one graph per partition, persist.

    Partition graphs are independent (zero cross-partition edges), so the
    build is one shuffle + embarrassingly parallel graph constructions —
    at 100 TB each partition is a bounded working set sized by
    ``num_parts``, and a failed run resumes past parts whose meta exists.

    ``num_parts=None`` sizes partitions ADAPTIVELY to
    ``_PART_TARGET_ROWS`` (the bandwidth-aware matmul fast-path bound,
    `_FULL_MM_MAX_N`): a fixed part count silently produces giant
    partitions at data scale, whose descent falls off the BLAS path.

    ``method`` ("auto" default) picks per-partition candidate
    generation: "auto" uses EXACT chunked-BLAS KNN edges for partitions
    up to ``_EXACT_BUILD_MAX_N`` rows (3-5x cheaper than NN-descent
    there, candidate-perfect, data-distribution-independent) and
    NN-descent above; "exact"/"descent" pin one.  Adaptive partitioning
    keeps partitions under the exact bound by construction, so
    ``num_parts=None, method="auto"`` is the recommended at-scale
    configuration.  See ``build_graph`` for measurements.

    With ``pq_m_subspaces`` set, each partition also trains a segment-
    local PQ codebook and stores uint8 codes next to the graph (the
    optional quantization of `JVectorWriter.flush`,
    `JVectorWriter.java:381-414`); partitions smaller than
    ``pq_min_rows`` skip quantization, the min-batch-for-quantization
    rule (`common/KNNConstants.java:132`, default 1024).  Quantized
    partitions are searched with PQ traversal + exact rerank unless the
    caller opts out (``graph_topk(use_pq=False)``).

    ``bq=True`` stores BINARY-quantized sign bits instead (the Lucene BQ
    the reference supports alongside PQ, `README.md:33`): the beam
    traverses on per-byte XOR-popcount hamming lookup sums — the same
    gather-sum ADC machinery as PQ with M = ceil(dim/8) and K = 256 —
    and hits are ALWAYS exact-rescored.  32x compression, no training,
    no min-rows rule; mutually exclusive with ``pq_m_subspaces``.

    ``mbq_bits=2|4`` stores MULTI-BIT scalar codes (the reference's
    MultiBitScalarQuantizer, `MultiBitScalarQuantizer.java`): per
    dimension, ``bits`` thresholds at mean + iCoef*std split the data
    into equal-probability regions; codes are plane-major packed sign
    bits (`BitPacker.java` layout) and the beam walks the SAME
    XOR-popcount hamming ADC as BQ with M = bits*ceil(d/8).  16x/8x
    compression, mean/std training over a bounded sample per partition.
    """
    import shutil
    if sum((bool(bq), bool(pq_m_subspaces), bool(nvq),
            mbq_bits is not None)) > 1:
        raise ValueError("pass at most ONE of bq=True / pq_m_subspaces"
                         " / nvq=True / mbq_bits")
    if mbq_bits is not None and mbq_bits not in (2, 4):
        raise ValueError("mbq_bits must be 2 or 4 "
                         "(MultiBitScalarQuantizer TWO_BIT/FOUR_BIT)")
    os.makedirs(index_dir, exist_ok=True)
    if os.path.exists(os.path.join(index_dir, META_NAME)):
        return                                     # resume: complete index
    if num_parts is None:
        num_parts = max(1, -(-(ds.count() or 1) // _PART_TARGET_ROWS))

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(np.asarray(ids), categorize=False)
                % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    # DISK-STAGED repartition (the build.py staged-mode shape): a
    # partitioned parquet write routes rows to their part dirs with NO
    # all-to-all sort — measured faster than the groupby shuffle both at
    # bench scale (the sort's per-block barrier dominates tiny blocks)
    # and at data scale (the exchange spills by design and the staging
    # dir checkpoints it)
    stage = os.path.join(index_dir, "_stage")
    shutil.rmtree(stage, ignore_errors=True)
    (ds.map_batches(assign, batch_format="pyarrow")
       .write_parquet(stage, partition_cols=["__part"]))

    def build_part(batch: pa.Table) -> pa.Table:
        built = []
        for part in batch["part"].to_pylist():
            out = os.path.join(index_dir, f"part={part}")
            pdir = os.path.join(stage, f"__part={part}")
            if os.path.exists(os.path.join(out, "_META")) or \
                    not os.path.isdir(pdir):       # done / empty part
                continue
            tbl = pq.read_table(pdir, columns=[id_col, vec_col])
            order = np.argsort(tbl[id_col].to_numpy(zero_copy_only=False),
                               kind="stable")
            tbl = tbl.take(pa.array(order))
            vecs = _vecs_from_batch(tbl, vec_col)
            nbrs = build_graph(vecs, m_degree=m_degree,
                               ef_construction=ef_construction,
                               build_degree_mult=build_degree_mult,
                               method=method)
            book = codes = bqc = nvqp = mbqp = None
            if pq_m_subspaces and len(vecs) >= max(pq_min_rows, 2):
                book, codes = _train_part_pq(_unitize(vecs),
                                             pq_m_subspaces, pq_n_codes)
            elif bq:
                bqc = np.packbits(_unitize(vecs) > 0, axis=1)
            elif nvq:
                nvqp = _train_part_nvq(_unitize(vecs))
            elif mbq_bits is not None:
                mbqp = _train_part_mbq(_unitize(vecs), mbq_bits)
            _write_part(out, tbl[id_col].to_numpy(zero_copy_only=False),
                        vecs, nbrs, id_col, vec_col,
                        pq_book=book, pq_codes=codes, bq_codes=bqc,
                        nvq_params=nvqp, mbq_params=mbqp)
            built.append(part)
        return pa.table({"part": pa.array(built, type=pa.int32())})

    (rd.from_items([{"part": p} for p in range(num_parts)])
       .map_batches(build_part, batch_format="pyarrow", batch_size=1)
       .materialize())
    shutil.rmtree(stage, ignore_errors=True)
    with open(os.path.join(index_dir, META_NAME), "w") as f:
        json.dump({"num_parts": num_parts, "m_degree": m_degree,
                   "ef_construction": ef_construction,
                   "id_col": id_col, "vec_col": vec_col,
                   "pq_m_subspaces": pq_m_subspaces,
                   "pq_n_codes": pq_n_codes,
                   "pq_min_rows": pq_min_rows,
                   "build_degree_mult": build_degree_mult,
                   "method": method,
                   "bq": bq, "nvq": nvq, "mbq_bits": mbq_bits}, f)


def _compact_leading(tbl: pa.Table, dead: np.ndarray | None,
                     id_col: str, vec_col: str, m_degree: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Drop tombstoned rows from a leading graph, remapping surviving
    edges (ids, vecs, nbrs, n_nbrs) — the neighbors-state reuse."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = _vecs_from_batch(tbl, vec_col)
    nbrs, n_nbrs = _decode_adjacency(tbl, width=m_degree)
    if dead is None or len(dead) == 0:
        return ids, vecs, nbrs, n_nbrs
    keep = ~np.isin(ids, dead)
    remap = np.full(len(ids), -1, dtype=np.int32)
    remap[keep] = np.arange(int(keep.sum()), dtype=np.int32)
    nbrs = nbrs[keep]
    mapped = np.where(nbrs >= 0, remap[np.where(nbrs >= 0, nbrs, 0)], -1)
    # left-compact surviving edges per row (vectorized two-pass sort:
    # order by "is dead" stable, dead sink to the right)
    sink = (mapped < 0)
    order = np.argsort(sink, axis=1, kind="stable")
    mapped = np.take_along_axis(mapped, order, axis=1)
    return (ids[keep], vecs[keep], mapped,
            (mapped >= 0).sum(axis=1).astype(np.int32))


def merge_graph_index(src_dir: str, dst_dir: str, *, merge_factor: int = 4,
                      deletes: list[int] | None = None,
                      mode: str = "incremental",
                      polish_sweeps: int | str = 0,
                      refine_quant_iters: int = 0,
                      quantized_insert: bool = False) -> None:
    """Merge partition graphs: N input partitions -> ceil(N/factor)
    coarser ones, dropping tombstoned ids.

    ``mode="incremental"`` (default — the reference's headline merge,
    `JVectorWriter.java:922-941`): each group keeps the LARGEST
    partition's edges (leading-reader selection, `:640-698`; tombstoned
    nodes compacted with edge remap) and bulk-inserts only the smaller
    partitions' vectors — merge work scales with the small side, not the
    union.  ``mode="rebuild"`` concatenates the group and rebuilds from
    scratch (the delete-heavy branch; also the fallback when the leading
    graph dies entirely).  Per-group tasks run in parallel, and a
    finished part dir is a resume checkpoint.

    ``polish_sweeps`` > 0 runs that many NN-descent sweeps (at the
    build's working degree, seeded from the merged edges, DISTRIBUTED
    over the cluster like the build's own sweeps) + a diversity
    finalize over each incrementally-merged group — the cure for edge-
    quality COMPOUNDING across chained incremental merges (measured:
    8k+4k uniform 64-d, recall@10 0.750 incremental -> 0.776 with 2
    sweeps, above the 0.764 full rebuild, at ~1/5 the rebuild cost).
    ``"auto"`` sweeps to the build's own <2%-change convergence rule
    (capped) — the near-rebuild-quality setting for merges whose insert
    side DOMINATES the leading graph (a plain leading-edge merge is
    only as good as the lead's coverage of the merged space: at the
    100k sweep point with a 12.5% lead, recall@10 was 0.148 unpolished).
    Sweep cost is linear in the merged group size; 0 (default) keeps
    the plain leading-graph merge for insert-minority merges.

    ``refine_quant_iters`` > 0 REFINES a PQ leading codebook against the
    merged rows (a few Lloyd iterations seeded from the existing
    centroids — the reference's quantization-refinement-during-merge,
    `README.md:30`) before re-encoding; 0 (default) reuses the book
    verbatim.  BQ is training-free and unaffected.

    ``quantized_insert=True`` runs the incremental insert waves on ADC
    lookup sums over the (refined) codes instead of float dots — the
    reference's quantized index construction (`README.md:28`): no vector
    memory is touched during the wave walks, at slightly approximate
    edge selection; search-time full-beam exactness is unaffected (the
    cycle edge and exact rescore hold regardless of edge quality)."""
    if mode not in ("incremental", "rebuild"):
        raise ValueError(f"unknown merge mode {mode!r}")
    with open(os.path.join(src_dir, META_NAME)) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    m_degree, ef_c = meta["m_degree"], meta["ef_construction"]
    parts = sorted(d for d in os.listdir(src_dir) if d.startswith("part="))
    n_groups = max(1, -(-len(parts) // merge_factor))
    groups: list[list[str]] = [[] for _ in range(n_groups)]
    for i, p in enumerate(parts):
        groups[i % n_groups].append(os.path.join(src_dir, p))
    os.makedirs(dst_dir, exist_ok=True)
    if deletes:
        dead = np.asarray(sorted(deletes), dtype=np.int64)
    else:
        # default: the tombstone sidecar written by delete_from_graph_index
        # (a compacting merge is what physically drops dead rows; the dst
        # index carries NO sidecar afterwards)
        from opensearch_jvector_ray.pipelines.knn import _load_tombstones
        dead = _load_tombstones(src_dir, id_col)
    dead_ref = ray.put(dead)
    # CPUs not claimed by the group tasks themselves fan each group's
    # insert waves out (`bulk_insert(n_tasks=...)`): a single merged
    # segment stops pinning one CPU while the rest of the cluster idles
    try:
        total_cpus = int(ray.cluster_resources().get("CPU", 1))
    except Exception:                                 # pragma: no cover
        total_cpus = 1
    insert_tasks = max(1, total_cpus // n_groups)

    def merge_one(batch: pa.Table) -> pa.Table:
        dd = ray.get(dead_ref)
        out_parts = []
        for gid, dirs in zip(batch["gid"].to_pylist(),
                             batch["dirs"].to_pylist()):
            out = os.path.join(dst_dir, f"part={gid}")
            meta_p = os.path.join(out, "_META")
            if os.path.exists(meta_p):
                out_parts.append(gid)
                continue
            tbls = [pq.read_table(os.path.join(d, "graph.parquet"))
                    for d in dirs]
            lead = max(range(len(tbls)), key=lambda i: tbls[i].num_rows)
            if mode == "incremental":
                ids0, vecs0, nbrs0, n_nbrs0 = _compact_leading(
                    tbls[lead], dd, id_col, vec_col, m_degree)
            else:
                ids0 = np.empty(0, dtype=np.int64)
            pre_q = None
            unit_m = None       # unitized merged rows, computed once
            if len(ids0) == 0:                   # rebuild branch
                tbl = pa.concat_tables(
                    [t.select([id_col, vec_col]) for t in tbls])
                if dd is not None:
                    keep = ~np.isin(
                        tbl[id_col].to_numpy(zero_copy_only=False), dd)
                    tbl = tbl.filter(pa.array(keep))
                order = np.argsort(
                    tbl[id_col].to_numpy(zero_copy_only=False),
                    kind="stable")
                tbl = tbl.take(pa.array(order))
                ids = tbl[id_col].to_numpy(zero_copy_only=False)
                vecs = _vecs_from_batch(tbl, vec_col)
                nbrs = build_graph(
                    vecs, m_degree=m_degree, ef_construction=ef_c,
                    build_degree_mult=meta.get("build_degree_mult", 1),
                    method=meta.get("method", "auto"),
                    n_tasks=insert_tasks)
            else:
                rest = [t.select([id_col, vec_col])
                        for i, t in enumerate(tbls) if i != lead]
                if rest:
                    tr = pa.concat_tables(rest)
                    if dd is not None:
                        keep = ~np.isin(
                            tr[id_col].to_numpy(zero_copy_only=False), dd)
                        tr = tr.filter(pa.array(keep))
                    order = np.argsort(
                        tr[id_col].to_numpy(zero_copy_only=False),
                        kind="stable")
                    tr = tr.take(pa.array(order))
                    ids_r = tr[id_col].to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    vecs_r = _vecs_from_batch(tr, vec_col)
                else:
                    ids_r = np.empty(0, dtype=np.int64)
                    vecs_r = np.empty((0, vecs0.shape[1]))
                ids = np.concatenate([ids0, ids_r])
                vecs = np.concatenate([vecs0, vecs_r])
                nbrs = np.full((len(ids), m_degree), -1, dtype=np.int32)
                nbrs[: len(ids0), : nbrs0.shape[1]] = nbrs0
                n_nbrs = np.zeros(len(ids), dtype=np.int32)
                n_nbrs[: len(ids0)] = n_nbrs0
                unit_m = _unitize(vecs)
                if quantized_insert:
                    # quantized CONSTRUCTION (`README.md:28`): refine +
                    # encode up front so the insert waves traverse on
                    # ADC lookup sums instead of float dots
                    pre_q = _merge_quant(_load_part_quant(dirs[lead]),
                                         unit_m, refine_quant_iters)
                bulk_insert(unit_m, nbrs, n_nbrs, len(ids0),
                            m_degree=m_degree, ef_construction=ef_c,
                            quant=pre_q, n_tasks=insert_tasks)
                if polish_sweeps:
                    # polish at the BUILD's working degree (insert edges
                    # seed the candidate lists; descent heals the stale
                    # leading edges AND the compounded insert edges),
                    # distributed like the build's own sweeps.  "auto"
                    # sweeps to the build's own convergence rule — the
                    # near-rebuild-quality setting; an int pins a budget.
                    mult = max(1, int(meta.get("build_degree_mult", 1)))
                    mw = min(m_degree * mult, max(1, len(ids) - 1))
                    work = np.full((len(ids), mw), -1, dtype=np.int32)
                    cp = min(mw, nbrs.shape[1])
                    work[:, :cp] = nbrs[:, :cp]
                    auto = polish_sweeps == "auto"
                    budget = (_POLISH_MAX_SWEEPS if auto
                              else int(polish_sweeps))
                    pref = (ray.put(unit_m)
                            if (insert_tasks or 1) > 1 else None)
                    for _ in range(budget):
                        ch = _descent_sweep(unit_m, work,
                                            n_tasks=insert_tasks,
                                            unit_ref=pref)
                        if auto and ch <= len(ids) * mw // 50:
                            break
                    nbrs = _finalize_graph(unit_m, work, m_degree, 1.0,
                                           n_tasks=insert_tasks,
                                           unit_ref=pref)
            # quantized leading segment: REUSE its codebook (refine, never
            # retrain — `JVectorWriter.java:886-913`) and re-encode the
            # merged rows; BQ is training-free, so bits are just repacked;
            # unquantized inputs merge to an unquantized part
            book = codes = bqc = nvqp = mbqp = None
            if unit_m is None and len(ids):
                # one unitize pass for quant encode AND the medoid/
                # entry computation in _write_part (this box is
                # memory-bandwidth-bound — redundant full-matrix
                # traversals are the cost that shows)
                unit_m = _unitize(vecs)
            mq = pre_q if pre_q is not None else (
                _merge_quant(_load_part_quant(dirs[lead]),
                             unit_m, refine_quant_iters)
                if len(ids) else None)
            if mq is not None:
                if mq[0] == "pq":
                    book, codes = mq[1], mq[2]
                elif mq[0] == "nvq":
                    nvqp = mq[1:]
                elif mq[0] == "mbq":
                    mbqp = mq[1:]
                else:
                    bqc = mq[1]
            _write_part(out, ids, vecs, nbrs, id_col, vec_col,
                        pq_book=book, pq_codes=codes, bq_codes=bqc,
                        nvq_params=nvqp, mbq_params=mbqp, unit=unit_m)
            out_parts.append(gid)
        return pa.table({"gid": pa.array(out_parts, type=pa.int32())})

    items = [{"gid": gid, "dirs": dirs} for gid, dirs in enumerate(groups)]
    (rd.from_items(items)
       .map_batches(merge_one, batch_format="pyarrow", batch_size=1)
       .materialize())
    with open(os.path.join(dst_dir, META_NAME), "w") as f:
        json.dump({**meta, "num_parts": n_groups}, f)


def add_to_graph_index(new_ds: "rd.Dataset", index_dir: str) -> None:
    """Incremental ADD into an existing graph index (the reference's
    index-update path: new docs join the live segment's graph through
    the same insertion machinery the incremental merge uses,
    `JVectorWriter.java:922-941` / `addKnnFieldVector`).

    New vectors are routed by the SAME id-hash rule as the build (disk-
    staged partitioned write), then each partition bulk-inserts its new
    rows into the FROZEN existing graph (wave-batched beam+link — work
    scales with the new rows, not the partition).  Quantized partitions
    re-encode with their EXISTING codebook (refine-never-retrain).

    IDEMPOTENT + GLOBAL dedup: incoming ids already LIVE anywhere in
    the index are dropped (a pushed-down id probe per partition — a
    merge changes num_parts, so the hash route alone cannot vouch for
    absence).  UPDATE = DELETE + INSERT really works: an incoming id
    that is currently TOMBSTONED is revived — its dead rows are
    physically compacted out of whichever partitions hold them (edge
    remap), the new row inserts, and the tombstone clears LAST (a crash
    at any point re-runs to the same state).  Files are replaced via
    tmp + atomic rename with the GRAPH LAST (quant sidecars first: a
    codes matrix longer than the graph is unreadable rows, shorter
    would crash the quantized beam)."""
    import shutil
    with open(os.path.join(index_dir, META_NAME)) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    num_parts, m_degree = meta["num_parts"], meta["m_degree"]
    ef_c = meta["ef_construction"]

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(np.asarray(ids), categorize=False)
                % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    stage = os.path.join(index_dir, "_add_stage")
    shutil.rmtree(stage, ignore_errors=True)
    (new_ds.map_batches(assign, batch_format="pyarrow")
       .write_parquet(stage, partition_cols=["__part"]))
    try:
        total_cpus = int(ray.cluster_resources().get("CPU", 1))
    except Exception:                                 # pragma: no cover
        total_cpus = 1
    insert_tasks = max(1, total_cpus // max(1, num_parts))

    # driver pre-pass (incoming-id-bounded): where do incoming ids
    # already live, and which are tombstoned awaiting revival?
    from opensearch_jvector_ray.pipelines.knn import (
        TOMBSTONES_NAME, _load_tombstones,
    )
    import glob as _globmod
    stage_files = _globmod.glob(os.path.join(stage, "**", "*.parquet"),
                                recursive=True)
    if not stage_files:                   # empty add: nothing to do
        shutil.rmtree(stage, ignore_errors=True)
        return
    inc = pq.read_table(stage_files, columns=[id_col])
    incoming = set(int(i) for i in inc[id_col].to_pylist())
    tomb_arr = _load_tombstones(index_dir, id_col)
    tombs = set(int(i) for i in tomb_arr.tolist()) \
        if tomb_arr is not None else set()
    revive = incoming & tombs
    present_live: set = set()
    revive_by_part: dict[int, list[int]] = {}
    if incoming:
        inc_list = sorted(incoming)
        for p in range(num_parts):
            gp = os.path.join(index_dir, f"part={p}", "graph.parquet")
            if not os.path.exists(gp):
                continue
            hit = set(int(x) for x in pq.read_table(
                gp, columns=[id_col],
                filters=[(id_col, "in", inc_list)])[id_col].to_pylist())
            present_live |= hit - tombs
            rv = sorted(hit & revive)
            if rv:
                revive_by_part[p] = rv
    present_arr = np.array(sorted(present_live), dtype=np.int64)

    def add_part(batch: pa.Table) -> pa.Table:
        done = []
        for part in batch["part"].to_pylist():
            pdir = os.path.join(stage, f"__part={part}")
            dead_here = np.array(revive_by_part.get(part, ()),
                                 dtype=np.int64)
            if os.path.isdir(pdir):
                tnew = pq.read_table(pdir, columns=[id_col, vec_col])
            else:
                tnew = pa.table({id_col: pa.array([], type=pa.int64()),
                                 vec_col: pa.array([])})
            if tnew.num_rows == 0 and len(dead_here) == 0:
                continue
            out = os.path.join(index_dir, f"part={part}")
            gpath = os.path.join(out, "graph.parquet")
            if os.path.exists(gpath):
                tbl = pq.read_table(gpath)
                ids0, vecs0, nbrs0, n_nbrs0 = _compact_leading(
                    tbl, dead_here if len(dead_here) else None,
                    id_col, vec_col, m_degree)
                tn_ids = tnew[id_col].to_numpy(zero_copy_only=False)
                fresh = ~(np.isin(tn_ids, ids0)
                          | np.isin(tn_ids, present_arr))
                tnew = tnew.filter(pa.array(fresh))
            else:
                ids0 = np.empty(0, dtype=np.int64)
                if tnew.num_rows:
                    tn_ids = tnew[id_col].to_numpy(zero_copy_only=False)
                    tnew = tnew.filter(pa.array(
                        ~np.isin(tn_ids, present_arr)))
            if tnew.num_rows == 0 and len(dead_here) == 0:
                continue
            if tnew.num_rows == 0 and len(ids0) == 0:
                # revival compacted the partition EMPTY and nothing
                # routes here: drop the physical files
                shutil.rmtree(out, ignore_errors=True)
                done.append(part)
                continue
            if tnew.num_rows == 0:
                # revival-compaction-only rewrite: the remapped edges
                # from _compact_leading ARE the new graph
                ids, vecs, nbrs = ids0, vecs0, nbrs0
            else:
                order = np.argsort(
                    tnew[id_col].to_numpy(zero_copy_only=False),
                    kind="stable")
                tnew = tnew.take(pa.array(order))
                ids_n = tnew[id_col].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                vecs_n = _vecs_from_batch(tnew, vec_col)
                if len(ids0) == 0:       # partition had no rows yet
                    ids, vecs = ids_n, vecs_n
                    nbrs = build_graph(
                        vecs, m_degree=m_degree, ef_construction=ef_c,
                        build_degree_mult=meta.get("build_degree_mult",
                                                   1),
                        method=meta.get("method", "auto"),
                        n_tasks=insert_tasks)
                else:
                    ids = np.concatenate([ids0, ids_n])
                    vecs = np.concatenate([vecs0, vecs_n])
                    nbrs = np.full((len(ids), m_degree), -1,
                                   dtype=np.int32)
                    nbrs[: len(ids0), : nbrs0.shape[1]] = nbrs0
                    n_nbrs = np.zeros(len(ids), dtype=np.int32)
                    n_nbrs[: len(ids0)] = n_nbrs0
                    bulk_insert(_unitize(vecs), nbrs, n_nbrs,
                                len(ids0), m_degree=m_degree,
                                ef_construction=ef_c,
                                n_tasks=insert_tasks)
            book = codes = bqc = nvqp = mbqp = None
            part_q = _load_part_quant(out)
            if part_q is not None:
                if part_q[0] == "pq":
                    from opensearch_jvector_ray.pipelines.pq import pq_encode
                    book = part_q[1]
                    codes = pq_encode(_unitize(vecs), book)
                elif part_q[0] == "nvq":
                    # gamma stays (refine-never-retrain); (a, b, codes)
                    # are closed-form over the grown row set
                    nvqp = (part_q[1], *_nvq_encode(_unitize(vecs),
                                                    part_q[1]))
                elif part_q[0] == "mbq":
                    # thresholds stay (refine-never-retrain); encode is
                    # threshold comparisons over the grown row set
                    mbqp = (part_q[1],
                            _mbq_encode(_unitize(vecs), part_q[1]))
                else:
                    bqc = np.packbits(_unitize(vecs) > 0, axis=1)
            tmp = out + ".addtmp"
            shutil.rmtree(tmp, ignore_errors=True)
            _write_part(tmp, ids, vecs, nbrs, id_col, vec_col,
                        pq_book=book, pq_codes=codes, bq_codes=bqc,
                        nvq_params=nvqp, mbq_params=mbqp)
            os.makedirs(out, exist_ok=True)
            # quant sidecars BEFORE the graph: a crash in between
            # leaves codes LONGER than the graph (unread rows, safe);
            # the old order left them shorter — the quantized beam
            # would IndexError and the idempotent re-run could never
            # repair it (graph already showed the new ids).  The graph
            # replace is the commit point; _META last.
            if book is not None:
                os.replace(os.path.join(tmp, PQ_NAME),
                           os.path.join(out, PQ_NAME))
            if bqc is not None:
                os.replace(os.path.join(tmp, BQ_NAME),
                           os.path.join(out, BQ_NAME))
            if nvqp is not None:
                os.replace(os.path.join(tmp, NVQ_NAME),
                           os.path.join(out, NVQ_NAME))
            if mbqp is not None:
                os.replace(os.path.join(tmp, MBQ_NAME),
                           os.path.join(out, MBQ_NAME))
            os.replace(os.path.join(tmp, "graph.parquet"), gpath)
            os.replace(os.path.join(tmp, "_META"),
                       os.path.join(out, "_META"))
            shutil.rmtree(tmp, ignore_errors=True)
            done.append(part)
        return pa.table({"part": pa.array(done, type=pa.int32())})

    (rd.from_items([{"part": p} for p in range(num_parts)])
       .map_batches(add_part, batch_format="pyarrow", batch_size=1)
       .materialize())
    if revive:
        # clear revived ids LAST: until this point the tombstone kept
        # masking any partially-applied state, and a crash re-runs the
        # whole add to the same fixpoint (remove dead rows -> insert
        # new row -> clear)
        remain = sorted(tombs - revive)
        tomb_path = os.path.join(index_dir, TOMBSTONES_NAME)
        tmp_t = tomb_path + ".tmp"
        pq.write_table(pa.table({id_col: pa.array(remain,
                                                  type=pa.int64())}),
                       tmp_t)
        os.replace(tmp_t, tomb_path)
    shutil.rmtree(stage, ignore_errors=True)


def delete_from_graph_index(index_dir: str, vec_ids: list[int]) -> None:
    """Tombstone deletes (the Lucene live-docs rule): dead ids stay in
    the graph but are masked from every search; a compacting
    ``merge_graph_index`` (which reads the sidecar by default) drops
    them physically."""
    from opensearch_jvector_ray.pipelines.knn import delete_from_ivf_index
    with open(os.path.join(index_dir, META_NAME)) as f:
        meta = json.load(f)
    delete_from_ivf_index(index_dir, vec_ids, id_col=meta["id_col"])


def _part_pool_search(ids, vecs, unit, nbrs, n_nbrs, entries, part_pq,
                      qm, Qn, k, ef_search, use_pq, overquery,
                      kernel, translate, rnd,
                      allowed=None, filter_overquery=5, min_score=None,
                      denied=None):
    """Shared per-partition search: beam (float or PQ-ADC) + exact rescore,
    with the reference's PRE-FILTER semantics (`KNNQueryBuilder` filter +
    over-query, `KNNConstants.java:119`): ``allowed`` restricts which ids
    may be returned, never how the graph is walked.

    Filter rules (the Lucene filtered-kNN decision tree):
    - the beam widens to ``k * filter_overquery`` so post-filtering the
      pool still yields k survivors;
    - EXACT FALLBACK: when the partition's filtered row count fits the
      visit budget (ef), brute-force score those rows directly — cheaper
      and exact for selective filters (Lucene's exact-search-when-
      filter-is-small rule), and what makes full-beam filtered search
      provably equal to filtered brute force.

    ``min_score`` switches to RADIAL mode (`KNNQueryBuilder.java:438-472`):
    every visited node whose EXACT score >= min_score is returned,
    unbounded; ``k`` is ignored (pass None).  The visit budget is
    ``ef_search`` alone — at full beam the pool is the whole connected
    partition (Hamilton-cycle edge), so full-beam radial equals
    brute-force radial.

    ``denied`` is the tombstone DENY-list (deleted docs stay in the
    graph until a compacting merge, the Lucene live-docs rule): dead
    nodes are still walked but never returned — at full beam the result
    equals brute force over the LIVE rows only.

    Returns [(qi, sel_ids, sel_scores)] partial results per query.
    """
    out = []
    radial = min_score is not None
    kk = 0 if k is None else k

    def _select(cand_ids, score):
        if radial:
            keep = score >= min_score
            return cand_ids[keep], score[keep]
        return _partial_topk(cand_ids, score, k)

    live = None
    if denied is not None and len(denied):
        live = ~np.isin(ids, denied)
        if not live.any():
            return out
    ef_eff = max(ef_search, kk)
    lut = codes = affine = None
    if use_pq and part_pq is not None:
        lut, codes, affine = _quant_lut_codes(part_pq, Qn)
        ef_eff = max(ef_eff, kk * overquery)
    amask = None
    if allowed is not None:
        amask = np.isin(ids, allowed)
        if live is not None:
            amask &= live
        n_allowed = int(amask.sum())
        if n_allowed == 0:
            return out
        ef_eff = max(ef_eff, kk * filter_overquery)
        if n_allowed <= ef_eff:
            rows = np.flatnonzero(amask)
            for qi in range(len(Qn)):
                score = rnd(translate(kernel(vecs[rows], qm[qi])))
                sel_ids, sel_sc = _select(ids[rows], score)
                out.append((qi, sel_ids, sel_sc))
            return out
    _, V = _beam_batch(unit, nbrs, entries=entries, Q=Qn,
                       ef=ef_eff, lut=lut, codes=codes, affine=affine)
    for qi in range(len(Qn)):
        cand = V[qi][V[qi] >= 0]
        if amask is not None and len(cand):
            cand = cand[amask[cand]]
        elif live is not None and len(cand):
            cand = cand[live[cand]]
        if len(cand) == 0:
            continue
        # EXACT metric scores for the candidates (graph prunes, the
        # score is never approximated — the rerank rule)
        score = rnd(translate(kernel(vecs[cand], qm[qi])))
        sel_ids, sel_sc = _select(ids[cand], score)
        out.append((qi, sel_ids, sel_sc))
    return out


@ray.remote
class GraphShardActor:
    """Serving-shape graph search (the `serve.py:SegmentShardActor`
    pattern for the vector engine): owns a subset of partitions, decodes
    each graph ONCE in ``__init__`` (unit matrix, rect adjacency, ids,
    entries) and keeps it resident across searches — `graph_topk` re-reads
    the parquet per call, right for batch pipelines, wasteful for query
    serving (the held-open `JVectorReader` analog)."""

    def __init__(self, part_dirs: list[str], id_col: str, vec_col: str):
        self.parts = []
        for pdir in part_dirs:
            tbl = pq.read_table(os.path.join(pdir, "graph.parquet"))
            with open(os.path.join(pdir, "_META")) as f:
                pmeta = json.load(f)
            vecs = _vecs_from_batch(tbl, vec_col)
            nbrs, n_nbrs = _decode_adjacency(tbl)
            self.parts.append({
                "ids": tbl[id_col].to_numpy(zero_copy_only=False),
                "vecs": vecs,
                "unit": _unitize(vecs),
                "nbrs": nbrs,
                "n_nbrs": n_nbrs,
                "entries": pmeta["entries"],
                "pq": _load_part_quant(pdir),
            })

    def search(self, qids: list[str], qmat: np.ndarray, k: int | None,
               ef_search: int, metric: str,
               round_decimals: int | None, use_pq: bool = True,
               overquery: int = 5, filter_ids: np.ndarray | None = None,
               filter_overquery: int = 5,
               min_score: float | None = None,
               denied: np.ndarray | None = None) -> pd.DataFrame:
        kernel, translate, _ = METRICS[metric]
        rnd = _rounder(round_decimals)
        qnorm = np.linalg.norm(qmat, axis=1)
        qnorm[qnorm == 0] = 1.0
        Qn = (qmat / qnorm[:, None]).astype(np.float32)
        out_q, out_id, out_s = [], [], []
        for p in self.parts:
            hits = _part_pool_search(
                p["ids"], p["vecs"], p["unit"], p["nbrs"], p["n_nbrs"],
                p["entries"], p["pq"], qmat, Qn, k, ef_search, use_pq,
                overquery, kernel, translate, rnd,
                allowed=filter_ids, filter_overquery=filter_overquery,
                min_score=min_score, denied=denied)
            for qi, sel_ids, sel_sc in hits:
                out_q.extend([qids[qi]] * len(sel_ids))
                out_id.append(sel_ids)
                out_s.append(sel_sc)
        if not out_q:
            return pd.DataFrame(columns=["query_id", "vec_id", "score"])
        return pd.DataFrame({
            "query_id": out_q,
            "vec_id": np.concatenate(out_id),
            "score": np.concatenate(out_s)})


class GraphSearchService:
    """N long-lived actors, each owning a static subset of partitions;
    results are identical to ``graph_topk`` (same beam, rescore and tie
    rules) — asserted by tests — AS OF the last open/refresh: actors
    decode partition graphs once, so an add/merge performed afterwards
    is invisible until ``refresh()``; tombstones, by contrast, are
    re-read every search (the live-docs rule), so deletes apply
    immediately."""

    def __init__(self, index_dir: str, num_shards: int = 4):
        with open(os.path.join(index_dir, META_NAME)) as f:
            meta = json.load(f)
        self.index_dir = index_dir
        self.num_shards = num_shards
        self.id_col, self.vec_col = meta["id_col"], meta["vec_col"]
        self._open_actors()

    def _open_actors(self) -> None:
        parts = sorted(os.path.join(self.index_dir, d)
                       for d in os.listdir(self.index_dir)
                       if d.startswith("part="))
        n = max(1, min(self.num_shards, len(parts)))
        shards = [parts[i::n] for i in range(n)]
        self.actors = [GraphShardActor.remote(s, self.id_col,
                                              self.vec_col)
                       for s in shards if s]

    def refresh(self) -> None:
        """Re-open the index at its CURRENT on-disk state (NRT refresh
        analog): actors are recreated over the current partition list.
        Cold caches on the replacements — partition graphs are decoded
        actor-side at init, and an in-place warm reload would have to
        diff file states per partition; recreate is the simple correct
        form."""
        self.shutdown()
        self._open_actors()

    def search(self, queries: dict[str, np.ndarray], k: int | None, *,
               ef_search: int = 64, metric: str = "cosine",
               round_decimals: int | None = None, use_pq: bool = True,
               overquery: int = 5, filter_ids: np.ndarray | None = None,
               filter_overquery: int = 5,
               min_score: float | None = None,
               max_distance: float | None = None) -> pd.DataFrame:
        if max_distance is not None:
            if min_score is not None:
                raise ValueError("pass min_score OR max_distance, not both "
                                 "(KNNQueryBuilder.java:438-472)")
            min_score = scoring.distance_to_min_score(metric, max_distance)
        if k is None and min_score is None:
            raise ValueError("k is required unless min_score/"
                             "max_distance selects radial mode")
        qids = sorted(queries)
        qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
        filt = (ray.put(np.asarray(filter_ids))       # ship ONCE, not
                if filter_ids is not None else None)  # once per shard
        from opensearch_jvector_ray.pipelines.knn import _load_tombstones
        dead = _load_tombstones(self.index_dir, self.id_col)
        dref = ray.put(dead) if dead is not None else None
        futs = [a.search.remote(qids, qmat, k, ef_search, metric,
                                round_decimals, use_pq, overquery,
                                filt, filter_overquery, min_score, dref)
                for a in self.actors]
        out = pd.concat(ray.get(futs), ignore_index=True)
        if out.empty:
            return pd.DataFrame(
                columns=["query_id", "rank", self.id_col, "score"])
        out = out.sort_values(["query_id", "score", "vec_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        if min_score is None:
            out = out.groupby("query_id", sort=False).head(k)
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        out = out.rename(columns={"vec_id": self.id_col})
        return out[["query_id", "rank", self.id_col,
                    "score"]].reset_index(drop=True)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def graph_topk(index_dir: str, queries: dict[str, np.ndarray],
               k: int | None, *,
               ef_search: int = 64, metric: str = "cosine",
               round_decimals: int | None = None, use_pq: bool = True,
               overquery: int = 5,
               filter_ids: np.ndarray | list[int] | None = None,
               filter_overquery: int = 5,
               min_score: float | None = None,
               max_distance: float | None = None) -> pd.DataFrame:
    """Beam-search every partition graph, merge the per-partition top-k.

    One Ray task per partition (the per-leaf search of
    `JVectorReader.search`) running ONE lockstep batched beam for ALL
    queries; the driver's merge is over num_parts * k rows only.

    Quantized partitions (built with ``pq_m_subspaces``) traverse on PQ
    lookup sums and widen the pool to ``k * overquery`` (the reference's
    over-query factor, default 5, `KNNConstants.java:119`); the final
    scores are ALWAYS an exact full-precision rescore of the pool — PQ
    changes which candidates are seen, never how hits are scored.
    ``use_pq=False`` forces full-precision traversal everywhere.

    ``filter_ids`` is the reference's PRE-FILTER (`KNNQueryBuilder`
    filter + over-query): only listed ids may be returned; the beam
    widens to ``k * filter_overquery`` and partitions whose filtered row
    count fits the visit budget fall back to exact scoring of exactly
    those rows (the Lucene exact-search-when-filter-is-small rule) — so
    full-beam filtered search is provably filtered brute force.  The id
    array ships to the cluster ONCE via ``ray.put``.

    ``min_score`` switches to RADIAL mode: every node the beam visits
    whose exact score >= min_score is returned, unbounded (``k`` is
    ignored — pass None); at full beam this equals brute-force radial.
    ``max_distance`` is the reference's other radial form, translated
    per-space into min_score (`KNNEngine.distanceToRadialThreshold`,
    `KNNEngine.java:100-192`); passing both is an error.
    """
    if max_distance is not None:
        if min_score is not None:
            raise ValueError("pass min_score OR max_distance, not both "
                             "(KNNQueryBuilder.java:438-472)")
        min_score = scoring.distance_to_min_score(metric, max_distance)
    if k is None and min_score is None:
        # validate at the entry point: k=None without a radial
        # predicate used to surface as an opaque TypeError inside the
        # remote task's _partial_topk
        raise ValueError("k is required unless min_score/max_distance "
                         "selects radial mode")
    with open(os.path.join(index_dir, META_NAME)) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    kernel, translate, _ = METRICS[metric]
    rnd = _rounder(round_decimals)
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    qref = ray.put(qmat)
    fref = (ray.put(np.asarray(filter_ids, dtype=np.int64))
            if filter_ids is not None else None)
    from opensearch_jvector_ray.pipelines.knn import _load_tombstones
    dead = _load_tombstones(index_dir, id_col)
    dref = ray.put(dead) if dead is not None else None
    parts = sorted(d for d in os.listdir(index_dir) if d.startswith("part="))

    def search_part(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        allowed = ray.get(fref) if fref is not None else None
        denied = ray.get(dref) if dref is not None else None
        qnorm = np.linalg.norm(qm, axis=1)
        qnorm[qnorm == 0] = 1.0
        Qn = (qm / qnorm[:, None]).astype(np.float32)
        out_q, out_id, out_s = [], [], []
        for pdir in batch["dir"].to_pylist():
            tbl = pq.read_table(os.path.join(pdir, "graph.parquet"))
            with open(os.path.join(pdir, "_META")) as f:
                pmeta = json.load(f)
            vecs = _vecs_from_batch(tbl, vec_col)
            ids = tbl[id_col].to_numpy(zero_copy_only=False)
            nbrs, n_nbrs = _decode_adjacency(tbl)
            part_pq = _load_part_quant(pdir) if use_pq else None
            hits = _part_pool_search(
                ids, vecs, _unitize(vecs), nbrs, n_nbrs, pmeta["entries"],
                part_pq, qm, Qn, k, ef_search, use_pq, overquery,
                kernel, translate, rnd,
                allowed=allowed, filter_overquery=filter_overquery,
                min_score=min_score, denied=denied)
            for qi, sel_ids, sel_sc in hits:
                out_q.extend([qids[qi]] * len(sel_ids))
                out_id.append(sel_ids)
                out_s.append(sel_sc)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(out_q, type=pa.string()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    items = [{"dir": os.path.join(index_dir, p)} for p in parts]
    out = (rd.from_items(items)
           .map_batches(search_part, batch_format="pyarrow", batch_size=1)
           .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    out = out.sort_values(["query_id", "score", id_col],
                          ascending=[True, False, True], kind="mergesort")
    if min_score is None:
        out = out.groupby("query_id", sort=False).head(k)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)
