"""Graph ANN index: per-partition best-first-search graphs (the engine
family of the reference — jVector is a DiskANN-style graph,
`JVectorWriter.writeGraph` `/root/reference/src/main/java/org/opensearch/
knn/index/codec/jvector/JVectorWriter.java:311-379`; search
`JVectorReader.search` `JVectorReader.java:131-212`; query type
`JVectorKnnFloatVectorQuery.java:21`).

Public-knowledge algorithm: a single-layer navigable graph built by
incremental insertion with beam search + degree-capped bidirectional
linking (the NSW/Vamana construction family — Malkov & Yashunin 2016,
Subramanya et al. 2019 — no reference code involved; Lucene's HNSW is the
same public shape).

Ray-Data shape (mirrors the BM25 substrate):
  - BUILD (T4 per-partition index builder): vectors are hash-bucketed to
    ``num_parts`` partitions with ONE shuffle; each partition builds its
    own graph vectorized-per-insertion (neighbor distance evals are numpy
    matvecs) and persists (vec_id, embedding, neighbors) parquet + a
    meta record — per-partition artifacts, resumable (skip parts whose
    meta exists).
  - QUERY (A1 leaf->global reduce): each partition runs beam search from
    its medoid entry point (one task per partition), emits its local
    top-k, and the driver merges the small k-lists — never a global sort.
  - Per-partition graphs are the same design the reference uses
    per-segment; force-merge would rebuild coarser partitions (rebuild =
    the delete-handling branch, like the postings merge).

Scores are the Lucene-ordered translations from functions/scoring.py,
rounded before ranking when ``round_decimals`` is set (one tie rule).
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from opensearch_jvector_ray.pipelines.knn import (
    METRICS, _partial_topk, _rounder, _vecs_from_batch,
)

META_NAME = "_graph_meta.json"


# ---------------------------------------------------------------------------
# per-partition graph build (numpy; one partition fits one task by design)
# ---------------------------------------------------------------------------

def _neg_dot(unit: np.ndarray, q: np.ndarray) -> np.ndarray:
    return -(unit @ q)


def build_graph(vecs: np.ndarray, *, m_degree: int = 16,
                ef_construction: int = 64, seed: int = 42) -> np.ndarray:
    """Build a navigable graph over unit-normalized rows.

    Incremental insertion: beam-search the partial graph for each new
    node's ef_construction nearest, link to the closest m_degree,
    reciprocate with degree cap (drop the farthest on overflow).  Returns
    an (n, m_degree) int32 neighbor matrix padded with -1.
    """
    n = len(vecs)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    nbrs = np.full((n, m_degree), -1, dtype=np.int32)
    n_nbrs = np.zeros(n, dtype=np.int32)
    if n == 0:
        return nbrs

    def link(a: int, b: int, d: float) -> None:
        """Add edge a->b, evicting a's farthest neighbor on overflow."""
        k = n_nbrs[a]
        if k < m_degree:
            nbrs[a, k] = b
            n_nbrs[a] = k + 1
            return
        cand = nbrs[a]
        dists = _neg_dot(unit[cand], unit[a])
        worst = int(dists.argmax())
        if d < dists[worst]:
            nbrs[a, worst] = b

    rng = np.random.default_rng(seed)
    for i in range(1, n):
        q = unit[i]
        # multi-entry search: the running entry set spans the inserted
        # prefix, so inserts from a new cluster still find their true
        # neighbors (single-entry NSW strands distant clusters)
        entries = _entry_set(i, rng_seed=seed)
        found = _beam(unit, nbrs, n_nbrs, entries=entries, q=q,
                      ef=ef_construction, n_valid=i)
        for d, j in found[:m_degree]:
            link(i, j, d)
            link(j, i, d)
    return nbrs


def _entry_set(n_valid: int, rng_seed: int = 42, n_entries: int = 8
               ) -> list[int]:
    """Deterministic spread of entry points over [0, n_valid): node 0 plus
    evenly-strided picks — cheap insurance against graph islands."""
    if n_valid <= n_entries:
        return list(range(n_valid))
    stride = n_valid / n_entries
    return sorted({int(j * stride) for j in range(n_entries)})


def _beam(unit: np.ndarray, nbrs: np.ndarray, n_nbrs: np.ndarray,
          entries: list[int], q: np.ndarray, ef: int,
          n_valid: int | None = None) -> list[tuple[float, int]]:
    """Best-first beam search from a SET of entry points; returns
    [(dist, node)] sorted ascending.

    Neighbor distance evaluations are one numpy matvec per expansion —
    the loop runs once per EXPANDED node (~ef), not per scored vector.
    """
    visited = np.zeros(len(unit), dtype=bool)
    ent = np.array(sorted(set(entries)), dtype=np.int64)
    d_ent = _neg_dot(unit[ent], q)
    visited[ent] = True
    cand: list[tuple[float, int]] = [           # min-heap by dist
        (float(d), int(v)) for d, v in zip(d_ent, ent)]
    heapq.heapify(cand)
    best: list[tuple[float, int]] = [(-d, v) for d, v in cand]
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    while cand:
        d, u = heapq.heappop(cand)
        if d > -best[0][0] and len(best) >= ef:
            break
        neigh = nbrs[u, : n_nbrs[u]]
        neigh = neigh[neigh >= 0]
        if n_valid is not None:
            neigh = neigh[neigh < n_valid]
        neigh = neigh[~visited[neigh]]
        if len(neigh) == 0:
            continue
        visited[neigh] = True
        dists = _neg_dot(unit[neigh], q)
        for dn, v in zip(dists.tolist(), neigh.tolist()):
            if len(best) < ef or dn < -best[0][0]:
                heapq.heappush(cand, (dn, v))
                heapq.heappush(best, (-dn, v))
                if len(best) > ef:
                    heapq.heappop(best)
    out = sorted(((-nd, v) for nd, v in best))
    return out


def _medoid(unit: np.ndarray, sample: int = 1024, seed: int = 7) -> int:
    """Entry point: the sample row closest to the mean direction."""
    n = len(unit)
    if n == 0:
        return 0
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, size=min(sample, n), replace=False)
    mean = unit[idx].mean(axis=0)
    return int(idx[int((unit[idx] @ mean).argmax())])


# ---------------------------------------------------------------------------
# distributed build / query
# ---------------------------------------------------------------------------

def build_graph_index(ds: "rd.Dataset", index_dir: str, *,
                      num_parts: int = 8, m_degree: int = 16,
                      ef_construction: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      ) -> None:
    """Hash-partition vectors, build one graph per partition, persist.

    Partition graphs are independent (zero cross-partition edges), so the
    build is one shuffle + embarrassingly parallel graph constructions —
    at 100 TB each partition is a bounded working set sized by
    ``num_parts``, and a failed run resumes past parts whose meta exists.
    """
    os.makedirs(index_dir, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(np.asarray(ids), categorize=False)
                % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def build_one(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["__part"].iloc[0])
        out = os.path.join(index_dir, f"part={part}")
        meta_p = os.path.join(out, "_META")
        if os.path.exists(meta_p):                  # resume: skip done part
            return pd.DataFrame({"part": [part], "n": [len(df)]})
        os.makedirs(out, exist_ok=True)
        df = df.sort_values(id_col, kind="mergesort")
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in df[vec_col]])
        nbrs = build_graph(vecs, m_degree=m_degree,
                           ef_construction=ef_construction)
        tbl = pa.table({
            id_col: pa.array(df[id_col].to_numpy(dtype=np.int64)),
            vec_col: pa.array([v.astype(np.float32) for v in vecs],
                              type=pa.list_(pa.float32())),
            "neighbors": pa.array([row[row >= 0].tolist() for row in nbrs],
                                  type=pa.list_(pa.int32())),
        })
        pq.write_table(tbl, os.path.join(out, "graph.parquet"))
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        entries = sorted({_medoid(unit), *_entry_set(len(df))})
        with open(meta_p, "w") as f:
            json.dump({"entries": entries, "n": len(df)}, f)
        return pd.DataFrame({"part": [part], "n": [len(df)]})

    (ds.map_batches(assign, batch_format="pyarrow")
       .groupby("__part")
       .map_groups(build_one, batch_format="pandas")
       .materialize())
    with open(os.path.join(index_dir, META_NAME), "w") as f:
        json.dump({"num_parts": num_parts, "m_degree": m_degree,
                   "ef_construction": ef_construction,
                   "id_col": id_col, "vec_col": vec_col}, f)


def merge_graph_index(src_dir: str, dst_dir: str, *, merge_factor: int = 4,
                      deletes: list[int] | None = None) -> None:
    """Merge partition graphs: N input partitions -> ceil(N/factor)
    coarser ones, dropping tombstoned ids.

    The reference merges per-segment graphs on force-merge
    (`JVectorWriter.java:850-969`); here each merge group concatenates its
    partitions' vectors and REBUILDS one graph (graph edges don't survive
    re-partitioning — the rebuild branch; per-group tasks run in
    parallel, and a finished part dir is a resume checkpoint)."""
    with open(os.path.join(src_dir, META_NAME)) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    parts = sorted(d for d in os.listdir(src_dir) if d.startswith("part="))
    n_groups = max(1, -(-len(parts) // merge_factor))
    groups: list[list[str]] = [[] for _ in range(n_groups)]
    for i, p in enumerate(parts):
        groups[i % n_groups].append(os.path.join(src_dir, p))
    os.makedirs(dst_dir, exist_ok=True)
    dead = np.asarray(sorted(deletes), dtype=np.int64) if deletes else None
    dead_ref = ray.put(dead)

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
            tbls = [pq.read_table(os.path.join(d, "graph.parquet"),
                                  columns=[id_col, vec_col]) for d in dirs]
            tbl = pa.concat_tables(tbls)
            if dd is not None:
                keep = ~np.isin(tbl[id_col].to_numpy(zero_copy_only=False),
                                dd)
                tbl = tbl.filter(pa.array(keep))
            order = np.argsort(tbl[id_col].to_numpy(zero_copy_only=False),
                               kind="stable")
            tbl = tbl.take(pa.array(order))
            vecs = _vecs_from_batch(tbl, vec_col)
            nbrs = build_graph(vecs, m_degree=meta["m_degree"],
                               ef_construction=meta["ef_construction"])
            os.makedirs(out, exist_ok=True)
            merged = pa.table({
                id_col: tbl[id_col],
                vec_col: tbl[vec_col],
                "neighbors": pa.array(
                    [row[row >= 0].tolist() for row in nbrs],
                    type=pa.list_(pa.int32())),
            })
            pq.write_table(merged, os.path.join(out, "graph.parquet"))
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = vecs / norms[:, None]
            entries = sorted({_medoid(unit), *_entry_set(len(vecs))})
            with open(meta_p, "w") as f:
                json.dump({"entries": entries, "n": int(tbl.num_rows)}, f)
            out_parts.append(gid)
        return pa.table({"gid": pa.array(out_parts, type=pa.int32())})

    items = [{"gid": gid, "dirs": dirs} for gid, dirs in enumerate(groups)]
    (rd.from_items(items)
       .map_batches(merge_one, batch_format="pyarrow", batch_size=1)
       .materialize())
    with open(os.path.join(dst_dir, META_NAME), "w") as f:
        json.dump({**meta, "num_parts": n_groups}, f)


def graph_topk(index_dir: str, queries: dict[str, np.ndarray], k: int, *,
               ef_search: int = 64, metric: str = "cosine",
               round_decimals: int | None = None) -> pd.DataFrame:
    """Beam-search every partition graph, merge the per-partition top-k.

    One Ray task per partition (the per-leaf search of
    `JVectorReader.search`); the driver's merge is over
    num_parts * k rows only.
    """
    with open(os.path.join(index_dir, META_NAME)) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    kernel, translate, _ = METRICS[metric]
    rnd = _rounder(round_decimals)
    qids = sorted(queries)
    qmat = np.stack([queries[q] for q in qids]).astype(np.float64)
    qref = ray.put(qmat)
    parts = sorted(d for d in os.listdir(index_dir) if d.startswith("part="))

    def search_part(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        out_q, out_id, out_s = [], [], []
        for pdir in batch["dir"].to_pylist():
            tbl = pq.read_table(os.path.join(pdir, "graph.parquet"))
            with open(os.path.join(pdir, "_META")) as f:
                pmeta = json.load(f)
            vecs = _vecs_from_batch(tbl, vec_col)
            ids = tbl[id_col].to_numpy(zero_copy_only=False)
            nb_col = tbl["neighbors"].combine_chunks() \
                if isinstance(tbl["neighbors"], pa.ChunkedArray) else tbl["neighbors"]
            lens = np.diff(np.asarray(nb_col.offsets.to_numpy(zero_copy_only=False)))
            maxd = int(lens.max()) if len(lens) else 0
            nbrs = np.full((len(ids), max(1, maxd)), -1, dtype=np.int32)
            flat = nb_col.flatten().to_numpy(zero_copy_only=False)
            pos = 0
            for r, ln in enumerate(lens):
                nbrs[r, :ln] = flat[pos:pos + ln]
                pos += ln
            n_nbrs = lens.astype(np.int32)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = vecs / norms[:, None]
            for qi, qid in enumerate(qids):
                qn = qm[qi] / (np.linalg.norm(qm[qi]) or 1.0)
                found = _beam(unit, nbrs, n_nbrs, entries=pmeta["entries"],
                              q=qn, ef=max(ef_search, k))
                cand = np.array([v for _, v in found], dtype=np.int64)
                # EXACT metric scores for the candidates (graph prunes,
                # the score is never approximated — the rerank rule)
                score = rnd(translate(kernel(vecs[cand], qm[qi])))
                sel_ids, sel_sc = _partial_topk(ids[cand], score, k)
                out_q.extend([qid] * len(sel_ids))
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
    out = (out.sort_values(["query_id", "score", id_col],
                           ascending=[True, False, True], kind="mergesort")
              .groupby("query_id", sort=False).head(k))
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col, "score"]].reset_index(drop=True)
