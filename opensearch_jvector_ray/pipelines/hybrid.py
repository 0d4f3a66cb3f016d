"""Hybrid lexical+vector search with reciprocal-rank fusion.

The OpenSearch hybrid-search surface (public semantics: the RRF
score-ranker processor; Cormack/Clarke/Buettcher RRF, SIGIR'09): each
retriever contributes 1/(k0 + rank) for the docs in its top-``window``
list; a doc's fused score is the SUM over retrievers (missing list =>
0 contribution); final order (fused score DESC, id ASC), top-k.

Both retrievers here are this repo's own hash-matched engines — BM25
(`IndexSearcher.search`) and vector top-k (`brute_force_topk` with
round_decimals=6, the repo's vector-rank invariant) — so the fused
ranks are deterministic end-to-end and the DuckDB oracle
(`oracles.hybrid_rrf_sql`) reproduces them exactly.  Fusion itself is
driver-side over two result-sized frames (window x queries rows) — the
retrievers stay fully distributed.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def _fuse_tail(parts: "list[pd.Series]", id_col: str,
               k: int) -> pd.DataFrame:
    """Shared fusion tail (oracle-parity-critical — keep ONE copy):
    outer-join the per-retriever contribution series, sum in LIST ORDER
    (left-assoc, the oracle's ``+`` chain of COALESCEs — bit-equal fp),
    rank on (score desc, id asc), top-k with 1-based ranks."""
    wide = pd.concat(parts, axis=1)           # outer join across lists
    score = wide[0].fillna(0.0)
    for i in range(1, len(parts)):
        score = score + wide[i].fillna(0.0)   # pinned fp order
    out = score.rename("score").reset_index()
    out = out.sort_values(["query_id", "score", id_col],
                          ascending=[True, False, True],
                          kind="mergesort")
    out = out.groupby("query_id", sort=False).head(k)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    return out[["query_id", "rank", id_col,
                "score"]].reset_index(drop=True)


def rrf_fuse(result_lists: Sequence[pd.DataFrame], id_col: str, k: int,
             k0: float = 60.0) -> pd.DataFrame:
    """Fuse ranked result lists by RRF.

    Each frame carries (query_id, rank, ``id_col``).  Contributions are
    summed IN LIST ORDER (left-assoc — the oracle's ``+`` chain of
    COALESCEs), so the float is bit-equal on both sides.  Returns
    (query_id, rank, id_col, score) with rank 1..k per query.
    """
    parts = []
    for i, df in enumerate(result_lists):
        c = df[["query_id", id_col, "rank"]].copy()
        c["__c"] = 1.0 / (float(k0) + c["rank"].astype(np.float64))
        parts.append(c.set_index(["query_id", id_col])["__c"].rename(i))
    return _fuse_tail(parts, id_col, k)


def hybrid_search(searcher, emb_ds,
                  queries: dict[str, tuple[str, Sequence[float]]],
                  k: int = 10, window: int = 20, k0: float = 60.0,
                  metric: str = "cosine", id_col: str = "doc_id",
                  vec_id_col: str = "vec_id") -> pd.DataFrame:
    """Run BM25 and vector retrieval for each (text, vector) query pair
    and fuse by RRF.  Assumes the doc and vector tables share an id
    space (``vec_id == doc_id`` in the fixtures — one embedding per
    document, the standard hybrid-index layout)."""
    from opensearch_jvector_ray.pipelines.knn import brute_force_topk
    texts = {qid: t for qid, (t, _) in queries.items()}
    vecs = {qid: np.asarray(v, dtype=np.float64)
            for qid, (_, v) in queries.items()}
    bm25 = searcher.search(texts, k=window)
    knn = brute_force_topk(emb_ds, vecs, window, metric=metric,
                           id_col=vec_id_col, round_decimals=6)
    knn = knn.rename(columns={vec_id_col: id_col})
    return rrf_fuse([bm25, knn], id_col, k, k0)


def linear_fuse(result_lists: Sequence[pd.DataFrame], id_col: str,
                k: int, weights: Sequence[float] | None = None
                ) -> pd.DataFrame:
    """Min-max score normalization + weighted linear combination
    [OpenSearch hybrid-search normalization-processor public semantics:
    technique=min_max with weighted arithmetic combination].

    Each frame carries (query_id, ``id_col``, score) with ROUND-6
    scores — the repo's hash-matched retriever outputs, so the doubles
    are bit-identical to the oracle's CTE columns and the whole
    normalize/combine chain below is bit-equal by construction.
    Rule (documented, shared with the oracle): per (query, retriever)
    n = (s - min_q) / (max_q - min_q); max_q == min_q -> 1.0; a doc
    missing from a retriever's list contributes 0.0; fused =
    sum(w_i * n_i) in list order (pinned fp chain)."""
    ws = [1.0] * len(result_lists) if weights is None \
        else [float(w) for w in weights]
    if len(ws) != len(result_lists):
        raise ValueError("weights must match result_lists")
    parts = []
    for i, df in enumerate(result_lists):
        c = df[["query_id", id_col, "score"]].copy()
        s = c["score"].astype(np.float64)
        mn = s.groupby(c["query_id"]).transform("min")
        mx = s.groupby(c["query_id"]).transform("max")
        n = np.where(mx.to_numpy() > mn.to_numpy(),
                     (s.to_numpy() - mn.to_numpy())
                     / (mx.to_numpy() - mn.to_numpy()), 1.0)
        c["__n"] = ws[i] * n
        parts.append(c.set_index(["query_id", id_col])["__n"].rename(i))
    return _fuse_tail(parts, id_col, k)


def hybrid_linear_search(searcher, emb_ds,
                         queries: dict[str, tuple[str, Sequence[float]]],
                         k: int = 10, window: int = 20,
                         weights: tuple[float, float] = (1.0, 1.0),
                         metric: str = "cosine", id_col: str = "doc_id",
                         vec_id_col: str = "vec_id") -> pd.DataFrame:
    """hybrid_search's linear-combination sibling: BM25 + vector top-k
    fused by min-max normalization and a weighted sum.  Retriever
    scores are rounded to 6dp BEFORE fusion on BOTH sides (the repo's
    vector-rank invariant extended to score arithmetic)."""
    from opensearch_jvector_ray.pipelines.knn import brute_force_topk
    texts = {qid: t for qid, (t, _) in queries.items()}
    vecs = {qid: np.asarray(v, dtype=np.float64)
            for qid, (_, v) in queries.items()}
    bm25 = searcher.search(texts, k=window)
    bm25 = bm25.copy()
    bm25["score"] = np.round(bm25["score"].astype(np.float64), 6)
    knn = brute_force_topk(emb_ds, vecs, window, metric=metric,
                           id_col=vec_id_col, round_decimals=6)
    knn = knn.rename(columns={vec_id_col: id_col})
    return linear_fuse([bm25, knn], id_col, k, weights)
