"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators (beyond the reference's D1-D5 dedup
guards, SURVEY §2.7) expressed Ray-Data-first:

  exact     : normalized-text hash -> groupby(hash) -> min-id canonical
              (hash-partition + per-group first)
  minhash   : word shingles -> 64 minhash signature -> banded LSH
              (explode to (band, band_hash, id) rows -> groupby) ->
              candidate pairs -> exact-Jaccard verify -> connected
              components (driver union-find over the SMALL verified-pair
              set only; the heavy work stays distributed)
  simhash   : 64-bit weighted-token fingerprint; near-dup candidates by
              banded 16-bit chunks -> hamming verify
  ngram     : character n-gram Jaccard verification kernel (shared by the
              verify stages)

All hashing is deterministic across processes (pandas' stable siphash via
``pd.util.hash_array`` + fixed affine reseeding), so re-runs and retries
produce identical clusters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines.textstats import normalized_text

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_hash(strings: pa.Array) -> np.ndarray:
    return pd.util.hash_array(strings.to_numpy(zero_copy_only=False),
                              categorize=False)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                text_col: str) -> "rd.Dataset":
    """One row per distinct normalized text: (text_hash, canonical_id =
    min id, n_dups).  hash-partitioned groupby; the per-batch md5 keeps
    the shuffle narrow (hash column only)."""
    import hashlib

    def add_hash(batch: pa.Table) -> pa.Table:
        norm = normalized_text(batch[text_col].combine_chunks()
                               if isinstance(batch[text_col], pa.ChunkedArray)
                               else batch[text_col], cfg)
        hs = [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]
        return pa.table({"text_hash": pa.array(hs, type=pa.string()),
                         id_col: batch[id_col]})

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("text_hash")
              .aggregate(Min(id_col, alias_name="canonical_id"),
                         Count(alias_name="n_dups")))


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------

def word_shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def char_ngrams(text: str, n: int = 5) -> set[str]:
    if len(text) < n:
        return {text} if text else set()
    return {text[i:i + n] for i in range(len(text) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """Vectorized 64-permutation minhash over word shingles.

    Affine reseeding of one stable base hash: h_i(x) = (a_i*h(x)+b_i) mod
    (2^61-1) — the classic universal-hash family; parameters fixed by a
    seeded RNG so signatures are reproducible everywhere.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = pd.util.hash_array(np.array(sorted(shingles), dtype=object),
                                  categorize=False)
        # (n_shingles, num_perm) affine, min over shingles
        h = (base[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return h.min(axis=0)


def minhash_lsh_dedup(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                      text_col: str, *, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.6,
                      concurrency: int = 2) -> pd.DataFrame:
    """Near-duplicate clusters by MinHash+LSH.

    Returns a DataFrame (id, cluster_id) for every doc that belongs to a
    near-dup cluster (cluster_id = min member id).  Pipeline:

      map_batches(Signer actor: tokenize -> shingle -> minhash -> band
      hashes, one row per (band, band_hash, id))          [stateful: M4]
        -> groupby(band, band_hash)  [LSH bucket shuffle — bucket rows
           are (band_hash, id) pairs only, tiny vs the corpus]
        -> map_groups: emit candidate pairs per bucket
        -> verify stage: exact shingle-Jaccard per pair (pairs carry both
           texts — broadcast-free because pairs are few)
        -> driver union-find over verified pairs (small by construction)
    """
    rows_per_band = num_perm // bands
    rng = np.random.default_rng(42)
    perm_a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    perm_b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    MIX = np.uint64(0x9E3779B97F4A7C15)    # shingle hash combiner multiplier

    class Signer:
        """Fully vectorized per-batch minhash signer.

        Shingle hashes are built by combining consecutive TOKEN hashes
        (h = ((h0*MIX + h1)*MIX + h2) mod 2^64) — no shingle strings are
        ever materialized; signatures are a (windows x num_perm) affine
        transform min-reduced per document.  Stateless math, stable
        everywhere (pd.util.hash_array base + fixed seeds).
        """

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            from opensearch_jvector_ray.pipelines.textstats import _token_lists
            texts = batch[text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            lists = _token_lists(texts, cfg)
            flat = pc.list_flatten(lists)
            n_docs = batch.num_rows
            counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
            starts = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            th = pd.util.hash_array(flat.to_numpy(zero_copy_only=False),
                                    categorize=False)
            # shingle (window) hashes; docs shorter than k get ONE window
            # combining all their tokens (word_shingles semantics)
            n_tok = len(th)
            win_hash_parts, win_doc_parts = [], []
            full = counts >= shingle_k
            if full.any():
                sh = th[: n_tok - shingle_k + 1].copy() if n_tok >= shingle_k else np.zeros(0, np.uint64)
                for j in range(1, shingle_k):
                    sh = sh * MIX + th[j: n_tok - shingle_k + 1 + j]
                # a window starting at t is valid iff it stays inside its doc
                win_doc = np.repeat(np.arange(n_docs), counts)[: len(sh)]
                pos_in_doc = (np.arange(len(sh)) - starts[win_doc])
                valid = pos_in_doc <= (counts[win_doc] - shingle_k)
                win_hash_parts.append(sh[valid])
                win_doc_parts.append(win_doc[valid])
            short = np.flatnonzero((counts > 0) & (~full))
            for d in short.tolist():          # rare: docs with < k tokens
                h = th[starts[d]]
                for t in range(starts[d] + 1, starts[d + 1]):
                    h = h * MIX + th[t]
                win_hash_parts.append(np.array([h], dtype=np.uint64))
                win_doc_parts.append(np.array([d], dtype=np.int64))
            if win_hash_parts:
                wh = np.concatenate(win_hash_parts)
                wd = np.concatenate(win_doc_parts)
                order = np.argsort(wd, kind="stable")
                wh, wd = wh[order], wd[order]
            else:
                wh = np.zeros(0, dtype=np.uint64)
                wd = np.zeros(0, dtype=np.int64)

            sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max,
                           dtype=np.uint64)
            if len(wh):
                mat = (wh[:, None] * perm_a[None, :] + perm_b[None, :]) % _MERSENNE
                present = np.unique(wd)
                doc_starts = np.searchsorted(wd, present)
                sigs[present] = np.minimum.reduceat(mat, doc_starts, axis=0)

            # band hashes (one hash per 4-row band), vectorized per band
            ids = batch[id_col]
            parts = []
            bands_view = sigs.reshape(n_docs, bands, rows_per_band)
            for bidx in range(bands):
                view = np.ascontiguousarray(bands_view[:, bidx, :])
                bh = pd.util.hash_array(
                    view.view([("", np.uint64)] * rows_per_band).ravel())
                parts.append(pa.table({
                    "band": pa.array(np.full(n_docs, bidx, dtype=np.int32)),
                    "band_hash": pa.array(bh.astype(np.int64)),
                    id_col: ids,
                }))
            return pa.concat_tables(parts)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table({"id_a": pa.array(a_out), "id_b": pa.array(b_out)})

    pairs = (ds.map_batches(Signer, batch_format="pyarrow",
                            concurrency=concurrency, num_cpus=1)
               .groupby(["band", "band_hash"])
               .map_groups(bucket_pairs, batch_format="pyarrow")
               .to_pandas().drop_duplicates())
    if pairs.empty:
        return pd.DataFrame(columns=[id_col, "cluster_id"])

    # verify candidates with exact shingle Jaccard (candidate set is small:
    # fetch only the candidate docs' texts, broadcast-free)
    cand_ids = sorted(set(pairs.id_a) | set(pairs.id_b))
    texts = (ds.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            "__norm": normalized_text(
                                b[text_col].combine_chunks()
                                if isinstance(b[text_col], pa.ChunkedArray)
                                else b[text_col], cfg)}),
        batch_format="pyarrow")
        .filter(expr=f"{id_col} in {cand_ids!r}")
        .to_pandas())
    text_of = dict(zip(texts[id_col], texts["__norm"]))
    sh = {i: word_shingles((text_of.get(i) or "").split(), shingle_k)
          for i in cand_ids}
    verified = [(a, b) for a, b in zip(pairs.id_a, pairs.id_b)
                if jaccard(sh[a], sh[b]) >= threshold]

    # union-find over verified pairs (tiny)
    parent: dict = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    out = pd.DataFrame({id_col: members,
                        "cluster_id": [find(m) for m in members]})
    return out.reset_index(drop=True)


def ngram_jaccard_pairs(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                        text_col: str, *, n: int = 5,
                        threshold: float = 0.5,
                        lsh_threshold: float = 0.2) -> pd.DataFrame:
    """Character n-gram Jaccard near-dup pairs.

    Blocking: word-shingle MinHash-LSH candidates (near dups share words,
    so word-level banding is a sound blocker for char-level similarity);
    scoring: exact char-n-gram Jaccard on the normalized text of the
    (small) candidate set.  Returns (id_a, id_b, jaccard) pairs with
    jaccard >= threshold, rounded to 6.
    """
    clusters_or_pairs = minhash_lsh_dedup(ds, cfg, id_col, text_col,
                                          threshold=lsh_threshold)
    # minhash_lsh_dedup returns clusters; recover member pairs per cluster
    pairs = []
    for cid, grp in clusters_or_pairs.groupby("cluster_id"):
        ids = sorted(grp[id_col])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.append((ids[i], ids[j]))
    if not pairs:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    cand_ids = sorted({i for p in pairs for i in p})
    texts = (ds.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            "__norm": normalized_text(
                                b[text_col].combine_chunks()
                                if isinstance(b[text_col], pa.ChunkedArray)
                                else b[text_col], cfg)}),
        batch_format="pyarrow")
        .filter(expr=f"{id_col} in {cand_ids!r}")
        .to_pandas())
    text_of = dict(zip(texts[id_col], texts["__norm"]))
    grams = {i: char_ngrams(text_of.get(i) or "", n) for i in cand_ids}
    out = [(a, b, round(jaccard(grams[a], grams[b]), 6))
           for a, b in pairs if jaccard(grams[a], grams[b]) >= threshold]
    if not out:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    return (pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_stage(cfg: EngineConfig, id_col: str, text_col: str):
    """64-bit SimHash per doc (tf-weighted token hashes), vectorized."""
    def fn(batch: pa.Table) -> pa.Table:
        from opensearch_jvector_ray.analyze import tokenize
        stream = tokenize(batch[text_col], cfg)
        n = batch.num_rows
        out = np.zeros((n, 64), dtype=np.float64)
        if len(stream.doc_idx):
            h = pd.util.hash_array(stream.terms.to_numpy(zero_copy_only=False),
                                   categorize=False)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.float64) * 2.0 - 1.0
            np.add.at(out, stream.doc_idx, bits)
        sim = (out > 0).astype(np.uint64)
        vals = (sim << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1,
                                                                    dtype=np.uint64)
        return pa.table({id_col: batch[id_col],
                         "simhash": pa.array(vals.astype(np.int64))})
    return fn


def simhash_near_dups(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                      text_col: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4x16-bit chunks
    (any pair within hamming<=3 shares at least one chunk by pigeonhole
    when bits differ in <=3 of 4 chunks), groupby chunk, verify hamming."""
    sims = ds.map_batches(simhash_stage(cfg, id_col, text_col),
                          batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        v = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col]
        parts = []
        for c in range(4):
            chunk = ((v >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "chunk_id": pa.array(np.full(len(v), c, dtype=np.int32)),
                "chunk_val": pa.array(chunk),
                id_col: ids,
                "simhash": batch["simhash"],
            }))
        return pa.concat_tables(parts)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        hs = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                if d <= max_hamming:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo); b_out.append(hi); d_out.append(d)
        return pa.table({"id_a": pa.array(a_out), "id_b": pa.array(b_out),
                         "hamming": pa.array(d_out, type=pa.int32())})

    out = (sims.map_batches(explode, batch_format="pyarrow")
               .groupby(["chunk_id", "chunk_val"])
               .map_groups(pairs_in_bucket, batch_format="pyarrow")
               .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
    return (out.drop_duplicates(subset=["id_a", "id_b"])
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
