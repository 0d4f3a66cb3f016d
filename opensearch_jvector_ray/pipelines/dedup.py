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
# Above this many raw candidate-pair rows the single-task union distinct
# would concentrate too much in one worker; fall back to a groupby
# exchange (16 bytes/pair -> ~800 MB at the cap, well under a worker heap)
_UNION_MAX_PAIRS = 50_000_000


def _stable_hash(strings: pa.Array) -> np.ndarray:
    return pd.util.hash_array(strings.to_numpy(zero_copy_only=False),
                              categorize=False)


def _ds_schema(ds_: "rd.Dataset") -> pa.Schema:
    """Arrow schema of a Dataset, tolerating pandas-block schemas."""
    sch = ds_.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []    # pandas-block schema: names/types lists, numpy dtypes
    for n, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            t = pa.from_numpy_dtype(np.dtype(t))
        fields.append(pa.field(n, t))
    return pa.schema(fields)


def _distinct_pair_rows(raw: "rd.Dataset", extra_col: str | None = None,
                        extra_type=None) -> "rd.Dataset":
    """Distinct (id_a, id_b[, extra]) rows WITHOUT a hash shuffle: pair
    rows are candidate-sized by construction (bounded bucket edges), so
    per-block unique tasks + ONE union task suffice — the result stays
    in the object store and the driver never sees a row.  ``extra_col``
    must be pair-DETERMINED (e.g. a hamming distance), so unique over
    the triple equals unique over the pair.  Callers guard with
    ``_UNION_MAX_PAIRS`` and fall back to a groupby exchange."""
    import ray as _ray

    id_type = _ds_schema(raw).field("id_a").type
    if not pa.types.is_integer(id_type):
        # string (or other non-int) doc ids: the structured-dtype numpy
        # path below is int64-only — per-block pandas distinct + one
        # union task keeps the same off-driver shape
        cols = ["id_a", "id_b"] + ([extra_col] if extra_col else [])

        @_ray.remote
        def _blk_unique_any(t: pa.Table):
            if not t.num_rows:
                return None
            return t.select(cols).to_pandas().drop_duplicates()

        @_ray.remote
        def _distinct_any(*dfs) -> pa.Table:
            dfs = [d for d in dfs if d is not None and len(d)]
            if not dfs:
                out = {"id_a": pa.array([], type=id_type),
                       "id_b": pa.array([], type=id_type)}
                if extra_col:
                    out[extra_col] = pa.array(
                        [], type=extra_type or pa.int64())
                return pa.table(out)
            u = (pd.concat(dfs, ignore_index=True).drop_duplicates()
                 .sort_values(["id_a", "id_b"]))
            return pa.Table.from_pandas(u, preserve_index=False)

        ref = _distinct_any.remote(
            *[_blk_unique_any.remote(r) for r in raw.to_arrow_refs()])
        return rd.from_arrow_refs([ref])

    fields = [("a", np.int64), ("b", np.int64)]
    if extra_col:
        fields.append(("x", np.int64))
    pair_dtype = np.dtype(fields)

    @_ray.remote
    def _blk_unique(t: pa.Table):
        if not t.num_rows:
            return None
        arr = np.empty(t.num_rows, dtype=pair_dtype)
        arr["a"] = t.column("id_a").to_numpy(zero_copy_only=False)
        arr["b"] = t.column("id_b").to_numpy(zero_copy_only=False)
        if extra_col:
            arr["x"] = t.column(extra_col).to_numpy(zero_copy_only=False)
        return np.unique(arr)

    @_ray.remote
    def _distinct(*arrs) -> pa.Table:
        arrs = [a for a in arrs if a is not None and len(a)]
        if not arrs:
            cols = {"id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64())}
            if extra_col:
                cols[extra_col] = pa.array(
                    [], type=extra_type or pa.int64())
            return pa.table(cols)
        u = np.unique(np.concatenate(arrs))
        cols = {"id_a": pa.array(u["a"]), "id_b": pa.array(u["b"])}
        if extra_col:
            x = pa.array(u["x"])
            cols[extra_col] = x.cast(extra_type) if extra_type else x
        return pa.table(cols)

    ref = _distinct.remote(
        *[_blk_unique.remote(r) for r in raw.to_arrow_refs()])
    return rd.from_arrow_refs([ref])


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


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)   # shingle hash combiner


def _pair_jaccard(ha: np.ndarray, ra: np.ndarray,
                  hb: np.ndarray, rb: np.ndarray,
                  n_pairs: int) -> np.ndarray:
    """Vectorized exact Jaccard for a BATCH of pairs from per-row hash
    multisets (duplicates allowed — distinct-ing happens here): (ha, ra)
    are side A's (hash, row) window entries, likewise B.  ONE lexsort
    over the concatenation keyed (row, hash, side) does both the
    per-side distinct and the intersection count: after dropping
    same-(row, hash, side) repeats, an adjacent (row, hash) match is
    necessarily A-then-B — an intersection element.  Both-empty rows
    score 1.0 — the ``jaccard(set(), set())`` rule."""
    rows = np.concatenate([ra, rb])
    hs = np.concatenate([ha, hb])
    side = np.zeros(len(rows), dtype=np.uint8)
    side[len(ra):] = 1
    # lexsort is stable and A entries precede B in the concatenation,
    # so equal (row, hash) runs are already A-then-B — no side key
    order = np.lexsort((hs, rows))
    rows_s, hs_s, side_s = rows[order], hs[order], side[order]
    if len(rows_s):
        first = np.ones(len(rows_s), dtype=bool)
        first[1:] = ((rows_s[1:] != rows_s[:-1])
                     | (hs_s[1:] != hs_s[:-1])
                     | (side_s[1:] != side_s[:-1]))
        rows_s, hs_s, side_s = rows_s[first], hs_s[first], side_s[first]
    sa = np.bincount(rows_s[side_s == 0], minlength=n_pairs)
    sb = np.bincount(rows_s[side_s == 1], minlength=n_pairs)
    eq = np.zeros(len(rows_s), dtype=bool)
    if len(rows_s) > 1:
        eq[1:] = (rows_s[1:] == rows_s[:-1]) & (hs_s[1:] == hs_s[:-1])
    inter = np.bincount(rows_s[eq], minlength=n_pairs) \
        if eq.any() else np.zeros(n_pairs, dtype=np.int64)
    union = sa + sb - inter
    out = np.ones(n_pairs, dtype=np.float64)     # both-empty -> 1.0
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def _expand_windows(wh: np.ndarray, wd: np.ndarray, n_texts: int,
                    sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gather per-text windows for a selection of text indices: returns
    (hashes, selection-row indices) with row i carrying the windows of
    text ``sel[i]``.  Pure offset arithmetic — no Python loop."""
    counts = np.bincount(wd, minlength=n_texts)
    starts = np.zeros(n_texts + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    m = counts[sel]
    tot = int(m.sum())
    if tot == 0:
        return np.zeros(0, dtype=wh.dtype), np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(len(sel), dtype=np.int64), m)
    pos = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    return wh[np.repeat(starts[sel], m) + pos], rows


def _encoded_pair_jaccard(col_a, col_b, window_fn) -> np.ndarray:
    """Exact per-pair Jaccard with TEXT and PAIR dedup: candidate pairs
    repeat texts heavily (a near-dup cluster of size m yields ~m^2
    pairs over m texts, exact-dup clusters collapse to ONE unique
    pair), so windows are computed once per DISTINCT text and Jaccard
    once per DISTINCT (text_a, text_b) combination, then broadcast back
    to the pair rows.  ``window_fn(texts) -> (wh, wd)`` supplies the
    window hashes (word-shingle or char-n-gram)."""
    if isinstance(col_a, pa.ChunkedArray):
        col_a = col_a.combine_chunks()
    if isinstance(col_b, pa.ChunkedArray):
        col_b = col_b.combine_chunks()
    col_a = pc.fill_null(col_a, "")      # None text == empty text
    col_b = pc.fill_null(col_b, "")
    n_rows = len(col_a)
    enc_a, enc_b = pc.dictionary_encode(col_a), pc.dictionary_encode(col_b)
    ua = enc_a.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ub = enc_b.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key = ua * len(enc_b.dictionary) + ub
    uniq, inv = np.unique(key, return_inverse=True)
    sel_a = uniq // len(enc_b.dictionary)
    sel_b = uniq % len(enc_b.dictionary)
    wh_a, wd_a = window_fn(enc_a.dictionary)
    wh_b, wd_b = window_fn(enc_b.dictionary)
    ha, ra = _expand_windows(wh_a, wd_a, len(enc_a.dictionary), sel_a)
    hb, rb = _expand_windows(wh_b, wd_b, len(enc_b.dictionary), sel_b)
    js_u = _pair_jaccard(ha, ra, hb, rb, len(uniq))
    return js_u[inv] if n_rows else np.zeros(0, dtype=np.float64)


def _char_window_hashes(texts: pa.Array | pa.ChunkedArray,
                        n: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char n-gram hashes for a batch of texts: uint64
    rolling-mix over codepoints (``char_ngrams`` semantics — texts
    shorter than ``n`` get ONE window over all their chars; empty texts
    get none).  Returns (hashes, row indices), distinct-ness NOT
    applied.  Equality to string n-grams holds up to 64-bit collisions
    (the repo-wide shingle-hash rule)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = texts.to_pylist()
    n_docs = len(lst)
    joined = "".join(t or "" for t in lst)
    counts = np.fromiter((len(t or "") for t in lst), dtype=np.int64,
                         count=n_docs)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4") \
        .astype(np.uint64)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    MIX = _SHINGLE_MIX
    n_ch = len(cp)
    parts_h, parts_r = [], []
    full = counts >= n
    if full.any() and n_ch >= n:
        sh = cp[: n_ch - n + 1].copy()
        for j in range(1, n):
            sh = sh * MIX + cp[j: n_ch - n + 1 + j]
        win_doc = np.repeat(np.arange(n_docs), counts)[: len(sh)]
        pos = np.arange(len(sh)) - starts[win_doc]
        valid = pos <= (counts[win_doc] - n)
        parts_h.append(sh[valid])
        parts_r.append(win_doc[valid])
    short = np.flatnonzero((counts > 0) & (~full))
    for d in short.tolist():          # rare: texts with < n chars
        h = cp[starts[d]]
        for t in range(starts[d] + 1, starts[d + 1]):
            h = h * MIX + cp[t]
        parts_h.append(np.array([h], dtype=np.uint64))
        parts_r.append(np.array([d], dtype=np.int64))
    if parts_h:
        wh = np.concatenate(parts_h)
        wd = np.concatenate(parts_r)
        # DOC-CONTIGUOUS order is the _expand_windows offset contract:
        # the short-text windows above were appended AFTER the full-text
        # block, so a short doc preceding longer ones lands out of order
        # and the gather misattributes windows (wrong Jaccard).  Stable
        # sort by doc restores the contract (the sibling _window_hashes
        # sorts the same way).
        order = np.argsort(wd, kind="stable")
        return wh[order], wd[order]
    return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)


def _distinct_doc_windows(wh: np.ndarray,
                          wd: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (doc, window-hash) pairs: one lexsort + first-occurrence
    mask.  Shared by ``decontaminate`` and ``self_overlap``."""
    if not len(wh):
        return wh, wd
    order = np.lexsort((wh, wd))
    wh_s, wd_s = wh[order], wd[order]
    first = np.ones(len(wh_s), dtype=bool)
    first[1:] = (wd_s[1:] != wd_s[:-1]) | (wh_s[1:] != wh_s[:-1])
    return wh_s[first], wd_s[first]


def _window_hashes(texts: pa.Array, cfg: EngineConfig,
                   shingle_k: int,
                   return_counts: bool = False,
                   pre_tokenized: bool = False):
    """Vectorized word-shingle hashes for a batch of texts: returns
    ``(wh, wd)`` — uint64 window hashes and their doc indices, sorted by
    doc.  A window hash combines consecutive TOKEN hashes
    (h = ((h0*MIX + h1)*MIX + h2) mod 2^64) — no shingle strings are ever
    materialized; docs shorter than ``shingle_k`` get ONE window combining
    all their tokens (``word_shingles`` semantics).  Shared by the minhash
    signer and ``decontaminate``."""
    from opensearch_jvector_ray.pipelines.textstats import _token_lists

    MIX = _SHINGLE_MIX
    lists = _token_lists(texts, cfg, pre_tokenized=pre_tokenized)
    flat = pc.list_flatten(lists)
    n_docs = len(texts)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # hash via dictionary-encode: tokens repeat vocab-heavily, so hash
    # only the distinct strings and gather (bit-identical to hashing
    # the flat array directly — same per-value hash — measured ~10x)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dh = pd.util.hash_array(enc.dictionary.to_numpy(zero_copy_only=False),
                            categorize=False)
    th = dh[enc.indices.to_numpy(zero_copy_only=False)]
    n_tok = len(th)
    win_hash_parts, win_doc_parts = [], []
    full = counts >= shingle_k
    if full.any():
        sh = (th[: n_tok - shingle_k + 1].copy()
              if n_tok >= shingle_k else np.zeros(0, np.uint64))
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
    if return_counts:
        return wh, wd, counts
    return wh, wd


# ---------------------------------------------------------------------------
# shared near-dup machinery: bounded bucket edges + distributed pair verify
# ---------------------------------------------------------------------------

def bounded_bucket_edges(ids_sorted: np.ndarray, cap: int = 512,
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Candidate edges for one LSH bucket, with BOUNDED cost.

    Buckets up to ``cap`` members emit all pairs (vectorized triu — exact);
    oversize buckets emit star edges (min-id hub -> member), so a hot
    bucket (boilerplate docs sharing a band hash) costs O(n) rows instead
    of O(n^2).  Star edges trade transitive-only pairs for boundedness —
    members similar to the hub still cluster via union-find; this is the
    standard web-dedup compromise for degenerate buckets.
    """
    n = len(ids_sorted)
    if n < 2:
        z = np.zeros(0, dtype=ids_sorted.dtype)
        return z, z
    if n <= cap:
        iu = np.triu_indices(n, k=1)
        return ids_sorted[iu[0]], ids_sorted[iu[1]]
    hub = np.full(n - 1, ids_sorted[0], dtype=ids_sorted.dtype)
    return hub, ids_sorted[1:]


# per-WORKER-PROCESS cache of structures assembled from object-store
# block refs: the first task on a worker pays the ray.get + build, later
# tasks (and batches) reuse it — once-per-worker state without the actor
# spin-up cost an actor pool would add to every pipeline execution
_REF_CACHE: dict = {}


def _cached_from_refs(refs: tuple, build):
    key = (tuple(r.hex() for r in refs), build.__name__)
    hit = _REF_CACHE.get(key)
    if hit is None:
        import ray as _ray
        tbls = [t for t in _ray.get(list(refs)) if t.num_rows]
        hit = build(tbls)
        if len(_REF_CACHE) >= 8:        # bound worker-resident state
            _REF_CACHE.pop(next(iter(_REF_CACHE)))
        _REF_CACHE[key] = hit
    return hit


def _make_broadcast_attach(refs: tuple, id_col: str, payload_col: str):
    """Attach stage for the broadcast plan: the candidate payload lookup
    (an Arrow value_set for ``pc.index_in``) is assembled once per WORKER
    from shared object-store blocks — never per batch — and each batch
    is joined fully vectorized."""

    def _build_attach_lut(tbls):
        if tbls:
            cat = pa.concat_tables(tbls).combine_chunks()
            return (cat[id_col].combine_chunks(),
                    cat[payload_col].combine_chunks())
        return (pa.array([], type=pa.int64()),
                pa.array([], type=pa.string()))

    def attach(batch: pa.Table) -> pa.Table:
        ids, pay = _cached_from_refs(refs, _build_attach_lut)
        ia = pc.index_in(batch.column("id_a").combine_chunks(),
                         value_set=ids)
        ib = pc.index_in(batch.column("id_b").combine_chunks(),
                         value_set=ids)
        # drop pairs whose payload is missing (inner-join semantics)
        keep = pc.and_(pc.is_valid(ia), pc.is_valid(ib))
        batch = batch.filter(keep)
        ia, ib = ia.filter(keep), ib.filter(keep)
        out = batch.append_column("text_a", pc.take(pay, ia))
        return out.append_column("text_b", pc.take(pay, ib))

    return attach


def attach_pair_payloads(pairs: "rd.Dataset", payload_ds: "rd.Dataset",
                         id_col: str, payload_col: str,
                         num_parts: int = 64,
                         n_candidate_ids: int | None = None,
                         broadcast_max_ids: int = 100_000) -> "rd.Dataset":
    """Attach per-id payloads (texts, vectors) to BOTH sides of a candidate
    pair Dataset — distributed, nothing corpus-sized on the driver.

    ``payload_ds`` must already be restricted to candidate ids (small by
    construction: candidates are near-dup suspects).  Two physical plans:

    - **broadcast** (candidate set <= broadcast_max_ids): the candidate
      payload blocks stay in the object store (``to_arrow_refs``) and each
      pairs batch attaches both sides from the shared table — ONE stage,
      no shuffle (the small-side broadcast-join rule).
    - **co-partition** (large candidate sets): each side is attached by
      one hash-co-partitioned shuffle of (pairs + candidate payloads):
      rows are tag-unioned into a shared schema, bucketed by hash(key) %
      num_parts, and each bucket joined VECTORIZED (pandas merge) inside
      map_groups — one Python call per bucket, never per key.

    Output columns: id_a, id_b, text_a, text_b (payloads as text_*).
    """
    if n_candidate_ids is not None and n_candidate_ids <= broadcast_max_ids:
        refs = tuple(payload_ds.to_arrow_refs())
        return pairs.map_batches(
            _make_broadcast_attach(refs, id_col, payload_col),
            batch_format="pyarrow")
    def _attach(side: str, pair_cols: tuple, pair_types: dict):
        # pair_cols/pair_types passed explicitly: these fns execute LAZILY
        # (when the dataset is consumed), after the loop has moved on
        key_of = "id_a" if side == "a" else "id_b"
        out_col = f"text_{side}"

        def tag_pairs(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in b.column_names}
            cols["__key"] = b[key_of]
            cols["__pay"] = pa.nulls(b.num_rows, type=payload_type)
            cols["__side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
            return pa.table(cols)

        def tag_payload(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {c: pa.nulls(n, type=pair_types[c])
                    for c in pair_cols}
            cols["__key"] = b[id_col]
            cols["__pay"] = b[payload_col]
            cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
            return pa.table(cols)

        def bucket(b: pa.Table) -> pa.Table:
            k = b["__key"].to_numpy(zero_copy_only=False)
            part = (pd.util.hash_array(np.asarray(k), categorize=False)
                    % np.uint64(num_parts)).astype(np.int32)
            return b.append_column("__part", pa.array(part))

        def join_bucket(df: pd.DataFrame) -> pa.Table:
            pay = df[df["__side"] == 0][["__key", "__pay"]]
            pr = df[df["__side"] == 1][list(pair_cols)]
            merged = pr.merge(pay, left_on=key_of, right_on="__key",
                              how="inner")
            # rebuild an EXPLICITLY-typed arrow table (payloads may be
            # strings or vectors — pandas object dtype loses the type)
            cols = {c: pa.array(merged[c].tolist(), type=pair_types[c])
                    for c in pair_cols}
            cols[out_col] = pa.array(merged["__pay"].tolist(),
                                     type=payload_type)
            return pa.table(cols)

        return tag_pairs, tag_payload, bucket, join_bucket

    payload_type = _ds_schema(payload_ds).field(payload_col).type
    cur = pairs
    for side in ("a", "b"):
        sch = _ds_schema(cur)
        tag_pairs, tag_payload, bucket, join_bucket = _attach(
            side, tuple(sch.names), {f.name: f.type for f in sch})
        unioned = (cur.map_batches(tag_pairs, batch_format="pyarrow")
                   .union(payload_ds.map_batches(tag_payload,
                                                 batch_format="pyarrow")))
        cur = (unioned.map_batches(bucket, batch_format="pyarrow")
               .groupby("__part")
               .map_groups(join_bucket, batch_format="pandas"))
    return cur


def candidate_payloads(ds: "rd.Dataset", pairs: "rd.Dataset", id_col: str,
                       make_payload) -> tuple["rd.Dataset", int]:
    """Corpus scan restricted to the ids appearing in ``pairs``.

    The DISTINCT candidate ids are computed off-driver: one raw Ray task
    per pair block does the per-block unique, ONE union task combines
    them and leaves the result in the object store (the driver holds a
    ref and a count, never the ids).  Raw tasks over ``to_arrow_refs()``
    — callers pass a MATERIALIZED pairs Dataset, so this skips a whole
    extra streaming-executor run over tiny blocks (pure stage latency at
    small scale).  The corpus scan then streams and keeps only candidate
    rows, transformed by ``make_payload(batch) -> Table``.  Returns
    (payload_ds, n_candidate_ids) — the count picks the attach plan
    (broadcast vs co-partition).
    """
    import ray as _ray

    @_ray.remote
    def _blk_ids(t: pa.Table):
        if not t.num_rows:
            return None
        both = np.concatenate([
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False)])
        return np.unique(both)

    @_ray.remote
    def _union(*arrs):
        arrs = [a for a in arrs if a is not None and len(a)]
        return (np.unique(np.concatenate(arrs)) if arrs
                else np.empty(0, dtype=np.int64))

    cand_ref = _union.remote(
        *[_blk_ids.remote(r) for r in pairs.to_arrow_refs()])

    @_ray.remote
    def _size(a) -> int:
        return int(len(a))

    n_ids = _ray.get(_size.remote(cand_ref))   # only the COUNT reaches
    # the driver; the id array itself stays in the object store

    def keep(batch: pa.Table) -> pa.Table:
        cand = _ray.get(cand_ref)       # zero-copy per task
        mask = np.isin(batch[id_col].to_numpy(zero_copy_only=False), cand)
        return make_payload(batch.filter(pa.array(mask)))

    payload_ds = ds.map_batches(keep, batch_format="pyarrow")
    return payload_ds, n_ids


def attach_pair_texts(pairs: "rd.Dataset", ds: "rd.Dataset",
                      cfg: EngineConfig, id_col: str,
                      text_col: str) -> "rd.Dataset":
    """Normalized-text payload attach (see attach_pair_payloads)."""
    def payload(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pa.table({id_col: batch[id_col],
                         "__payload": normalized_text(col, cfg)})

    texts, n_ids = candidate_payloads(ds, pairs, id_col, payload)
    return attach_pair_payloads(pairs, texts, id_col, "__payload",
                                n_candidate_ids=n_ids)


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


def minhash_candidate_pairs(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                            text_col: str, *, num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3,
                            concurrency: int = 2,
                            bucket_cap: int = 512) -> "rd.Dataset":
    """Distinct candidate pairs (id_a, id_b) by MinHash+LSH banding.

    Pipeline (all distributed, bucket cost BOUNDED):

      map_batches(Signer: tokenize -> shingle -> minhash -> band hashes,
      one row per (band, band_hash, id))                   [stateful: M4]
        -> groupby(band, band_hash)  [LSH bucket shuffle — bucket rows
           are (band_hash, id) pairs only, tiny vs the corpus]
        -> map_groups: BOUNDED candidate edges per bucket (all pairs up to
           ``bucket_cap`` members, star edges above — a hot bucket costs
           O(n), never O(n^2))
        -> distinct across bands via per-block unique + ONE union task
           (pair rows are candidate-sized, so no second hash shuffle —
           the result stays in the object store as one Arrow block)

    ``concurrency`` is accepted for signature stability but is
    DELIBERATELY unused: the signer is pure math with no per-actor
    state, so it runs on the unbounded task pool — capping it would
    only idle CPUs.  (Documented rather than removed: callers thread
    it through and an API break buys nothing.)
    """
    if num_perm % bands:
        # the signer reshapes (n_docs, bands, num_perm // bands): a
        # non-divisible pair used to surface as a remote-task reshape
        # traceback instead of a clear parameter error
        raise ValueError(f"num_perm={num_perm} must be divisible by "
                         f"bands={bands}")
    rows_per_band = num_perm // bands
    rng = np.random.default_rng(42)
    perm_a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    perm_b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    MIX = _SHINGLE_MIX                     # band-offset mixing constant

    class Signer:
        """Fully vectorized per-batch minhash signer.

        Shingle hashes are built by combining consecutive TOKEN hashes
        (h = ((h0*MIX + h1)*MIX + h2) mod 2^64) — no shingle strings are
        ever materialized; signatures are a (windows x num_perm) affine
        transform min-reduced per document.  Stateless math, stable
        everywhere (pd.util.hash_array base + fixed seeds).
        """

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            n_docs = batch.num_rows
            wh, wd = _window_hashes(texts, cfg, shingle_k)

            sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max,
                           dtype=np.uint64)
            if len(wh):
                mat = (wh[:, None] * perm_a[None, :] + perm_b[None, :]) % _MERSENNE
                present = np.unique(wd)
                doc_starts = np.searchsorted(wd, present)
                sigs[present] = np.minimum.reduceat(mat, doc_starts, axis=0)

            # FUSED single-int64 bucket key per (band, band_hash): the
            # band index is mixed into the hash in the signer itself, so
            # the LSH shuffle sorts ONE key column instead of two and
            # ships half the key bytes.  A cross-band hash collision only
            # merges two buckets — extra candidate pairs, pruned by the
            # exact verify (never a miss).
            ids = batch[id_col]
            parts = []
            bands_view = sigs.reshape(n_docs, bands, rows_per_band)
            for bidx in range(bands):
                view = np.ascontiguousarray(bands_view[:, bidx, :])
                bh = pd.util.hash_array(
                    view.view([("", np.uint64)] * rows_per_band).ravel())
                # band offset precomputed as a wrapped python int: numpy
                # scalar uint64 multiply emits a RuntimeWarning per task
                # (log-forwarded by every worker), and astype(int64) warns
                # on out-of-range — .view reinterprets the same bits
                off = np.uint64((bidx * int(MIX)) & 0xFFFFFFFFFFFFFFFF)
                key = (bh + off).view(np.int64)
                parts.append(pa.table({
                    "bucket": pa.array(key),
                    id_col: ids,
                }))
            return pa.concat_tables(parts)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group[id_col].to_numpy(zero_copy_only=False))
        a, b = bounded_bucket_edges(ids, cap=bucket_cap)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    # Signer is pure math (no per-actor state): run it on the TASK pool —
    # an instance is a plain UDF, so no actor spin-up cost
    raw = (ds.map_batches(Signer(), batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pyarrow")
             .materialize())

    # distinct across bands WITHOUT a second hash shuffle: pair rows are
    # candidate-sized by construction (bounded bucket edges), so the
    # same off-driver shape as candidate_payloads suffices — per-block
    # unique tasks + ONE union task; the result stays in the object
    # store and the driver never sees a row.  This replaces a full
    # groupby((id_a, id_b)) exchange with two raw-task rounds — pure
    # stage-latency savings.  GUARD: the union task holds every unique
    # pair at once, so above _UNION_MAX_PAIRS raw rows (very high dup
    # density at large scale) fall back to the fully-distributed
    # groupby distinct — same output, one extra exchange, bounded tasks.
    if raw.count() > _UNION_MAX_PAIRS:
        from ray.data.aggregate import Count
        return (raw.groupby(["id_a", "id_b"])
                   .aggregate(Count(alias_name="__n"))
                   .drop_columns(["__n"])
                   .materialize())

    return _distinct_pair_rows(raw)


def _hash_part(arr: np.ndarray, num_parts: int) -> np.ndarray:
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64)
    return (pd.util.hash_array(np.asarray(arr), categorize=False)
            % np.uint64(num_parts)).astype(np.int64)


def pairs_components(pairs: "rd.Dataset", *, num_parts: int = 32,
                     max_iters: int = 64) -> "rd.Dataset":
    """Distributed connected components over a pair Dataset (id_a, id_b)
    — the scale path for the dedup cluster step when the verified-pair
    set outgrows the driver union-find (mirror-heavy crawls).

    Hash-to-min label propagation with pointer jumping [the public
    MapReduce connected-components family, e.g. Kiveris et al. 2014]:
    every node starts labelled min(self, neighbors); each iteration
    (a) pushes each node's label to its neighbors and re-minimizes per
    node, then (b) pointer-jumps label <- label[label] — label chains
    halve, so the loop converges in O(log diameter) iterations.  Labels
    only decrease, therefore the fixpoint is exactly the min member id
    per component — identical to the driver union-find rule (pandas/
    numpy min == Python min for both int and str ids).

    Physical plan: RAW Ray tasks over ``num_parts`` hash shards — the
    documented last-resort shape for ITERATIVE algorithms (a Dataset
    re-plans a multi-shuffle graph per iteration; measured ~10-90s of
    executor overhead per iteration at toy scale vs ~0.1s here).  Edges
    are sharded ONCE by hash(node); per iteration each shard task ships
    only (node, label) arrays to peer shards (a P x P exchange of
    1/P-sized blocks — the same volume as one co-partitioned shuffle),
    and the driver sees only per-shard changed-counts (exact fixpoint
    detection) and object refs — never pairs or labels.  Returns a
    Dataset (id, cluster_id), one row per node appearing in ``pairs``.
    """
    import ray as _ray
    P = int(num_parts)
    id_type = _ds_schema(pairs).field("id_a").type

    @_ray.remote(num_returns=P)
    def split_edges(t: pa.Table):
        # symmetric emit, partitioned by hash(node): shard p owns every
        # (node, nbr) adjacency row with hash(node) % P == p
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        part = _hash_part(node, P)
        outs = tuple((node[part == p], nbr[part == p]) for p in range(P))
        return outs if P > 1 else outs[0]

    @_ray.remote
    def build_shard(*parts):
        # static adjacency for one shard (deduped) + initial labels
        # lab[node] = min(node, neighbors)
        df = pd.DataFrame({
            "node": np.concatenate([x[0] for x in parts]),
            "nbr": np.concatenate([x[1] for x in parts]),
        }).drop_duplicates()
        edges = (df["node"].to_numpy(), df["nbr"].to_numpy())
        nb_min = df.groupby("node", sort=False)["nbr"].min()
        idx = nb_min.index.to_numpy()
        vals = nb_min.to_numpy()
        lab = pd.Series(np.where(vals <= idx, vals, idx), index=idx)
        return edges, lab

    @_ray.remote(num_returns=P)
    def push(shard, lab):
        # propagate my label across each edge, partitioned by the
        # RECEIVING node's shard
        node, nbr = shard[0]
        contrib = lab.loc[node].to_numpy()
        part = _hash_part(nbr, P)
        outs = tuple((nbr[part == p], contrib[part == p])
                     for p in range(P))
        return outs if P > 1 else outs[0]

    @_ray.remote(num_returns=2)
    def reduce_min(lab, *incoming):
        ns = np.concatenate([x[0] for x in incoming]
                            + [lab.index.to_numpy()])
        ls = np.concatenate([x[1] for x in incoming] + [lab.to_numpy()])
        s = pd.Series(ls, index=ns).groupby(level=0, sort=False).min()
        s = s.loc[lab.index]
        changed = int((s.to_numpy() != lab.to_numpy()).sum())
        return s, changed

    @_ray.remote(num_returns=P)
    def jump_query(lab):
        # ask the shard that OWNS my label value for that label's label
        x = lab.index.to_numpy()
        l = lab.to_numpy()
        part = _hash_part(l, P)
        outs = tuple((x[part == p], l[part == p]) for p in range(P))
        return outs if P > 1 else outs[0]

    @_ray.remote(num_returns=P)
    def jump_answer(lab, *queries):
        xs = np.concatenate([q[0] for q in queries])
        ls = np.concatenate([q[1] for q in queries])
        new = lab.loc[ls].to_numpy()        # label-of-label
        part = _hash_part(xs, P)
        outs = tuple((xs[part == p], new[part == p]) for p in range(P))
        return outs if P > 1 else outs[0]

    @_ray.remote(num_returns=2)
    def jump_collect(lab, *answers):
        xs = np.concatenate([a[0] for a in answers])
        ls = np.concatenate([a[1] for a in answers])
        s = pd.Series(ls, index=xs).loc[lab.index]
        changed = int((s.to_numpy() != lab.to_numpy()).sum())
        return s, changed

    @_ray.remote
    def shard_table(lab):
        return pa.table({
            "id": pa.array(lab.index.to_numpy(), type=id_type),
            "cluster_id": pa.array(lab.to_numpy(), type=id_type)})

    def _mat(x):
        return [x] if P == 1 else list(x)

    blocks = pairs.materialize().to_arrow_refs()
    splits = [_mat(split_edges.remote(r)) for r in blocks]
    shards = [build_shard.remote(*[splits[j][p] for j in range(len(splits))])
              for p in range(P)]

    @_ray.remote
    def shard_labels(shard):
        return shard[1]

    labs = [shard_labels.remote(s) for s in shards]
    for _ in range(max_iters):
        pushed = [_mat(push.remote(shards[p], labs[p])) for p in range(P)]
        red = [reduce_min.remote(labs[p], *[pushed[j][p] for j in range(P)])
               for p in range(P)]
        labs = [r[0] for r in red]
        ch1 = sum(_ray.get([r[1] for r in red]))
        q = [_mat(jump_query.remote(labs[p])) for p in range(P)]
        ans = [_mat(jump_answer.remote(labs[p], *[q[j][p] for j in range(P)]))
               for p in range(P)]
        col = [jump_collect.remote(labs[p], *[ans[j][p] for j in range(P)])
               for p in range(P)]
        labs = [c[0] for c in col]
        ch2 = sum(_ray.get([c[1] for c in col]))
        if ch1 == 0 and ch2 == 0:
            break
    return rd.from_arrow_refs([shard_table.remote(l) for l in labs])


def minhash_lsh_dedup(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                      text_col: str, *, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.6,
                      concurrency: int = 2,
                      bucket_cap: int = 512,
                      uf_max_pairs: int = 2_000_000,
                      as_dataset: bool = False,
                      driver_result_cap: int = 20_000_000
                      ) -> "pd.DataFrame | rd.Dataset":
    """Near-duplicate clusters by MinHash+LSH.

    Returns a DataFrame (id, cluster_id) for every doc that belongs to a
    near-dup cluster (cluster_id = min member id).  Candidates come from
    ``minhash_candidate_pairs``; verification is exact shingle-Jaccard per
    pair, DISTRIBUTED (candidate texts co-grouped onto the pairs Dataset
    via attach_pair_payloads, scored inside map_batches).

    Clustering: verified pairs up to ``uf_max_pairs`` run the driver
    union-find (typical dup densities — pair-count-sized, ~100 MB at the
    default cap); beyond it (mirror-heavy crawls where the verified set
    grows with the corpus) the distributed ``pairs_components``
    propagation takes over, bit-identical clusters (pytest-gated), with
    the verified pairs staying in the object store throughout.

    ``as_dataset=True`` returns the (id, cluster_id) labels as a
    Dataset instead of pandas — the 100-TB shape, where the clustered-
    doc count itself is corpus-scale and the caller anti-joins /
    writes it without ever landing it on the driver.  With the default
    pandas return, ``driver_result_cap`` bounds the materialization:
    more clustered docs than the cap raises instead of silently
    building a corpus-sized driver frame.
    """
    pairs = minhash_candidate_pairs(ds, cfg, id_col, text_col,
                                    num_perm=num_perm, bands=bands,
                                    shingle_k=shingle_k,
                                    concurrency=concurrency,
                                    bucket_cap=bucket_cap)

    # distributed verify: pairs co-grouped with the candidate docs' texts
    # (two candidate-sized shuffles), exact shingle Jaccard per pair inside
    # map_batches — nothing doc-sized ever lands on the driver
    def _verify(batch: pa.Table) -> pa.Table:
        # vectorized shingle-hash Jaccard over the whole pair batch:
        # texts arrive analyzer-normalized from attach_pair_texts, so
        # _window_hashes reproduces word_shingles(text.split()) up to
        # 64-bit hash collisions (the repo-wide shingle-hash rule) —
        # no per-pair Python set construction
        js = _encoded_pair_jaccard(
            batch["text_a"], batch["text_b"],
            lambda t: _window_hashes(t, cfg, shingle_k,
                                     pre_tokenized=True))
        return batch.filter(pa.array(js >= threshold)) \
                    .select(["id_a", "id_b"])

    verified_ds = attach_pair_texts(
        pairs, ds, cfg, id_col, text_col).map_batches(
            _verify, batch_format="pyarrow").materialize()
    n_verified = verified_ds.count()
    if not n_verified:
        if as_dataset:
            return rd.from_arrow(pa.table(
                {id_col: pa.array([], type=_ds_schema(
                    verified_ds).field("id_a").type),
                 "cluster_id": pa.array([], type=_ds_schema(
                     verified_ds).field("id_a").type)}))
        return pd.DataFrame(columns=[id_col, "cluster_id"])
    if n_verified > uf_max_pairs:
        # scale path: the verified set is too big to pull to the driver
        # — distributed min-label propagation; only the RESULT (one row
        # per clustered doc) lands here, and only under the cap
        labels = pairs_components(verified_ds)
        labels = labels.map_batches(
            lambda t: t.rename_columns([id_col, "cluster_id"]),
            batch_format="pyarrow")
        if as_dataset:
            return labels
        n_labels = labels.count()
        if n_labels > driver_result_cap:
            raise ValueError(
                f"{n_labels} clustered docs exceed driver_result_cap="
                f"{driver_result_cap}; pass as_dataset=True and keep "
                f"the labels distributed (anti-join / write_parquet)")
        out = labels.to_pandas()
        return out.sort_values(id_col).reset_index(drop=True)
    verified = [(a, b)
                for t in verified_ds.iter_batches(batch_format="pyarrow")
                for a, b in zip(t["id_a"].to_pylist(),
                                t["id_b"].to_pylist())]
    # union-find over verified pairs only (small by construction)
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
    out = out.reset_index(drop=True)
    return rd.from_pandas(out) if as_dataset else out


def ngram_jaccard_pairs(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                        text_col: str, *, n: int = 5,
                        threshold: float = 0.5,
                        lsh_threshold: float = 0.2) -> pd.DataFrame:
    """Character n-gram Jaccard near-dup pairs.

    Blocking: word-shingle MinHash-LSH CANDIDATE PAIRS (near dups share
    words, so word-level banding is a sound blocker for char-level
    similarity — and candidate pairs are used directly, so no pair is
    lost to a collapsed cluster); scoring: exact char-n-gram Jaccard per
    pair, distributed (texts co-grouped onto the pairs Dataset), computed
    ONCE per pair.  Returns (id_a, id_b, jaccard) with jaccard >=
    threshold, rounded to 6.  ``lsh_threshold`` only documents the banding
    operating point; the banding params are the defaults.
    """
    pairs = minhash_candidate_pairs(ds, cfg, id_col, text_col)

    def _score(batch: pa.Table) -> pa.Table:
        # vectorized char-n-gram Jaccard across the pair batch (rolling
        # codepoint hash == char_ngrams strings up to 64-bit collisions)
        js = _encoded_pair_jaccard(
            batch["text_a"], batch["text_b"],
            lambda t: _char_window_hashes(t, n))
        out = batch.select(["id_a", "id_b"]).append_column(
            "jaccard", pa.array(np.round(js, 6)))
        return out.filter(pa.array(js >= threshold))

    out = (attach_pair_texts(pairs, ds, cfg, id_col, text_col)
           .map_batches(_score, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (byte-LUT, no Python loop)."""
    b = np.ascontiguousarray(x).view(np.uint8)
    return _POP8[b].reshape(*x.shape, 8).sum(axis=-1, dtype=np.int32)


def _md5_u64(terms: np.ndarray) -> np.ndarray:
    """First 8 bytes of md5(term) as uint64 — the SQL-shared hash family
    (DuckDB: ('0x' || substr(md5(term),1,16))::UBIGINT).  Hashing runs per
    UNIQUE term only; occurrences are gathered back vectorized."""
    import hashlib
    uniq, inv = np.unique(terms, return_inverse=True)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
         for t in uniq), dtype=np.uint64, count=len(uniq))
    return hu[inv]


def simhash_stage(cfg: EngineConfig, id_col: str, text_col: str):
    """64-bit SimHash per doc: tf-weighted ±1 votes of md5-derived token
    bits (integer votes — no fp ties), vectorized."""
    def fn(batch: pa.Table) -> pa.Table:
        from opensearch_jvector_ray.analyze import tokenize
        stream = tokenize(batch[text_col], cfg)
        n = batch.num_rows
        votes = np.zeros((n, 64), dtype=np.int64)
        if len(stream.doc_idx):
            h = _md5_u64(stream.terms.to_numpy(zero_copy_only=False))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64) * 2 - 1
            np.add.at(votes, stream.doc_idx, bits)
        sim = (votes > 0).astype(np.uint64)
        vals = (sim << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1,
                                                                    dtype=np.uint64)
        return pa.table({id_col: batch[id_col],
                         "simhash": pa.array(vals.astype(np.int64))})
    return fn


def _bucket_hamming_pairs(ids: np.ndarray, hs: np.ndarray, max_h: int,
                          cap: int = 4096, window: int = 128,
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i<j) pairs within hamming<=max_h inside one bucket — BOUNDED.

    Buckets <= cap: exact, block-vectorized all-pairs popcount.  Oversize
    buckets: Manku-style sorted sliding window (sort by fingerprint, each
    row vs its next ``window`` neighbours — O(n*window), approximate only
    in the degenerate hot-bucket case, and near-equal fingerprints sort
    adjacently so real near-dups survive).
    """
    n = len(ids)
    a_out, b_out, d_out = [], [], []
    if n < 2:
        pass
    elif n <= cap:
        blk = 512
        for i0 in range(0, n, blk):
            hi = hs[i0:i0 + blk]
            d = _popcount_u64(hi[:, None] ^ hs[None, :])
            ii, jj = np.nonzero(d <= max_h)
            keep = (ii + i0) < jj          # strict upper triangle
            a_out.append(ids[ii[keep] + i0])
            b_out.append(ids[jj[keep]])
            d_out.append(d[ii[keep], jj[keep]])
    else:
        order = np.lexsort((ids, hs))
        sh, sid = hs[order], ids[order]
        for w in range(1, min(window, n - 1) + 1):
            d = _popcount_u64(sh[:-w] ^ sh[w:])
            hit = d <= max_h
            a_out.append(sid[:-w][hit])
            b_out.append(sid[w:][hit])
            d_out.append(d[hit].astype(d.dtype))
    if not a_out:
        z = np.zeros(0, dtype=ids.dtype)
        return z, z, np.zeros(0, dtype=np.int32)
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    d = np.concatenate(d_out).astype(np.int32)
    lo, hi_ = np.minimum(a, b), np.maximum(a, b)
    return lo, hi_, d


def simhash_near_dups(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                      text_col: str, max_hamming: int = 3,
                      bucket_cap: int = 4096) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4x16-bit chunks —
    EXACT blocking for max_hamming<=3 (pigeonhole: <=3 differing bits can
    ruin at most 3 of the 4 chunks, so every qualifying pair shares at
    least one chunk) — groupby chunk, verify hamming vectorized with
    bounded per-bucket cost (_bucket_hamming_pairs).  With md5-derived
    token bits the whole operator is deterministic AND DuckDB-expressible
    (oracles.simhash_sql reproduces it symbol-for-symbol)."""
    if max_hamming > 3:
        raise ValueError("4x16-bit banding is exact only for max_hamming<=3; "
                         "use more/narrower chunks for a wider radius")
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
        ids = group[id_col].to_numpy(zero_copy_only=False)
        hs = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        a, b, d = _bucket_hamming_pairs(ids, hs, max_hamming, cap=bucket_cap)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b),
                         "hamming": pa.array(d, type=pa.int32())})

    raw = (sims.map_batches(explode, batch_format="pyarrow")
               .groupby(["chunk_id", "chunk_val"])
               .map_groups(pairs_in_bucket, batch_format="pyarrow")
               .materialize())
    # cross-chunk dedup happens DISTRIBUTED (per-block unique + one
    # union task; hamming is pair-determined, so unique over the triple
    # == unique over the pair), never as a driver-side drop_duplicates.
    if raw.count() > _UNION_MAX_PAIRS:
        out = (raw.groupby(["id_a", "id_b", "hamming"])
                  .aggregate(Count(alias_name="__n"))
                  .drop_columns(["__n"])
                  .to_pandas())
    else:
        out = _distinct_pair_rows(raw, extra_col="hamming",
                                  extra_type=pa.int32()).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
    return (out.sort_values(["id_a", "id_b"])
               .reset_index(drop=True)[["id_a", "id_b", "hamming"]])


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                  text_col: str, *, modulus: int | None = None,
                  residue: int = 0, bench_ds: "rd.Dataset | None" = None,
                  shingle_k: int = 3) -> "rd.Dataset":
    """Benchmark decontamination: flag every corpus doc that shares any
    word ``shingle_k``-gram with a held-out benchmark set — either a
    SEPARATE benchmark Dataset (``bench_ds``, the production shape: the
    eval suite is its own small table, so stage 1 never scans the
    corpus) or an in-corpus subset (``id % modulus == residue``, the
    self-contained fixture shape; such docs get ``is_benchmark=1`` and
    are never flagged).

    The classic training-data hygiene pass (n-gram overlap against test
    sets, as in GPT-3 appendix C / PaLM §7): contaminated training docs
    leak eval answers.  Output: one row per doc —
    (id, n_shingles, n_hits, is_benchmark, contaminated), counts over
    DISTINCT shingles.

    Plan (broadcast-side assumption: the BENCHMARK set is small — eval
    suites are MBs, not TBs — so its distinct shingle-hash set fits one
    worker and is shipped once via the object store):

      stage 1: per-block benchmark window hashes -> per-block unique ->
               ONE union task -> sorted uint64 array held by ref
      stage 2: map_batches over the full corpus — per-doc DISTINCT window
               hashes (one lexsort), membership via searchsorted against
               the broadcast array; zero shuffles end-to-end.

    Matching is on 64-bit stable hashes of the shingle token-windows
    (`_window_hashes`); the DuckDB oracle compares shingle STRINGS —
    equality up to hash collisions (~1e-10 at gate scales; engine ==
    oracle verified on the fixed fixture at sf0.001/0.01/0.1).
    """
    import ray as _ray

    if (modulus is None) == (bench_ds is None):
        raise ValueError("pass exactly one of modulus= or bench_ds=")

    @_ray.remote
    def _blk_bench(t: pa.Table) -> np.ndarray | None:
        if modulus is not None:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            mask = (ids % modulus) == residue
            if not mask.any():
                return None
            t = t.filter(pa.array(mask))
        if not t.num_rows:
            return None
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        wh, _ = _window_hashes(texts, cfg, shingle_k)
        return np.unique(wh)

    @_ray.remote
    def _union_sorted(*arrs) -> np.ndarray:
        arrs = [a for a in arrs if a is not None and len(a)]
        if not arrs:
            return np.zeros(0, dtype=np.uint64)
        return np.unique(np.concatenate(arrs))

    bench_src = bench_ds if bench_ds is not None else ds
    bench_ref = _union_sorted.remote(
        *[_blk_bench.remote(b) for b in bench_src.to_arrow_refs()])

    def _get_bench() -> np.ndarray:
        key = ("decon_bench", bench_ref.hex())
        hit = _REF_CACHE.get(key)
        if hit is None:
            hit = _ray.get(bench_ref)
            if len(_REF_CACHE) >= 8:
                _REF_CACHE.pop(next(iter(_REF_CACHE)))
            _REF_CACHE[key] = hit
        return hit

    def flag(batch: pa.Table) -> pa.Table:
        bench = _get_bench()
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = batch.num_rows
        wh, wd = _window_hashes(texts, cfg, shingle_k)
        wh_u, wd_u = _distinct_doc_windows(wh, wd)
        n_shingles = np.bincount(wd_u, minlength=n).astype(np.int64)
        pos = np.searchsorted(bench, wh_u)
        hit = (pos < len(bench))
        if hit.any():
            hit[hit] = bench[pos[hit]] == wh_u[hit]
        n_hits = np.bincount(wd_u[hit], minlength=n).astype(np.int64)
        if modulus is not None:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            is_bench = ((ids % modulus) == residue)
        else:
            is_bench = np.zeros(n, dtype=bool)
        contaminated = (n_hits > 0) & ~is_bench
        return pa.table({
            id_col: batch[id_col],
            "n_shingles": pa.array(n_shingles),
            "n_hits": pa.array(n_hits),
            "is_benchmark": pa.array(is_bench.astype(np.int64)),
            "contaminated": pa.array(contaminated.astype(np.int64)),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def self_overlap(ds: "rd.Dataset", cfg: EngineConfig, id_col: str,
                 text_col: str, *, shingle_k: int = 3,
                 num_parts: int = 64) -> "rd.Dataset":
    """Corpus-INTERNAL n-gram overlap: flag every doc that shares at
    least one word ``shingle_k``-gram with ANY OTHER doc — the GPT-3
    appendix-C overlap rule applied to the training corpus itself
    (substring-level dedup signal, the doc-level complement of the
    pairwise near-dup family).

    Output: (id, n_shingles, n_hits, has_overlap) — n_shingles =
    DISTINCT windows in the doc, n_hits = how many of them appear in at
    least one other doc.  Docs shorter than ``shingle_k`` tokens carry
    no windows and are absent (the oracle applies the same rule).

    Scale shape: doc-level, LINEAR in hot windows — a window shared by
    m docs contributes m rows, never C(m,2) pairs.  ONE
    groupby(window-hash) shuffle over per-doc-distinct (hash, id) rows,
    then a doc-keyed count reduce.  Matching is on the shared 64-bit
    ``_window_hashes`` (the DuckDB oracle compares shingle STRINGS —
    equality up to hash collisions, the decontaminate rule)."""
    def windows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # counts come back from the SAME tokenize pass (no second regex
        # split over the corpus); drop the one combined window of docs
        # shorter than shingle_k (the SQL expression emits nothing there)
        wh, wd, counts = _window_hashes(texts, cfg, shingle_k,
                                        return_counts=True)
        keep = counts[wd] >= shingle_k
        wh_u, wd_u = _distinct_doc_windows(wh[keep], wd[keep])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "wh": pa.array(wh_u),
            id_col: pa.array(ids[wd_u]),
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        # rows are (wh, id), already distinct per doc; a window shared by
        # m >= 2 docs marks each of its rows hit=1
        m = df.groupby("wh", sort=False)["wh"].transform("size")
        return pd.DataFrame({id_col: df[id_col],
                             "hit": (m >= 2).astype(np.int64)})

    from ray.data.aggregate import Sum
    from opensearch_jvector_ray.pipelines.relational import hash_copartition
    rows = ds.map_batches(windows, batch_format="pyarrow")
    marked = hash_copartition(rows, "wh", bucket, num_parts)
    out = (marked.groupby(id_col)
                 .aggregate(Count(alias_name="n_shingles"),
                            Sum("hit", alias_name="n_hits")))

    def finish(batch: pa.Table) -> pa.Table:
        hits = pc.cast(batch["n_hits"], pa.int64())
        return pa.table({
            id_col: batch[id_col],
            "n_shingles": pc.cast(batch["n_shingles"], pa.int64()),
            "n_hits": hits,
            "has_overlap": pc.cast(pc.greater(hits, 0), pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def dedup_against(ds: "rd.Dataset", prior_fps, cfg: EngineConfig,
                  id_col: str, text_col: str) -> "rd.Dataset":
    """Cross-snapshot incremental exact dedup: keep only rows whose
    canonical fingerprint (md5 of the space-joined normalized token
    stream — `textstats.fingerprint_stage`'s rule) was NOT seen in a
    prior snapshot — the crawl-refresh shape (drop pages already
    ingested last run).

    ``prior_fps`` is the prior snapshot's fingerprint set, ray.put ONCE
    as a frozenset and probed vectorized per batch (pc.is_in) — a
    prior-snapshot-sized broadcast, right while the prior fingerprint
    table fits a worker heap (hex md5 = 32 B/doc -> ~3 GB per 100M
    docs).  Beyond that, run `exact_dedup` over (prior fps UNION new)
    instead — the hash-partitioned anti-join form; same rule, one
    narrow shuffle.  Returns the surviving rows of ``ds`` unchanged
    (streaming — no driver materialization)."""
    import hashlib

    import ray as _ray

    # drop None fingerprints (fingerprint_stage emits None for NULL
    # text): a NULL prior doc never matches, a NULL new doc is kept
    ref = _ray.put(pa.array(
        sorted({f for f in prior_fps if f is not None}),
        type=pa.string()))

    def keep_unseen(batch: pa.Table) -> pa.Table:
        prior = _ray.get(ref)
        norm = normalized_text(batch[text_col].combine_chunks()
                               if isinstance(batch[text_col], pa.ChunkedArray)
                               else batch[text_col], cfg)
        hs = pa.array([hashlib.md5(s.encode()).hexdigest()
                       if s is not None else None
                       for s in norm.to_pylist()], type=pa.string())
        seen = pc.fill_null(pc.is_in(hs, value_set=prior), False)
        return batch.filter(pc.invert(seen))

    return ds.map_batches(keep_unseen, batch_format="pyarrow")


class BloomFilter:
    """Vectorized double-hashing Bloom filter over md5-hex fingerprints
    [Bloom 1970; Kirsch & Mitzenmacher 2006: g_i = h1 + i*h2 mod m
    preserves the fp-rate of k independent hashes].  h1/h2 are the two
    64-bit halves of the md5 the dedup path already computes — no extra
    hashing; all set/probe ops are numpy over the whole batch.

    The cross-snapshot scale path: an exact prior-fingerprint broadcast
    is 32 B/doc (~3 GB at 100M docs), the 1% Bloom is ~1.2 B/doc
    (~120 MB) — at the price of dropping ~fp_rate of genuinely-new docs
    (false positives are DROPS here, never false keeps; acceptable for
    crawl-refresh dedup, unacceptable where recall of new docs must be
    exact — then use the exact set or the anti-join)."""

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        if n_items < 1 or not (0.0 < fp_rate < 1.0):
            raise ValueError("need n_items >= 1 and 0 < fp_rate < 1")
        m = int(np.ceil(-n_items * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / n_items * np.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @staticmethod
    def _halves(hexes) -> tuple[np.ndarray, np.ndarray]:
        raw = bytes.fromhex("".join(hexes))
        u = np.frombuffer(raw, dtype=">u8").reshape(-1, 2)
        return u[:, 0].astype(np.uint64), u[:, 1].astype(np.uint64)

    def _indices(self, h1: np.ndarray, h2: np.ndarray,
                 i: int) -> np.ndarray:
        return (h1 + np.uint64(i) * h2) % np.uint64(self.m)

    def add_hexes(self, hexes) -> None:
        if not len(hexes):
            return
        h1, h2 = self._halves(hexes)
        for i in range(self.k):
            idx = self._indices(h1, h2, i)
            np.bitwise_or.at(self.bits, (idx // 8).astype(np.int64),
                             (1 << (idx % 8)).astype(np.uint8))

    def contains_hexes(self, hexes) -> np.ndarray:
        if not len(hexes):
            return np.zeros(0, dtype=bool)
        h1, h2 = self._halves(hexes)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = self._indices(h1, h2, i)
            out &= (self.bits[(idx // 8).astype(np.int64)]
                    >> (idx % 8).astype(np.uint8)) & 1 > 0
        return out

    @classmethod
    def from_hexes(cls, hexes, fp_rate: float = 0.01) -> "BloomFilter":
        hexes = list(hexes)
        bf = cls(max(1, len(hexes)), fp_rate)
        bf.add_hexes(hexes)
        return bf


def dedup_against_bloom(ds: "rd.Dataset", bloom: BloomFilter,
                        cfg: EngineConfig, id_col: str,
                        text_col: str) -> "rd.Dataset":
    """`dedup_against`'s Bloom-filter scale path: same fingerprint rule,
    the prior set replaced by a ~1.2 B/doc sketch broadcast once.
    Drops every previously-seen doc (no false keeps) plus ~fp_rate of
    genuinely-new ones (documented trade; see BloomFilter)."""
    import hashlib

    import ray as _ray

    ref = _ray.put((bloom.bits, bloom.m, bloom.k))

    def keep_unseen(batch: pa.Table) -> pa.Table:
        bits, m, k = _ray.get(ref)
        bf = BloomFilter.__new__(BloomFilter)
        bf.bits, bf.m, bf.k = bits, m, k
        norm = normalized_text(batch[text_col].combine_chunks()
                               if isinstance(batch[text_col], pa.ChunkedArray)
                               else batch[text_col], cfg)
        vals = norm.to_pylist()
        valid = np.array([s is not None for s in vals], dtype=bool)
        hexes = [hashlib.md5(s.encode()).hexdigest()
                 for s in vals if s is not None]
        seen = np.zeros(len(vals), dtype=bool)
        seen[valid] = bf.contains_hexes(hexes)   # NULL text -> kept
        return batch.filter(pa.array(~seen))

    return ds.map_batches(keep_unseen, batch_format="pyarrow")
