"""Segment merge: N input segments -> 1 merged segment, on an actor pool.

The analog of the reference's merge lifecycle
(`JVectorWriter.mergeOneField`, `JVectorWriter.java:175-195`):
  - unified ordinal space + ordinal remap honoring the merged sort
    (`RandomAccessMergedFloatVectorValues` + `MergeState.DocMap` remap,
    `JVectorWriter.java:700-827`; `GraphNodeIdToDocMap.update`,
    `GraphNodeIdToDocMap.java:92-112`) -> here: concatenate input docs
    tables, stable-sort by doc key, derive per-input old-ord -> new-ord
    maps (ordinals stay PARTITION-SCOPED and key-derived — SURVEY §7
    flags global renumbering as the reference's most bug-prone area).
  - delete handling (`JVectorWriter.java:611-658,715-748`): tombstoned
    docs dropped, their postings masked out — the "rebuild" decision
    branch; without deletes the merge is a pure re-serialization
    ("incremental" branch analog).
  - "leading reader" skew heuristic (`JVectorWriter.java:640-698`):
    merge groups are formed largest-first so group sizes balance.
  - merges run only when explicitly requested (the
    `ForceMergesOnlyMergePolicy` analog, S11: no hidden background work).

Execution shape: one Ray task per merge group via ``map_batches`` over a
tiny dataset of group descriptors (stateless tasks — each group is
independent); per-group work is numpy-vectorized end-to-end (decode all
input postings, remap ordinals with gather, lexsort, re-encode via the
shared ``encode_posting_arrays``).  Merged-segment manifests make the
merge itself resumable (skip groups whose output manifest exists).
"""

from __future__ import annotations

import os
import time
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.postings import (
    POSTINGS_SCHEMA, encode_posting_arrays,
)
from opensearch_jvector_ray.stages.build import (
    build_fingerprint,
    POSTINGS_ROW_GROUP, IndexSpec, aggregate_dictionary,
)
from opensearch_jvector_ray.state.manifest import (
    CONFIG_NAME, DOCS_NAME, POSTINGS_NAME, STATS_NAME, SegmentManifest,
    StageTimer, completed_segments, read_json, segment_dir, write_json_atomic,
)


def plan_merge_groups(manifests: dict[int, Any], merge_factor: int) -> list[list[int]]:
    """Group input segments largest-first (leading-reader analog) so merge
    tasks are balanced; each group has up to ``merge_factor`` segments.
    The member cap is ENFORCED, not advisory: it is what bounds a merge
    task's file fan-in and working set — balancing by doc count alone
    would pack dozens of small segments into one group under size skew
    (one 9M segment + 999 tiny ones) and silently void the bound."""
    by_size = sorted(manifests, key=lambda s: -manifests[s].num_docs)
    n_groups = max(1, (len(by_size) + merge_factor - 1) // merge_factor)
    groups: list[list[int]] = [[] for _ in range(n_groups)]
    sizes = [0] * n_groups
    for seg in by_size:   # greedy: smallest total WITH capacity left
        g = min((i for i in range(n_groups)
                 if len(groups[i]) < merge_factor),
                key=lambda i: sizes[i])
        groups[g].append(seg)
        sizes[g] += manifests[seg].num_docs
    return [sorted(g) for g in groups if g]


def _drop_key_rank(tbl: pa.Table) -> pa.Table:
    """Strip a previous merge's key_rank column (re-derived per merge)."""
    return tbl.drop_columns(["key_rank"]) if "key_rank" in tbl.column_names else tbl


def _first_varints(buf: np.ndarray, starts: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (value, byte_length) of the varint at each start offset."""
    n = len(starts)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    # clipped gathers instead of padding (padding would copy the whole
    # buffer); a varint never runs off the end of its own run
    last = len(buf) - 1
    cols = np.stack([buf[np.minimum(starts + j, last)] for j in range(10)],
                    axis=1)
    is_end = (cols & 0x80) == 0
    first_len = is_end.argmax(axis=1) + 1
    active = (np.arange(10)[None, :] < first_len[:, None])
    vals = ((cols.astype(np.uint64) & np.uint64(0x7F))
            << (np.uint64(7) * np.arange(10, dtype=np.uint64))[None, :])
    vals = np.where(active, vals, np.uint64(0)).sum(axis=1).astype(np.int64)
    return vals, first_len.astype(np.int64)


def _gather_runs(src: np.ndarray, src_starts: np.ndarray,
                 lens: np.ndarray) -> np.ndarray:
    """Concatenate src[src_starts[r] : +lens[r]] over runs, vectorized.

    The output is CONTIGUOUS, so only the source side needs an index
    array; it's built with one boundary-delta write + one cumsum (the
    cheapest vectorized variable-run gather), int32 when offsets allow —
    index traffic is the cost driver at byte granularity."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=src.dtype)
    nz = lens > 0
    s = np.asarray(src_starts, dtype=np.int64)[nz]
    l = lens[nz]
    dt = np.int32 if len(src) < (1 << 31) and total < (1 << 31) else np.int64
    step = np.ones(total, dtype=dt)
    step[0] = s[0]
    ends = np.cumsum(l)
    step[ends[:-1]] = (s[1:] - (s[:-1] + l[:-1] - 1)).astype(dt)
    return src[np.cumsum(step, dtype=dt)]


def _join_runs(src: np.ndarray, starts: np.ndarray,
               lens: np.ndarray) -> np.ndarray:
    """Concatenate byte runs via buffer-protocol slices + one b"".join —
    pure C memcpy (measured ~40x faster than a fancy-indexed gather on
    bandwidth-throttled nodes; the Python slice loop is ~0.1us/run)."""
    mv = memoryview(np.ascontiguousarray(src))
    out = b"".join([mv[s:s + l] for s, l in
                    zip(starts.tolist(), lens.tolist())])
    return np.frombuffer(out, dtype=np.uint8)


def _join_runs2(buf_a: np.ndarray, starts_a: np.ndarray, lens_a: np.ndarray,
                buf_b: np.ndarray, starts_b: np.ndarray, lens_b: np.ndarray,
                ) -> np.ndarray:
    """Interleaved two-buffer run join (a_0, b_0, a_1, b_1, ...) without
    concatenating the source buffers first."""
    mva = memoryview(np.ascontiguousarray(buf_a))
    mvb = memoryview(np.ascontiguousarray(buf_b))
    chunks: list = []
    for sa, la, sb, lb in zip(starts_a.tolist(), lens_a.tolist(),
                              starts_b.tolist(), lens_b.tolist()):
        chunks.append(mva[sa:sa + la])
        chunks.append(mvb[sb:sb + lb])
    return np.frombuffer(b"".join(chunks), dtype=np.uint8)


def _binary_offsets(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row byte offsets (len n+1) of a (large_)binary column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros(1, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)
    offs = offs[col.offset: col.offset + len(col) + 1].astype(np.int64)
    return offs - offs[0]


def _list_offsets_and_values(col: pa.Array | pa.ChunkedArray,
                             dtype) -> tuple[np.ndarray, np.ndarray]:
    """(row offsets len n+1, flat values) of a list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.asarray(col.offsets.to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    return offs - offs[0], vals


def _bulk_merge_group(src_dirs: list[str], dst_dir: str, cfg: EngineConfig,
                      spec: IndexSpec) -> SegmentManifest:
    """Zero-recompression merge (the reference's incremental-merge branch:
    no deletes -> reuse existing structures, `JVectorWriter.java:922-941`).

    Ordinals are SEGMENT-MAJOR (new_ord = input_offset + old_ord), so each
    term's merged posting run is the byte-level concatenation of the input
    runs with only the run's FIRST gap patched (it must bridge from the
    previous run's last ordinal): one varint rewritten for the varint
    codec, one 128-value block re-packed for pfor (the rest of the run is
    byte-spliced either way).  tf and position blobs concatenate
    unchanged; block metadata shifts by offsets, and the merged rows carry
    ``blk_n`` (per-block value counts) because spliced runs keep their
    ORIGINAL block boundaries — blocks are no longer uniformly
    block_size-long.  Because segment-major ordinals are not key-ordered,
    the docs table gains a ``key_rank`` column that the query side uses
    for exact tie-breaks.
    """
    timer = StageTimer()
    timer.start("read_docs")
    docs_tables = [_drop_key_rank(pq.read_table(os.path.join(d, DOCS_NAME)))
                   for d in src_dirs]
    posts = [pq.read_table(os.path.join(d, POSTINGS_NAME)) for d in src_dirs]
    timer.stop()

    timer.start("remap")
    n_per = [t.num_rows for t in docs_tables]
    offsets = np.zeros(len(n_per), dtype=np.int64)
    np.cumsum(n_per[:-1], out=offsets[1:])
    docs_all = pa.concat_tables(docs_tables)
    sort_keys = [(k, "ascending") for k in spec.key_cols]
    order = pc.sort_indices(docs_all, sort_keys=sort_keys).to_numpy(
        zero_copy_only=False).astype(np.int64)
    key_rank = np.empty(docs_all.num_rows, dtype=np.int32)
    key_rank[order] = np.arange(docs_all.num_rows, dtype=np.int32)
    docs_out = docs_all.append_column("key_rank", pa.array(key_rank))
    dl_all = docs_all["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if docs_all.num_rows else np.zeros(0, dtype=np.int64)
    timer.stop()

    # --- vectorized run-level splice -------------------------------------
    # A "run" is one input term row; the merged term is its runs spliced
    # in input order.  All byte movement happens in a handful of fancy-
    # indexed copies over the concatenated input buffers — no Python loop
    # touches a term (pfor is the one exception: its per-run FIRST block
    # is re-packed in a tight loop of <=block_size-value codec calls).
    timer.start("merge_postings")
    from opensearch_jvector_ray.postings import (
        _large_binary_from_slices, binary_column_bytes, for_pack_block,
        for_unpack_block, varint_encode,
    )
    B = cfg.block_size
    nonempty = [(i, p) for i, p in enumerate(posts) if p.num_rows]
    if not nonempty:
        postings_tbl = POSTINGS_SCHEMA.empty_table()
    else:
        # global sorted vocab (vocab-level: tiny vs postings)
        vocabs = [p["term"].combine_chunks() for _, p in nonempty]
        all_vocab = pa.concat_arrays(
            [v.chunk(0) if isinstance(v, pa.ChunkedArray) else v
             for v in vocabs])
        uniq = pc.unique(all_vocab)
        vocab_sorted = uniq.take(pc.sort_indices(uniq))

        # per-ROW attributes, concatenated over inputs (input order)
        code_p, docoff_p, df_p, cf_p = [], [], [], []
        ostart_p, olen_p, tstart_p, tlen_p, pstart_p, plen_p = [], [], [], [], [], []
        bstart_p, bcnt_p = [], []
        obuf_p, tbuf_p, pbuf_p = [], [], []
        blast_p, bmax_p, bmin_p, boffo_p, bofft_p, bn_p = [], [], [], [], [], []
        obase = tbase = pbase = bbase = 0
        for i, p in nonempty:
            nrow = p.num_rows
            code_p.append(pc.index_in(p["term"], value_set=vocab_sorted)
                          .to_numpy(zero_copy_only=False).astype(np.int64))
            docoff_p.append(np.full(nrow, offsets[i], dtype=np.int64))
            df_p.append(p["df"].to_numpy(zero_copy_only=False).astype(np.int64))
            cf_p.append(p["cf"].to_numpy(zero_copy_only=False).astype(np.int64))
            for col, buf_list, start_list, len_list, base in (
                    ("ords_enc", obuf_p, ostart_p, olen_p, obase),
                    ("tfs_enc", tbuf_p, tstart_p, tlen_p, tbase),
                    ("pos_enc", pbuf_p, pstart_p, plen_p, pbase)):
                offs = _binary_offsets(p[col])
                buf_list.append(binary_column_bytes(p[col]))
                start_list.append(offs[:-1] + base)
                len_list.append(np.diff(offs))
            obase += len(obuf_p[-1])
            tbase += len(tbuf_p[-1])
            pbase += len(pbuf_p[-1])
            loffs, lvals = _list_offsets_and_values(p["blk_last_ord"], np.int64)
            bstart_p.append(loffs[:-1] + bbase)
            bcnt_p.append(np.diff(loffs))
            bbase += len(lvals)
            blast_p.append(lvals)
            bmax_p.append(_list_offsets_and_values(p["blk_max_tf"], np.int64)[1])
            bmin_p.append(_list_offsets_and_values(p["blk_min_dl"], np.int64)[1])
            boffo_p.append(_list_offsets_and_values(p["blk_off_ord"], np.int64)[1])
            bofft_p.append(_list_offsets_and_values(p["blk_off_tf"], np.int64)[1])
            if "blk_n" in p.column_names:
                bn_p.append(_list_offsets_and_values(p["blk_n"], np.int64)[1])
            else:
                # uniform build-time layout: B per block, short tail
                df_i = df_p[-1]
                nb_i = np.diff(loffs)
                bn_flat = np.full(int(nb_i.sum()), B, dtype=np.int64)
                last_idx = np.cumsum(nb_i) - 1
                bn_flat[last_idx] = df_i - (nb_i - 1) * B
                bn_p.append(bn_flat)

        code_a = np.concatenate(code_p)
        docoff_a = np.concatenate(docoff_p)
        df_a = np.concatenate(df_p)
        cf_a = np.concatenate(cf_p)
        ostart_a = np.concatenate(ostart_p); olen_a = np.concatenate(olen_p)
        tstart_a = np.concatenate(tstart_p); tlen_a = np.concatenate(tlen_p)
        pstart_a = np.concatenate(pstart_p); plen_a = np.concatenate(plen_p)
        bstart_a = np.concatenate(bstart_p); bcnt_a = np.concatenate(bcnt_p)
        obuf = np.concatenate(obuf_p); tbuf = np.concatenate(tbuf_p)
        pbuf = np.concatenate(pbuf_p)
        blast_f = np.concatenate(blast_p); bmax_f = np.concatenate(bmax_p)
        bmin_f = np.concatenate(bmin_p); boffo_f = np.concatenate(boffo_p)
        bofft_f = np.concatenate(bofft_p); bn_f = np.concatenate(bn_p)

        # run order: (term code, input index) — splice runs input-major
        input_of = np.concatenate([np.full(len(c), j, dtype=np.int64)
                                   for j, c in enumerate(code_p)])
        g = np.lexsort((input_of, code_a))
        n_runs = len(g)
        r_code = code_a[g]
        is_first = np.ones(n_runs, dtype=bool)
        is_first[1:] = r_code[1:] != r_code[:-1]
        term_run_start = np.flatnonzero(is_first)
        runs_per_term = np.diff(np.append(term_run_start, n_runs))
        n_terms_out = len(term_run_start)

        r_docoff = docoff_a[g]
        r_ostart = ostart_a[g]; r_olen = olen_a[g]
        r_bstart = bstart_a[g]; r_nb = bcnt_a[g]
        # last merged-space ordinal of each run -> the bridge for the next
        r_last = blast_f[r_bstart + r_nb - 1] + r_docoff
        prev_last = np.zeros(n_runs, dtype=np.int64)
        prev_last[1:] = r_last[:-1]
        prev_last[is_first] = 0

        if cfg.codec == "pfor":
            # first block byte length: offset of block 1, or the whole run
            safe_next = np.minimum(r_bstart + 1, len(boffo_f) - 1)
            first_len = np.where(r_nb > 1, boffo_f[safe_next], r_olen)
            bridge = r_docoff - prev_last
            heads: list[bytes] = []
            for k in range(n_runs):
                s = int(r_ostart[k])
                gaps0 = for_unpack_block(
                    obuf[s:s + int(first_len[k])],
                    int(bn_f[r_bstart[k]])).astype(np.int64)
                gaps0[0] += int(bridge[k])
                heads.append(for_pack_block(gaps0.astype(np.uint64)))
            head_lens = np.array([len(h) for h in heads], dtype=np.int64)
            hbuf = np.frombuffer(b"".join(heads), dtype=np.uint8)
            head_off = np.cumsum(head_lens) - head_lens
        else:
            first_val, first_len = _first_varints(obuf, r_ostart)
            new_first = first_val + r_docoff - prev_last
            hbuf, head_lens = varint_encode(new_first)
            head_off = np.cumsum(head_lens) - head_lens

        tail_start = r_ostart + first_len
        tail_len = r_olen - first_len
        out_lens = head_lens + tail_len
        run_dst = np.cumsum(out_lens) - out_lens
        # byte assembly: (head_r, tail_r) segments in run order tile the
        # output contiguously — pure memcpy joins, no source-buffer copy
        out_obuf = _join_runs2(hbuf, head_off, head_lens,
                               obuf, tail_start, tail_len)
        term_obytes = np.add.reduceat(out_lens, term_run_start)
        term_ooffs = np.concatenate([[0], np.cumsum(term_obytes)])

        r_tstart = tstart_a[g]; r_tlen = tlen_a[g]
        out_tbuf = _join_runs(tbuf, r_tstart, r_tlen)
        term_toffs = np.concatenate(
            [[0], np.cumsum(np.add.reduceat(r_tlen, term_run_start))])
        r_pstart = pstart_a[g]; r_plen = plen_a[g]
        out_pbuf = _join_runs(pbuf, r_pstart, r_plen)
        term_poffs = np.concatenate(
            [[0], np.cumsum(np.add.reduceat(r_plen, term_run_start))])

        # block metadata: per-block gathers + per-run shifts
        blk_src = _gather_runs(np.arange(len(blast_f), dtype=np.int64),
                               r_bstart, r_nb)
        docoff_rep = np.repeat(r_docoff, r_nb)
        blast_out = blast_f[blk_src] + docoff_rep
        bmax_out = bmax_f[blk_src]
        bmin_out = bmin_f[blk_src]
        bn_out = bn_f[blk_src]
        # ord offsets: run's base within the term + original offset shifted
        # by the head-length change (first block only keeps offset 0)
        term_dst0 = np.repeat(run_dst[term_run_start], runs_per_term)
        cum_o_run = run_dst - term_dst0
        delta = head_lens - first_len
        bo_vals = boffo_f[blk_src]
        boffo_out = (np.repeat(cum_o_run, r_nb)
                     + np.where(bo_vals > 0, bo_vals + np.repeat(delta, r_nb), 0))
        run_tdst = np.cumsum(r_tlen) - r_tlen
        term_tdst0 = np.repeat(run_tdst[term_run_start], runs_per_term)
        bofft_out = np.repeat(run_tdst - term_tdst0, r_nb) + bofft_f[blk_src]
        blk_per_term = np.add.reduceat(r_nb, term_run_start)
        blk_offs32 = np.concatenate([[0], np.cumsum(blk_per_term)])

        term_df = np.add.reduceat(df_a[g], term_run_start)
        term_cf = np.add.reduceat(cf_a[g], term_run_start)

        def _list32(vals, typ):
            return pa.ListArray.from_arrays(
                pa.array(blk_offs32, type=pa.int32()), pa.array(vals, type=typ))

        postings_tbl = pa.table({
            "term": vocab_sorted.take(pa.array(r_code[term_run_start])),
            "df": pa.array(term_df.astype(np.int32)),
            "cf": pa.array(term_cf.astype(np.int64)),
            "ords_enc": _large_binary_from_slices(out_obuf, term_ooffs),
            "tfs_enc": _large_binary_from_slices(out_tbuf, term_toffs),
            "pos_enc": _large_binary_from_slices(out_pbuf, term_poffs),
            "blk_last_ord": _list32(blast_out.astype(np.int32), pa.int32()),
            "blk_max_tf": _list32(bmax_out.astype(np.int32), pa.int32()),
            "blk_min_dl": _list32(bmin_out.astype(np.int32), pa.int32()),
            "blk_off_ord": _list32(boffo_out, pa.int64()),
            "blk_off_tf": _list32(bofft_out, pa.int64()),
            "blk_n": _list32(bn_out.astype(np.int32), pa.int32()),
        }, schema=POSTINGS_SCHEMA)
    timer.stop()

    timer.start("write")
    os.makedirs(dst_dir, exist_ok=True)
    pq.write_table(docs_out, os.path.join(dst_dir, DOCS_NAME))
    pq.write_table(postings_tbl, os.path.join(dst_dir, POSTINGS_NAME),
                   row_group_size=POSTINGS_ROW_GROUP)
    timer.stop()
    return SegmentManifest(
        seg=-1,
        num_docs=docs_out.num_rows,
        num_docs_indexed=int((dl_all > 0).sum()),
        sum_doc_len=int(dl_all.sum()),
        num_terms=postings_tbl.num_rows,
        num_postings=int(pc.sum(postings_tbl["df"]).as_py() or 0),
        rows_in=int(docs_all.num_rows),
        config_fingerprint=build_fingerprint(cfg, spec),
        lineage={"merged_from": [os.path.basename(d) for d in src_dirs],
                 "strategy": "bulk"},
        timings_sec={k: round(v, 4) for k, v in timer.timings.items()},
    )


def _merge_group(src_dirs: list[str], dst_dir: str, cfg: EngineConfig,
                 spec: IndexSpec,
                 deletes: "Sequence[tuple] | None") -> SegmentManifest:
    timer = StageTimer()
    timer.start("read_docs")
    docs_tables = [_drop_key_rank(pq.read_table(os.path.join(d, DOCS_NAME)))
                   for d in src_dirs]
    timer.stop()

    # --- unified, key-sorted doc table + per-input ordinal remap ---------
    timer.start("remap")
    n_per = [t.num_rows for t in docs_tables]
    docs_all = pa.concat_tables(docs_tables)
    input_of_row = np.repeat(np.arange(len(src_dirs)), n_per)
    old_ord_of_row = np.concatenate([np.arange(n, dtype=np.int64) for n in n_per]) \
        if docs_all.num_rows else np.zeros(0, dtype=np.int64)

    keep_mask = np.ones(docs_all.num_rows, dtype=bool)
    if deletes and docs_all.num_rows:
        # both sides of the anti-join encode through the SAME Arrow
        # cast (delete_key_strings) — str()-built keys never matched
        # float/bool/timestamp key columns
        from opensearch_jvector_ray.stages.build import (
            _composite_key, delete_key_strings,
        )
        mask = pc.invert(pc.is_in(
            _composite_key(docs_all, spec),
            value_set=delete_key_strings(deletes, docs_all, spec)))
        keep_mask = mask.to_numpy(zero_copy_only=False)

    kept_rows = np.flatnonzero(keep_mask)
    docs_kept = docs_all.take(pa.array(kept_rows))
    sort_keys = [(k, "ascending") for k in spec.key_cols]
    order = pc.sort_indices(docs_kept, sort_keys=sort_keys).to_numpy(
        zero_copy_only=False).astype(np.int64)
    docs_sorted = docs_kept.take(pa.array(order))

    # old (input, ord) -> new ord; deleted docs map to -1
    new_ord_flat = np.full(docs_all.num_rows, -1, dtype=np.int64)
    new_ord_flat[kept_rows[order]] = np.arange(len(order), dtype=np.int64)
    remaps = []
    off = 0
    for n in n_per:
        remaps.append(new_ord_flat[off:off + n])
        off += n
    doc_len_new = docs_sorted["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if docs_sorted.num_rows else np.zeros(0, dtype=np.int64)
    timer.stop()

    # --- decode + remap all input postings (vectorized per input) --------
    # Terms are merged at the VOCAB level: per-input vocabularies are tiny
    # (thousands of rows) vs postings (millions), so string work never
    # touches a posting — codes are np.repeat'ed by df.  Blobs are read
    # zero-copy from the Arrow buffers.
    timer.start("merge_postings")
    from opensearch_jvector_ray.postings import (
        binary_column_bytes, groupwise_cumsum, varint_decode)
    inputs = []
    for i, d in enumerate(src_dirs):
        post = pq.read_table(os.path.join(d, POSTINGS_NAME))
        if post.num_rows:
            inputs.append((i, post))
    if inputs:
        # global sorted vocab from the (small) per-input vocabs
        vocabs = [post["term"].combine_chunks() for _, post in inputs]
        all_vocab = pa.concat_arrays(
            [v.chunk(0) if isinstance(v, pa.ChunkedArray) else v for v in vocabs])
        uniq = pc.unique(all_vocab)
        vocab_sorted = uniq.take(pc.sort_indices(uniq))
        code_of = {t: c for c, t in enumerate(vocab_sorted.to_pylist())}

        p_code_parts, p_ord_parts, p_tf_parts, pos_parts = [], [], [], []
        for i, post in inputs:
            df = post["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            from opensearch_jvector_ray.postings import decode_segment_postings
            _, p_ord_old, p_tf = decode_segment_postings(
                post, codec=cfg.codec, block_size=cfg.block_size)
            row_codes = np.fromiter((code_of[t] for t in post["term"].to_pylist()),
                                    dtype=np.int64, count=post.num_rows)
            new_ords = remaps[i][p_ord_old]
            keep = new_ords >= 0                # drop deleted docs' postings
            p_code_parts.append(np.repeat(row_codes, df)[keep])
            p_ord_parts.append(new_ords[keep])
            p_tf_parts.append(p_tf[keep])
            if cfg.with_positions:
                pos_gaps = varint_decode(binary_column_bytes(post["pos_enc"])).astype(np.int64)
                tok_start = np.zeros(len(p_tf), dtype=np.int64)
                np.cumsum(p_tf[:-1], out=tok_start[1:])
                flat_pos = groupwise_cumsum(pos_gaps, tok_start)
                kept_idx = np.flatnonzero(keep)
                lens = p_tf[kept_idx]
                total = int(lens.sum())
                if total:
                    new_start = np.zeros(len(kept_idx), dtype=np.int64)
                    np.cumsum(lens[:-1], out=new_start[1:])
                    src = (np.repeat(tok_start[kept_idx] - new_start, lens)
                           + np.arange(total, dtype=np.int64))
                    pos_parts.append(flat_pos[src])
                else:
                    pos_parts.append(np.zeros(0, dtype=np.int64))

        codes = np.concatenate(p_code_parts)
        p_ord_all = np.concatenate(p_ord_parts)
        p_tf_all = np.concatenate(p_tf_parts)
        order2 = np.lexsort((p_ord_all, codes))
        if cfg.with_positions and pos_parts:
            pos_all = np.concatenate(pos_parts)
            lens = p_tf_all
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sel = order2
            sel_lens = lens[sel]
            total = int(sel_lens.sum())
            new_start = np.zeros(len(sel), dtype=np.int64)
            np.cumsum(sel_lens[:-1], out=new_start[1:])
            src = (np.repeat(starts[sel] - new_start, sel_lens)
                   + np.arange(total, dtype=np.int64))
            t_pos = pos_all[src]
        else:
            t_pos = None
        postings_tbl = encode_posting_arrays(
            vocab_sorted, codes[order2], p_ord_all[order2], p_tf_all[order2],
            t_pos, doc_len_new, cfg)
    else:
        postings_tbl = POSTINGS_SCHEMA.empty_table()
    timer.stop()

    # --- persist (manifest last: atomic checkpoint) ----------------------
    timer.start("write")
    os.makedirs(dst_dir, exist_ok=True)
    pq.write_table(docs_sorted, os.path.join(dst_dir, DOCS_NAME))
    pq.write_table(postings_tbl, os.path.join(dst_dir, POSTINGS_NAME),
                   row_group_size=POSTINGS_ROW_GROUP)
    timer.stop()
    manifest = SegmentManifest(
        seg=-1,   # filled by caller
        num_docs=docs_sorted.num_rows,
        num_docs_indexed=int((doc_len_new > 0).sum()),
        sum_doc_len=int(doc_len_new.sum()),
        num_terms=postings_tbl.num_rows,
        num_postings=int(pc.sum(postings_tbl["df"]).as_py() or 0),
        rows_in=int(docs_all.num_rows),
        config_fingerprint=build_fingerprint(cfg, spec),
        lineage={"merged_from": [os.path.basename(d) for d in src_dirs]},
        timings_sec={k: round(v, 4) for k, v in timer.timings.items()},
    )
    return manifest


def merge_index(src_index_dir: str, dst_index_dir: str,
                merge_factor: int = 8,
                deletes: Sequence[tuple] | None = None,
                task_cpus: int | None = None) -> dict:
    """Merge an index's segments into ceil(S/merge_factor) segments in a
    new index directory; recomputes dictionary + global stats (T3 analog:
    dictionary/IDF refresh on merge)."""
    meta = read_json(os.path.join(src_index_dir, CONFIG_NAME))
    cfg = EngineConfig.from_json(meta["config"])
    spec = IndexSpec(text_col=meta["spec"]["text_col"],
                     key_cols=tuple(meta["spec"]["key_cols"]),
                     store_cols=tuple(meta["spec"]["store_cols"]),
                     ts_col=meta["spec"]["ts_col"])
    manifests = completed_segments(src_index_dir)
    groups = plan_merge_groups(manifests, merge_factor)

    os.makedirs(dst_index_dir, exist_ok=True)
    write_json_atomic(os.path.join(dst_index_dir, CONFIG_NAME),
                      {**meta, "num_segments": len(groups)})
    done = completed_segments(dst_index_dir)
    # resume trusts a finished gid ONLY if it was merged from exactly
    # the group the CURRENT plan assigns it (the build-side stale-
    # segment rule): a crash-then-replan (source appended, different
    # merge_factor) re-groups, and silently keeping old-grouping
    # outputs duplicates/loses docs in the published stats+dictionary
    stale = []
    for gid, m in done.items():
        want = ([os.path.basename(segment_dir(src_index_dir, s))
                 for s in groups[gid]] if gid < len(groups) else None)
        have = m.lineage.get("merged_from")
        if want is None or sorted(have or []) != sorted(want):
            stale.append(gid)
    if stale:
        raise ValueError(
            f"merge destination {dst_index_dir!r} holds segments "
            f"{sorted(stale)} merged under a DIFFERENT grouping than "
            f"the current plan (source or merge_factor changed?) — "
            f"refusing to mix; use a fresh dst dir or delete them")

    items = [{"gid": gid,
              "src_dirs": [segment_dir(src_index_dir, s) for s in group]}
             for gid, group in enumerate(groups) if gid not in done]

    def run_group(batch: pa.Table) -> pa.Table:
        out = []
        for gid, src_dirs in zip(batch["gid"].to_pylist(),
                                 batch["src_dirs"].to_pylist()):
            dst = segment_dir(dst_index_dir, gid)
            # the reference's merge decision tree (JVectorWriter.java:850-969):
            # no deletes -> incremental/bulk reuse of existing structures
            # (varint patches one varint per run; pfor re-packs one block
            # per run — blk_n records the irregular boundaries);
            # deletes -> full decode+rebuild
            if not deletes:
                m = _bulk_merge_group(list(src_dirs), dst, cfg, spec)
            else:
                m = _merge_group(list(src_dirs), dst, cfg, spec,
                                 list(deletes))
            m.seg = gid
            m.write(dst)
            out.append(gid)
        return pa.table({"gid": pa.array(out, type=pa.int32())})

    t0 = time.perf_counter()
    if items:
        # merge tasks stream large working sets (every input segment's
        # postings); reserve multiple CPUs per task so the concurrent-merge
        # count stays at the memory-bandwidth sweet spot instead of
        # thrashing (size concurrency x num_cpus to the node, not the
        # task's thread count)
        import ray
        total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        task_cpus = task_cpus if task_cpus else max(1, total_cpus // 8)
        rd.from_items(items).map_batches(
            run_group, batch_format="pyarrow", batch_size=1,
            num_cpus=task_cpus).take_all()
    aggregate_dictionary(dst_index_dir, cfg,
                         sorted(completed_segments(dst_index_dir).keys()))
    out_manifests = completed_segments(dst_index_dir)
    num_indexed = sum(m.num_docs_indexed for m in out_manifests.values())
    sum_dl = sum(m.sum_doc_len for m in out_manifests.values())
    stats = {
        "n_docs": sum(m.num_docs for m in out_manifests.values()),
        "n_docs_indexed": num_indexed,
        "sum_doc_len": sum_dl,
        "avgdl": (sum_dl / num_indexed) if num_indexed else 0.0,
        "num_segments": len(out_manifests),
        "segments": sorted(out_manifests.keys()),
        "config_fingerprint": cfg.fingerprint(),
        "merged_from": src_index_dir,
        "merge_sec": round(time.perf_counter() - t0, 3),
    }
    write_json_atomic(os.path.join(dst_index_dir, STATS_NAME), stats)
    return stats


def delete_by_query(src_index_dir: str, dst_index_dir: str,
                    queries: dict[str, str], min_score: float,
                    merge_factor: int = 8) -> int:
    """_delete_by_query API [OpenSearch delete-by-query public
    semantics]: every doc matching ANY given query (radial
    score >= min_score — the uncapped O5 predicate) is tombstoned and
    the index merges into ``dst_index_dir`` (the deletes branch: full
    decode + rebuild, D2).  Dictionary and global stats recompute on
    merge (T3), so post-delete searches run on SURVIVOR statistics —
    rank-identical to a fresh build over the surviving docs (the
    generated oracle's surv-CTE rule).  The source index is untouched
    (new-directory merge); returns the number of deleted docs."""
    from opensearch_jvector_ray.query import IndexSearcher
    s = IndexSearcher(src_index_dir)
    hits = s.search(queries, min_score=min_score)
    keys = {tuple(row) for row in
            hits[list(s.key_cols)].itertuples(index=False)}
    merge_index(src_index_dir, dst_index_dir, merge_factor=merge_factor,
                deletes=sorted(keys))
    return len(keys)


def update_by_query(src_index_dir: str, dst_index_dir: str,
                    queries: dict[str, str], min_score: float,
                    updates, merge_factor: int = 8,
                    lineage: dict | None = None) -> int:
    """_update_by_query API [OpenSearch update-by-query public
    semantics, expressed as the engine's delete+insert rule (D3)]:
    the matching docs tombstone via ``delete_by_query``'s stats-
    recomputing merge-rebuild, then ``updates`` — the caller's
    re-transformed rows for those keys; the index stores no raw text
    (S9), so the new payload comes from the source side — appends as
    NEW segments with a dictionary/global-stats refresh (T3 via
    ``add_segments``).  Post-update ranking is rank-identical to a
    fresh build over (survivors + updated rows).  Returns the number
    of docs replaced."""
    from opensearch_jvector_ray.stages.build import add_segments
    n = delete_by_query(src_index_dir, dst_index_dir, queries,
                        min_score, merge_factor=merge_factor)
    add_segments(dst_index_dir, updates,
                 lineage=lineage or {
                     "update_by_query": sorted(queries.items()),
                     "min_score": float(min_score)})
    return n


def reindex(src_index_dir: str, dst_index_dir: str, source,
            dst_cfg: EngineConfig | None = None,
            queries: dict[str, str] | None = None,
            min_score: float | None = None,
            transform=None) -> int:
    """_reindex API [OpenSearch reindex public semantics]: copy docs
    from a source index into a NEW index — optionally restricted to a
    query match set (the uncapped radial O5 predicate, computed on the
    SOURCE index's statistics) and re-processed by a per-batch
    ``transform`` — under a possibly DIFFERENT analyzer config, the
    classic mapping/analyzer-change migration (the reason _reindex
    exists: Lucene segments can't be re-analyzed in place).

    The engine stores no raw text (S9 derived-source rule), so the
    payload streams from ``source`` (parquet path(s) or a Dataset); the
    match-set key filter is a result-set-sized broadcast applied
    vectorized per batch (the update_by_query bound, documented there).
    The destination build recomputes dictionary + global stats from its
    own corpus, so ranking on the new index is rank-identical to a
    fresh build over the (filtered, transformed) docs.  Returns the
    number of docs indexed."""
    from opensearch_jvector_ray.query import IndexSearcher
    from opensearch_jvector_ray.stages.build import (
        _composite_key, build_index,
    )
    meta = read_json(os.path.join(src_index_dir, CONFIG_NAME))
    spec = IndexSpec(text_col=meta["spec"]["text_col"],
                     key_cols=tuple(meta["spec"]["key_cols"]),
                     store_cols=tuple(meta["spec"]["store_cols"]),
                     ts_col=meta["spec"]["ts_col"])
    cfg = dst_cfg if dst_cfg is not None \
        else EngineConfig.from_json(meta["config"])
    if hasattr(source, "map_batches"):
        ds = source
    else:
        from opensearch_jvector_ray.stages.build import (
            resolve_parquet_paths,
        )
        ds = rd.read_parquet(resolve_parquet_paths(source),
                             columns=spec.all_cols())
    if queries:
        s = IndexSearcher(src_index_dir)
        hits = s.search(queries, min_score=min_score)
        keys = sorted({"\x1f".join(str(v) for v in row) for row in
                       hits[list(s.key_cols)].itertuples(index=False)})
        key_arr = pa.array(keys, type=pa.string())

        def _keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(_composite_key(batch, spec),
                                         value_set=key_arr))

        ds = ds.map_batches(_keep, batch_format="pyarrow")
    if transform is not None:
        ds = ds.map_batches(transform, batch_format="pyarrow")
    build_index(ds, dst_index_dir, cfg, spec)
    stats = read_json(os.path.join(dst_index_dir, STATS_NAME))
    return int(stats["n_docs"])
