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
    POSTINGS_ROW_GROUP, IndexSpec, aggregate_dictionary,
)
from opensearch_jvector_ray.state.manifest import (
    CONFIG_NAME, DOCS_NAME, POSTINGS_NAME, STATS_NAME, SegmentManifest,
    StageTimer, completed_segments, read_json, segment_dir, write_json_atomic,
)


def plan_merge_groups(manifests: dict[int, Any], merge_factor: int) -> list[list[int]]:
    """Group input segments largest-first (leading-reader analog) so merge
    tasks are balanced; each group has up to ``merge_factor`` segments."""
    by_size = sorted(manifests, key=lambda s: -manifests[s].num_docs)
    n_groups = max(1, (len(by_size) + merge_factor - 1) // merge_factor)
    groups: list[list[int]] = [[] for _ in range(n_groups)]
    sizes = [0] * n_groups
    for seg in by_size:                      # greedy balance by doc count
        g = sizes.index(min(sizes))
        groups[g].append(seg)
        sizes[g] += manifests[seg].num_docs
    return [sorted(g) for g in groups if g]


def _drop_key_rank(tbl: pa.Table) -> pa.Table:
    """Strip a previous merge's key_rank column (re-derived per merge)."""
    return tbl.drop_columns(["key_rank"]) if "key_rank" in tbl.column_names else tbl


def _first_varint(blob: bytes) -> tuple[int, int]:
    """(value, byte_length) of the first varint in a blob."""
    val = 0
    shift = 0
    for i, byte in enumerate(blob):
        val |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return val, i + 1
        shift += 7
    raise ValueError("truncated varint")


def _encode_one_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


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

    # --- k-way walk over the sorted term rows of every input -------------
    timer.start("merge_postings")
    from opensearch_jvector_ray.postings import for_pack_block, for_unpack_block
    B = cfg.block_size
    views = []
    for i, post in enumerate(posts):
        views.append({
            "terms": post["term"].to_pylist(),
            "df": post["df"].to_numpy(zero_copy_only=False),
            "cf": post["cf"].to_numpy(zero_copy_only=False),
            "ords": post["ords_enc"].to_pylist(),
            "tfs": post["tfs_enc"].to_pylist(),
            "pos": post["pos_enc"].to_pylist(),
            "blast": post["blk_last_ord"].to_pylist(),
            "bmax": post["blk_max_tf"].to_pylist(),
            "bmin": post["blk_min_dl"].to_pylist(),
            "boff_o": post["blk_off_ord"].to_pylist(),
            "boff_t": post["blk_off_tf"].to_pylist(),
            "bn": (post["blk_n"].to_pylist()
                   if "blk_n" in post.column_names else None),
            "ptr": 0,
        })

    def _run_blk_n(v: dict, r: int) -> list[int]:
        if v["bn"] is not None:
            return list(v["bn"][r])
        df_run = int(v["df"][r])        # uniform build-time layout
        return [min(B, df_run - s) for s in range(0, df_run, B)]

    o_term, o_df, o_cf = [], [], []
    o_ords, o_tfs, o_pos = [], [], []
    o_blast, o_bmax, o_bmin, o_boffo, o_bofft, o_bn = [], [], [], [], [], []
    while True:
        cur = [v["terms"][v["ptr"]] for v in views if v["ptr"] < len(v["terms"])]
        if not cur:
            break
        term = min(cur)
        contrib = [(i, v) for i, v in enumerate(views)
                   if v["ptr"] < len(v["terms"]) and v["terms"][v["ptr"]] == term]
        df = cf = 0
        ord_chunks, tf_chunks, pos_chunks = [], [], []
        blast, bmax, bmin, boffo, bofft, bns = [], [], [], [], [], []
        cum_o = cum_t = 0
        prev_last = 0
        first_run = True
        for i, v in contrib:
            r = v["ptr"]
            v["ptr"] += 1
            off = int(offsets[i])
            blob_o = v["ords"][r]
            run_bn = _run_blk_n(v, r)
            if cfg.codec == "pfor":
                # re-pack ONLY the run's first block with the bridged gap;
                # splice the remaining blocks byte-for-byte
                boffs = v["boff_o"][r]
                first_len = int(boffs[1]) if len(boffs) > 1 else len(blob_o)
                gaps0 = for_unpack_block(blob_o[:first_len],
                                         run_bn[0]).astype(np.int64)
                gaps0[0] += off - (0 if first_run else prev_last)
                head = for_pack_block(gaps0.astype(np.uint64))
            else:
                first_val, first_len = _first_varint(blob_o)
                new_first = first_val + off - (0 if first_run else prev_last)
                head = _encode_one_varint(new_first)
            ord_chunks.append(head)
            ord_chunks.append(blob_o[first_len:])
            delta = len(head) - first_len
            run_blast = v["blast"][r]
            boffo.extend(cum_o + (o + delta if o > 0 else 0)
                         for o in v["boff_o"][r])
            cum_o += len(head) + len(blob_o) - first_len
            blast.extend(b + off for b in run_blast)
            bns.extend(run_bn)
            bmax.extend(v["bmax"][r])
            bmin.extend(v["bmin"][r])
            blob_t = v["tfs"][r]
            bofft.extend(cum_t + o for o in v["boff_t"][r])
            cum_t += len(blob_t)
            tf_chunks.append(blob_t)
            pos_chunks.append(v["pos"][r])
            df += int(v["df"][r])
            cf += int(v["cf"][r])
            prev_last = run_blast[-1] + off
            first_run = False
        o_term.append(term)
        o_df.append(df)
        o_cf.append(cf)
        o_ords.append(b"".join(ord_chunks))
        o_tfs.append(b"".join(tf_chunks))
        o_pos.append(b"".join(pos_chunks))
        o_blast.append(blast)
        o_bmax.append(bmax)
        o_bmin.append(bmin)
        o_boffo.append(boffo)
        o_bofft.append(bofft)
        o_bn.append(bns)
    postings_tbl = pa.table({
        "term": pa.array(o_term, type=pa.string()),
        "df": pa.array(o_df, type=pa.int32()),
        "cf": pa.array(o_cf, type=pa.int64()),
        "ords_enc": pa.array(o_ords, type=pa.large_binary()),
        "tfs_enc": pa.array(o_tfs, type=pa.large_binary()),
        "pos_enc": pa.array(o_pos, type=pa.large_binary()),
        "blk_last_ord": pa.array(o_blast, type=pa.list_(pa.int32())),
        "blk_max_tf": pa.array(o_bmax, type=pa.list_(pa.int32())),
        "blk_min_dl": pa.array(o_bmin, type=pa.list_(pa.int32())),
        "blk_off_ord": pa.array(o_boffo, type=pa.list_(pa.int64())),
        "blk_off_tf": pa.array(o_bofft, type=pa.list_(pa.int64())),
        "blk_n": pa.array(o_bn, type=pa.list_(pa.int32())),
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
        num_postings=int(sum(o_df)),
        rows_in=int(docs_all.num_rows),
        config_fingerprint=cfg.fingerprint(),
        lineage={"merged_from": [os.path.basename(d) for d in src_dirs],
                 "strategy": "bulk"},
        timings_sec={k: round(v, 4) for k, v in timer.timings.items()},
    )


def _merge_group(src_dirs: list[str], dst_dir: str, cfg: EngineConfig,
                 spec: IndexSpec, deletes_keys: pa.Array | None) -> SegmentManifest:
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
    if deletes_keys is not None and docs_all.num_rows:
        from opensearch_jvector_ray.stages.build import _composite_key
        mask = pc.invert(pc.is_in(_composite_key(docs_all, spec),
                                  value_set=deletes_keys))
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
        config_fingerprint=cfg.fingerprint(),
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

    del_keys = None
    if deletes:
        del_keys = pa.array(["\x1f".join(str(p) for p in key) for key in deletes],
                            type=pa.string())

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
            if del_keys is None:
                m = _bulk_merge_group(list(src_dirs), dst, cfg, spec)
            else:
                m = _merge_group(list(src_dirs), dst, cfg, spec, del_keys)
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
