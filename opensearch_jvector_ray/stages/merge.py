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
import shutil
import time
from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.postings import (
    POSTINGS_SCHEMA, decode_posting_list, decode_positions,
    encode_posting_arrays,
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


def _merge_group(src_dirs: list[str], dst_dir: str, cfg: EngineConfig,
                 spec: IndexSpec, deletes_keys: pa.Array | None) -> SegmentManifest:
    timer = StageTimer()
    timer.start("read_docs")
    docs_tables = [pq.read_table(os.path.join(d, DOCS_NAME)) for d in src_dirs]
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
