"""Table sources: testdata parquet readers + cached index builds.

Index builds for the driver's ``queries()`` calls are cached under
/tmp keyed by (sf_dir basename, config fingerprint, index-spec tag) —
the per-partition manifests make a half-built cache self-healing (build
resumes), and a config OR spec change changes the key.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.state.manifest import STATS_NAME
from opensearch_jvector_ray.synth import n_convs_for_sf, sf_from_dir, synth_parquet

CACHE_ROOT = "/tmp/ojr_cache"

DOCUMENTS_CFG = EngineConfig(num_segments=4)
DOCUMENTS_SPEC = IndexSpec(text_col="text", key_cols=("doc_id",),
                           store_cols=("lang", "source", "n_chars"),
                           ts_col="")
TRANSCRIPTS_CFG = EngineConfig(num_segments=8)
TRANSCRIPTS_SPEC = IndexSpec()


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def _index_complete(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, STATS_NAME))


def _spec_tag(spec: IndexSpec) -> str:
    """Cache-key component for the INDEX SPEC: the cfg fingerprint alone
    left a stale-cache hole — a code-side spec change (text_col /
    key_cols / store_cols) with a surviving /tmp cache would serve the
    OLD columns, because the caller-side completeness check skips
    build_index (whose own resume logic is spec-aware but never runs)."""
    import hashlib
    s = repr((spec.text_col, tuple(spec.key_cols),
              tuple(spec.store_cols), spec.ts_col))
    return hashlib.md5(s.encode()).hexdigest()[:8]


def documents_index(sf_dir: str) -> str:
    """Build (once) the BM25 index over the documents table."""
    key = os.path.basename(os.path.normpath(sf_dir))
    idx = os.path.join(CACHE_ROOT, f"docidx_{key}_{DOCUMENTS_CFG.fingerprint()}"
                       f"_{_spec_tag(DOCUMENTS_SPEC)}")
    if not _index_complete(idx):
        src = os.path.join(sf_dir, "documents.parquet")
        build_index(src, idx, DOCUMENTS_CFG, DOCUMENTS_SPEC,
                    lineage={"source": src})
    return idx


DOCUMENTS_STEM_CFG = EngineConfig(num_segments=4,
                                  stemmer="minimal_english")


def documents_index_stemmed(sf_dir: str) -> str:
    """Build (once) the BM25 index over documents with the
    minimal-english s-stemmer analyzer (stop -> stem chain)."""
    key = os.path.basename(os.path.normpath(sf_dir))
    idx = os.path.join(CACHE_ROOT,
                       f"docidx_{key}_{DOCUMENTS_STEM_CFG.fingerprint()}"
                       f"_{_spec_tag(DOCUMENTS_SPEC)}")
    if not _index_complete(idx):
        src = os.path.join(sf_dir, "documents.parquet")
        build_index(src, idx, DOCUMENTS_STEM_CFG, DOCUMENTS_SPEC,
                    lineage={"source": src})
    return idx


def documents_field_index(sf_dir: str, field: str) -> str:
    """Build (once) a PER-FIELD BM25 index over one documents column —
    the multi_match substrate: each field is its own index with its own
    postings and df/N/avgdl (Lucene's per-field term spaces)."""
    spec = IndexSpec(text_col=field, key_cols=("doc_id",),
                     store_cols=(), ts_col="")
    key = os.path.basename(os.path.normpath(sf_dir))
    idx = os.path.join(
        CACHE_ROOT, f"docidx_{key}_f{field}_{DOCUMENTS_CFG.fingerprint()}"
                    f"_{_spec_tag(spec)}")
    if not _index_complete(idx):
        src = os.path.join(sf_dir, "documents.parquet")
        build_index(src, idx, DOCUMENTS_CFG, spec,
                    lineage={"source": src, "field": field})
    return idx


def transcripts_path(sf_dir: str) -> str:
    """Deterministic synthetic transcripts parquet scaled to the sf."""
    return synth_parquet(n_convs_for_sf(sf_from_dir(sf_dir)))


def transcripts_index(sf_dir: str) -> str:
    key = os.path.basename(os.path.normpath(sf_dir))
    idx = os.path.join(CACHE_ROOT, f"tridx_{key}_{TRANSCRIPTS_CFG.fingerprint()}"
                       f"_{_spec_tag(TRANSCRIPTS_SPEC)}")
    if not _index_complete(idx):
        path = transcripts_path(sf_dir)
        build_index(path, idx, TRANSCRIPTS_CFG, TRANSCRIPTS_SPEC,
                    lineage={"source": path})
    return idx


CONVERSATIONS_SPEC = IndexSpec(text_col="conv_text",
                               key_cols=("conv_id",),
                               store_cols=("n_turns",), ts_col="")


def conversations_index(sf_dir: str) -> str:
    """Assemble conversations (turns -> one doc per conv_id) and build
    (once) a conversation-level BM25 index over them — the composite
    that connects the transcript-assembly operator to the flagship
    engine.  Assembly output is staged to cached parquet so the build
    takes the zero-shuffle fragment path."""
    from opensearch_jvector_ray.pipelines.transcripts import (
        assemble_conversations,
    )
    key = os.path.basename(os.path.normpath(sf_dir))
    conv_dir = os.path.join(CACHE_ROOT, f"convs_{key}")
    marker = os.path.join(conv_dir, "_SUCCESS")
    if not os.path.exists(marker):
        # stage into a process-private tmp dir and atomically rename:
        # a crash never leaves a half-written blessed dir, and two
        # concurrent builders each write their own tmp — the rename
        # loser just discards its copy (identical content: synthesis is
        # deterministic)
        import shutil
        tmp = f"{conv_dir}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        assemble_conversations(
            rd.read_parquet(transcripts_path(sf_dir))).write_parquet(tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        try:
            os.rename(tmp, conv_dir)
        except OSError:
            if os.path.exists(marker):
                # another builder won the rename; identical content
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # stale marker-less dir from an old crashed run: replace
                shutil.rmtree(conv_dir, ignore_errors=True)
                os.rename(tmp, conv_dir)
    idx = os.path.join(CACHE_ROOT,
                       f"convidx_{key}_{TRANSCRIPTS_CFG.fingerprint()}"
                       f"_{_spec_tag(CONVERSATIONS_SPEC)}")
    if not _index_complete(idx):
        build_index(conv_dir, idx, TRANSCRIPTS_CFG, CONVERSATIONS_SPEC,
                    lineage={"source": conv_dir})
    return idx


def query_embeddings(sf_dir: str, vec_ids: list[int]) -> dict[str, np.ndarray]:
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        filters=[("vec_id", "in", vec_ids)])
    out = {}
    for i in range(tbl.num_rows):
        vid = tbl["vec_id"][i].as_py()
        out[f"vq{vid}"] = np.array(tbl["embedding"][i].as_py(), dtype=np.float64)
    return out
