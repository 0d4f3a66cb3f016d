"""Per-partition manifests: checkpoint + lineage records.

The analog of the reference's per-segment metadata record + commit point
(`VectorIndexFieldMetadata`, `JVectorWriter.java:419-457`; durable segment
files enable restart/upgrade resume, `qa/restart-upgrade/`).  A segment
directory is COMPLETE iff its ``manifest.json`` exists; the manifest is
written last via atomic rename, so a killed build leaves either a complete
segment (skipped on resume) or an incomplete one (rebuilt).  This is the
north rule's "resumable from per-partition checkpoints with lineage and
per-stage metrics".
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, asdict
from typing import Any

MANIFEST_NAME = "manifest.json"
CONFIG_NAME = "config.json"
STATS_NAME = "stats.json"
DICTIONARY_NAME = "dictionary.parquet"
POSTINGS_NAME = "postings.parquet"
DOCS_NAME = "docs.parquet"
SEGMENTS_DIR = "segments"


def segment_dir(index_dir: str, seg: int) -> str:
    return os.path.join(index_dir, SEGMENTS_DIR, f"seg={seg:05d}")


@dataclass
class SegmentManifest:
    """Checkpoint + lineage + per-stage metrics for one segment build."""

    seg: int
    num_docs: int                 # rows in the docs table
    num_docs_indexed: int         # docs with >= 1 surviving token
    sum_doc_len: int              # sum of post-stopword token counts
    num_terms: int
    num_postings: int
    rows_in: int                  # input rows before dedup/LWW
    config_fingerprint: str
    lineage: dict[str, Any] = field(default_factory=dict)
    timings_sec: dict[str, float] = field(default_factory=dict)
    engine_version: str = "0.1.0"

    def write(self, seg_dir: str) -> None:
        path = os.path.join(seg_dir, MANIFEST_NAME)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1, sort_keys=True)
        os.replace(tmp, path)      # atomic: manifest presence == completeness

    @classmethod
    def read(cls, seg_dir: str) -> "SegmentManifest":
        with open(os.path.join(seg_dir, MANIFEST_NAME)) as f:
            return cls(**json.load(f))


def completed_segments(index_dir: str) -> dict[int, SegmentManifest]:
    """Segments whose manifest exists (the resume set)."""
    root = os.path.join(index_dir, SEGMENTS_DIR)
    out: dict[int, SegmentManifest] = {}
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        seg_dir = os.path.join(root, name)
        if name.startswith("seg=") and os.path.exists(os.path.join(seg_dir, MANIFEST_NAME)):
            m = SegmentManifest.read(seg_dir)
            out[m.seg] = m
    return out


def write_json_atomic(path: str, obj: Any) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


class StageTimer:
    """Tiny per-stage wall-clock recorder (T7/A5 analog: KNNStats counters,
    `plugin/stats/KNNStats.java:28-78`, merge-time metric
    `JVectorWriter.java:178-190`)."""

    def __init__(self) -> None:
        self.timings: dict[str, float] = {}
        self._t0: float | None = None
        self._stage: str | None = None

    def start(self, stage: str) -> None:
        self._stage, self._t0 = stage, time.perf_counter()

    def stop(self) -> None:
        if self._stage is not None and self._t0 is not None:
            self.timings[self._stage] = self.timings.get(self._stage, 0.0) + (
                time.perf_counter() - self._t0)
        self._stage = self._t0 = None
