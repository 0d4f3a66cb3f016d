"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
typed metadata struct; decode / feature-extract stages are actor-pool
``map_batches`` stages whose Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested, while the actual
codec calls are STUBBED — the image/audio libraries are not available in
this environment.  ``DecodeStub`` raises ``NotImplementedError`` unless
constructed with ``fake=True``, in which case it produces a
deterministic fake decode (seeded by the payload hash) so downstream
stages and tests are exercised end-to-end.

Design notes for 100 TB operation (why this shape):
  - binary payloads are large -> ``batch_size`` here defaults SMALL (64)
    so batch x concurrency fits worker heaps; blocks of binary rows are
    never converted to pandas (object boxing) — pyarrow in/out only.
  - decoders are stateful (codec contexts) -> callable CLASS, pool via
    ``concurrency=N``; setup happens once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("sample_rate", pa.int32()), ("n_frames", pa.int32())])),
])


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    meta = [{"width": int(rng.integers(16, 256)), "height": int(rng.integers(16, 256)),
             "sample_rate": 16000, "n_frames": int(rng.integers(1, 64))}
            for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.tolist(), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta": pa.array(meta, type=MEDIA_SCHEMA.field("meta").type),
    })


class DecodeStub:
    """Actor-pool decode stage: binary payload -> fixed-size feature vector.

    Real deployments replace ``_decode_one`` with PIL/ffmpeg/torchaudio
    calls; everything around it (actor lifecycle, zero-copy batch IO,
    output schema) is production-shaped.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake
        # stateful setup happens ONCE per actor (codec contexts, models)

    def _decode_one(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are unavailable in this environment; "
                "construct DecodeStub(fake=True) for the deterministic stub")
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.feature_dim * 8) // len(h) + 1))
                            [: self.feature_dim * 8], dtype=np.uint64)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p, k) for p, k in
                 zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())]
        mat = np.stack(feats) if feats else np.zeros((0, self.feature_dim), np.float32)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.array(list(mat), type=pa.list_(pa.float32())),
        })


def decode_features(ds, *, feature_dim: int = 16, fake: bool = False,
                    concurrency: int = 2, batch_size: int = 64):
    """media table -> (media_id, kind, feature list<float32>)."""
    return ds.map_batches(DecodeStub, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1,
                          fn_constructor_kwargs={"feature_dim": feature_dim,
                                                 "fake": fake})
