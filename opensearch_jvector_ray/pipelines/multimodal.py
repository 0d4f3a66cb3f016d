"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
typed metadata struct; decode / feature-extract stages are actor-pool
``map_batches`` stages whose Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.

Codec status (honest):
  - **audio: REAL** — WAV (PCM16) payloads are decoded with the stdlib
    ``wave`` module and featurized (duration, RMS, zero-crossing rate +
    pooled magnitude spectrum), no external library needed;
  - image/video: STUBBED — PIL/ffmpeg are not available in this
    environment; ``DecodeStub`` raises ``NotImplementedError`` for them
    unless constructed with ``fake=True``, in which case every kind gets
    a deterministic payload-hash fake so downstream stages and tests are
    exercised end-to-end.

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


def wav_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono PCM16 WAV encoding of a float waveform in [-1, 1] (stdlib)."""
    import io
    import wave
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_audio_table(n: int, seed: int = 42, rate: int = 16000) -> pa.Table:
    """Deterministic REAL WAV rows: seeded sine + noise per row."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        dur = float(rng.uniform(0.05, 0.25))
        freq = float(rng.uniform(200, 4000))
        t = np.arange(int(dur * rate)) / rate
        wave_f = (0.7 * np.sin(2 * np.pi * freq * t)
                  + 0.05 * rng.standard_normal(len(t)))
        rows.append((wav_bytes(wave_f, rate), len(t)))
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(["audio"] * n, type=pa.string()),
        "payload": pa.array([p for p, _ in rows], type=pa.binary()),
        "meta": pa.array([{"width": 0, "height": 0, "sample_rate": rate,
                           "n_frames": nf} for _, nf in rows],
                         type=MEDIA_SCHEMA.field("meta").type),
    })


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows for plumbing tests (audio rows carry REAL
    WAV payloads; image/video payloads are opaque bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    payloads = []
    for k in kinds:
        if k == "audio":
            freq = float(rng.uniform(200, 4000))
            t = np.arange(int(0.05 * 16000)) / 16000.0
            payloads.append(wav_bytes(0.7 * np.sin(2 * np.pi * freq * t)))
        else:
            payloads.append(rng.integers(0, 256,
                                         size=int(rng.integers(64, 512)),
                                         dtype=np.uint8).tobytes())
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
        if self.fake:
            h = hashlib.sha256(payload).digest()
            raw = np.frombuffer((h * ((self.feature_dim * 8) // len(h) + 1))
                                [: self.feature_dim * 8], dtype=np.uint64)
            return (raw % 1000).astype(np.float32) / 1000.0
        if kind == "audio":
            return self._decode_audio(payload)
        raise NotImplementedError(
            f"{kind} codecs (PIL/ffmpeg) are unavailable in this "
            f"environment; audio (WAV) decodes for real — construct "
            f"DecodeStub(fake=True) for a deterministic stub of the rest")

    def _decode_audio(self, payload: bytes) -> np.ndarray:
        """REAL WAV decode + featurize (stdlib wave): feature vector =
        [duration_sec, rms, zero_crossing_rate, pooled |rfft| bins]."""
        import io
        import wave as wave_mod
        with wave_mod.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            pcm = np.frombuffer(w.readframes(n), dtype="<i2")
        x = pcm.astype(np.float64) / 32768.0
        dur = n / float(rate or 1)
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
            if len(x) > 1 else 0.0
        d_spec = max(1, self.feature_dim - 3)
        spec = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
        edges = np.linspace(0, len(spec), d_spec + 1).astype(np.int64)
        pooled = np.array([spec[a:b].mean() if b > a else 0.0
                           for a, b in zip(edges[:-1], edges[1:])])
        denom = pooled.max() or 1.0
        out = np.concatenate([[dur, rms, zcr], pooled / denom])
        return out[: self.feature_dim].astype(np.float32)

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
