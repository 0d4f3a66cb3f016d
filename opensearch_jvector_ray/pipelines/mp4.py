"""Pure-Python MP4 (ISO BMFF) demux + H.264 SPS parsing — no ffmpeg.

Scope (honest): this module DEMUXES real MP4/ISO-BMFF containers and
PARSES the H.264 sequence parameter set — container structure, codec
identity, true coded dimensions (incl. frame cropping), frame count,
duration, fps, keyframe map and per-sample sizes.  It does NOT decode
H.264 pixel data (CABAC/CAVLC entropy decode needs a real codec;
``ffmpeg`` is unavailable in this environment) — and it doesn't need
to for the curation features a training-data pipeline filters on
(resolution, duration, fps, bitrate, keyframe density, motion proxy
via sample-size variance).

Everything here is implemented from public specifications only:
  - ISO/IEC 14496-12 box grammar (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/
    stbl/stsd/stts/stsc/stsz/stco/stss) — the widely published MP4
    atom layout;
  - ISO/IEC 14496-15 AVCDecoderConfigurationRecord (the ``avcC`` box);
  - ITU-T H.264 (08/2021) §7.3.2.1 seq_parameter_set_rbsp syntax with
    Exp-Golomb coding (§9.1) and §7.4.2.1.1 cropping arithmetic.

Reference parity note: the reference engine has no video path at all —
this module exists for the builder's multimodal-column requirement; the
synth writer exists so gates/tests exercise a REAL container without
shipping binary fixtures.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# Exp-Golomb bit I/O (H.264 §9.1)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val: int) -> None:
        # Exp-Golomb: M zero bits, 1, M-bit info (val+1 has M+1 bits)
        code = val + 1
        m = code.bit_length() - 1
        self.u(0, m) if m else None
        self.u(code, m + 1)

    def se(self, val: int) -> None:
        self.ue(2 * val - 1 if val > 0 else -2 * val)

    def rbsp_bytes(self) -> bytes:
        bits = self.bits + [1]                      # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i: i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(nal: bytes) -> bytes:
    """Remove 0x000003 emulation-prevention bytes (H.264 §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in nal:
        if zeros >= 2 and b == 0x03:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# ---------------------------------------------------------------------------
# H.264 SPS (§7.3.2.1)
# ---------------------------------------------------------------------------

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128,
                  138, 139, 134, 135}


def sps_encode(width: int, height: int, *, profile_idc: int = 66,
               level_idc: int = 30) -> bytes:
    """Minimal valid baseline-profile SPS NAL for the given coded
    dimensions (frame_mbs_only, 4:2:0 default chroma; odd-pixel crop is
    unrepresentable at 4:2:0 — crop units are 2px — so dims must be
    even, the same constraint real encoders impose)."""
    if width % 2 or height % 2:
        raise ValueError("H.264 4:2:0 cropping works in 2px units; "
                         "dimensions must be even")
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)                       # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)                         # seq_parameter_set_id
    w.ue(0)                         # log2_max_frame_num_minus4
    w.ue(0)                         # pic_order_cnt_type
    w.ue(0)                         # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)                         # max_num_ref_frames
    w.u(0, 1)                       # gaps_in_frame_num_value_allowed
    w.ue(mb_w - 1)                  # pic_width_in_mbs_minus1
    w.ue(mb_h - 1)                  # pic_height_in_map_units_minus1
    w.u(1, 1)                       # frame_mbs_only_flag
    w.u(1, 1)                       # direct_8x8_inference_flag
    crop_r = (16 * mb_w - width) // 2
    crop_b = (16 * mb_h - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)                   # frame_cropping_flag
        w.ue(0)                     # crop_left
        w.ue(crop_r)                # crop_right (units of 2px, 4:2:0)
        w.ue(0)                     # crop_top
        w.ue(crop_b)                # crop_bottom
    else:
        w.u(0, 1)
    w.u(0, 1)                       # vui_parameters_present_flag
    return b"\x67" + w.rbsp_bytes()  # nal_ref_idc=3, type=7


def sps_parse(nal: bytes) -> dict:
    """Decode an SPS NAL to (profile, level, coded width/height) —
    §7.3.2.1 syntax incl. the high-profile chroma block, scaling-list
    skip, both pic_order_cnt_type branches, and §7.4.2.1.1 cropping."""
    if not nal or (nal[0] & 0x1F) != 7:
        raise ValueError("not an SPS NAL")
    r = _BitReader(_strip_emulation(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)                          # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()                          # sps_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)                  # separate_colour_plane_flag
        r.ue()                      # bit_depth_luma_minus8
        r.ue()                      # bit_depth_chroma_minus8
        r.u(1)                      # qpprime_y_zero_transform_bypass
        if r.u(1):                  # seq_scaling_matrix_present
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):          # seq_scaling_list_present[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()                          # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()                      # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)                      # delta_pic_order_always_zero
        r.se()                      # offset_for_non_ref_pic
        r.se()                      # offset_for_top_to_bottom_field
        for _ in range(r.ue()):     # num_ref_frames_in_pic_order_cnt
            r.se()
    r.ue()                          # max_num_ref_frames
    r.u(1)                          # gaps_in_frame_num_value_allowed
    mb_w = r.ue() + 1
    map_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                      # mb_adaptive_frame_field_flag
    r.u(1)                          # direct_8x8_inference_flag
    crop = [0, 0, 0, 0]
    if r.u(1):                      # frame_cropping_flag
        crop = [r.ue() for _ in range(4)]
    # §7.4.2.1.1: crop units (SubWidthC/SubHeightC scaled by field mode)
    sub_w = {0: 1, 1: 2, 2: 2, 3: 1}[chroma_format_idc]
    sub_h = {0: 1, 1: 2, 2: 1, 3: 1}[chroma_format_idc]
    unit_x = sub_w if chroma_format_idc else 1
    unit_y = (sub_h if chroma_format_idc else 1) * (2 - frame_mbs_only)
    height_mbs = (2 - frame_mbs_only) * map_h
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": 16 * mb_w - unit_x * (crop[0] + crop[1]),
        "height": 16 * height_mbs - unit_y * (crop[2] + crop[3]),
    }


# ---------------------------------------------------------------------------
# ISO BMFF boxes
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version)
                + struct.pack(">I", flags)[1:] + payload)


# minimal valid PPS NAL (pps_id=0 -> sps_id=0, CAVLC, the canonical
# 4-byte form every minimal encoder emits)
_MIN_PPS = b"\x68\xce\x38\x80"


def _audio_trak_stub(n_samples: int = 40, rate: int = 48000) -> bytes:
    """Minimal mp4a AUDIO trak (hdlr 'soun') — prepended before the
    video trak by the audio_first synth mode so the parser's
    first-VIDEO-trak selection is exercised against the common real
    mux order."""
    mp4a = _box(b"mp4a", b"\x00" * 6 + struct.pack(">H", 1)
                + b"\x00" * 8
                + struct.pack(">HHI", 2, 16, 0)
                + struct.pack(">I", rate << 16))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + mp4a)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_samples, 1024))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_samples, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 256, n_samples))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    minf = _box(b"minf", smhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"soun"
                 + b"\x00" * 12 + b"SoundHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, rate,
                                            n_samples * 1024,
                                            0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3, struct.pack(">IIIII", 0, 0, 2, 0, 0)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", 0, 0))
    return _box(b"trak", tkhd + mdia)


def mp4_bytes(width: int, height: int, sample_sizes: list[int], *,
              fps: float = 25.0, keyframe_every: int = 8,
              media_timescale: int = 12800,
              payload_fill: int = 0x41,
              audio_first: bool = False) -> bytes:
    """Write a minimal REAL MP4: ftyp + mdat (fill bytes standing in for
    coded AVC samples — the container metadata is what this module
    reads back) + a complete moov with one avc1 video track whose avcC
    carries a genuine SPS for (width, height)."""
    n = len(sample_sizes)
    delta = int(round(media_timescale / fps))
    media_dur = n * delta
    movie_ts = 1000
    movie_dur = int(round(media_dur * movie_ts / media_timescale))

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2avc1mp41")
    mdat_payload = bytes([payload_fill]) * int(sum(sample_sizes))
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8            # first sample byte in file

    sps = sps_encode(width, height)
    avcc = _box(b"avcC", bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
                + struct.pack(">H", len(sps)) + sps
                + b"\x01" + struct.pack(">H", len(_MIN_PPS)) + _MIN_PPS)
    avc1 = _box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1)
                + b"\x00" * 16
                + struct.pack(">HH", width, height)
                + struct.pack(">II", 0x00480000, 0x00480000)
                + struct.pack(">I", 0) + struct.pack(">H", 1)
                + b"\x00" * 32
                + struct.pack(">Hh", 24, -1) + avcc)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sample_sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    keys = list(range(1, n + 1, max(1, keyframe_every)))
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(keys))
                 + b"".join(struct.pack(">I", k) for k in keys))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0,
                                            media_timescale, media_dur,
                                            0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 3, struct.pack(">IIIII", 0, 0, 1, 0,
                                            movie_dur)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    if audio_first:
        trak = _audio_trak_stub() + trak
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, movie_ts,
                                            movie_dur)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 3))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the sibling boxes
    in data[start:end] (64-bit largesize handled)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {typ!r} at {pos}")
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """Payload range of the first box matching the nested path."""
    for typ, b, e in _walk(data, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return b, e
            return _find(data, b, e, *path[1:])
    raise ValueError(f"box {path[0]!r} not found")


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def mp4_parse(payload: bytes) -> dict:
    """Demux an MP4: container metadata + the parsed SPS of the first
    video track.  Raises ValueError on a non-BMFF payload AND on any
    truncated/corrupt container (struct/index errors from damaged bytes
    are normalized to ValueError — a decode stage at corpus scale must
    see ONE error type for bad payloads, not crash-shaped ones)."""
    try:
        return _mp4_parse_inner(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError, MemoryError) as ex:
        raise ValueError(f"truncated/corrupt mp4: {ex}") from ex


def _mp4_parse_inner(payload: bytes) -> dict:
    if not is_mp4(payload):
        raise ValueError("not an ISO-BMFF (mp4) payload")
    end = len(payload)
    fb, fe = _find(payload, 0, end, b"ftyp")
    brand = payload[fb: fb + 4].decode("latin1")
    mb, me = _find(payload, 0, end, b"moov")

    hb, he = _find(payload, mb, me, b"mvhd")
    ver = payload[hb]
    if ver == 1:
        movie_ts, movie_dur = struct.unpack_from(">IQ", payload, hb + 20)
    else:
        movie_ts, movie_dur = struct.unpack_from(">II", payload, hb + 12)

    # the first VIDEO trak, not the first trak: real muxes commonly
    # put the audio trak first, and resolving stbl inside an mp4a trak
    # would silently read audio fields as video dims (hdlr handler_type
    # is the spec's discriminator, 14496-12 8.4.3)
    vtrak = None
    for typ, b_, e_ in _walk(payload, mb, me):
        if typ != b"trak":
            continue
        try:
            hh, _ = _find(payload, b_, e_, b"mdia", b"hdlr")
        except ValueError:
            continue
        if payload[hh + 8: hh + 12] == b"vide":
            vtrak = (b_, e_)
            break
    if vtrak is None:
        raise ValueError("no video trak (hdlr 'vide') in moov")
    vb, ve = vtrak

    db, de = _find(payload, vb, ve, b"mdia", b"mdhd")
    ver = payload[db]
    if ver == 1:
        media_ts, media_dur = struct.unpack_from(">IQ", payload, db + 20)
    else:
        media_ts, media_dur = struct.unpack_from(">II", payload, db + 12)

    sb, se_ = _find(payload, vb, ve, b"mdia", b"minf", b"stbl")
    eb, ee = _find(payload, sb, se_, b"stsd")
    # first sample entry sits after version/flags + entry_count
    _, entry_b, entry_e = next(_walk(payload, eb + 8, ee))
    codec = payload[entry_b - 4: entry_b].decode("latin1")
    out: dict = {"brand": brand, "codec": codec,
                 "movie_timescale": int(movie_ts),
                 "duration_sec": (movie_dur / movie_ts) if movie_ts
                 else 0.0}
    out["width"], out["height"] = struct.unpack_from(
        ">HH", payload, entry_b + 24)
    if codec in ("avc1", "avc3"):
        try:
            ab, ae = _find(payload, entry_b + 78, entry_e, b"avcC")
            n_sps = payload[ab + 5] & 0x1F
            if n_sps:
                (sl,) = struct.unpack_from(">H", payload, ab + 6)
                out["sps"] = sps_parse(payload[ab + 8: ab + 8 + sl])
                # the SPS is the authoritative coded size
                out["width"] = out["sps"]["width"]
                out["height"] = out["sps"]["height"]
        except ValueError:
            pass                     # avc1 without avcC: keep stsd dims

    tb, te = _find(payload, sb, se_, b"stts")
    (n_ent,) = struct.unpack_from(">I", payload, tb + 4)
    n_frames = 0
    total_ticks = 0
    for i in range(n_ent):
        cnt, delta = struct.unpack_from(">II", payload, tb + 8 + 8 * i)
        n_frames += cnt
        total_ticks += cnt * delta
    out["n_frames"] = int(n_frames)
    out["fps"] = (n_frames * media_ts / total_ticks) if total_ticks \
        else 0.0

    zb, ze = _find(payload, sb, se_, b"stsz")
    uniform, cnt = struct.unpack_from(">II", payload, zb + 4)
    if uniform:
        sizes = np.full(cnt, uniform, dtype=np.int64)
    else:
        sizes = np.frombuffer(payload, dtype=">u4", count=cnt,
                              offset=zb + 12).astype(np.int64)
    out["sample_sizes"] = sizes
    try:
        kb, ke = _find(payload, sb, se_, b"stss")
        (nk,) = struct.unpack_from(">I", payload, kb + 4)
        out["keyframes"] = np.frombuffer(payload, dtype=">u4", count=nk,
                                         offset=kb + 8).astype(np.int64)
    except ValueError:
        # no stss box => every sample is a sync sample (BMFF rule)
        out["keyframes"] = np.arange(1, n_frames + 1, dtype=np.int64)
    return out


def mp4_features(payload: bytes, feature_dim: int = 16) -> np.ndarray:
    """Curation feature vector from container metadata alone:
    [n_frames, w, h, duration_sec, fps, keyframe_ratio, mean_sample_kb,
    std_sample_kb, bitrate_mbps, motion proxy (sample-size cv)]."""
    m = mp4_parse(payload)
    sizes = m["sample_sizes"].astype(np.float64)
    dur = float(m["duration_sec"]) or 1e-9
    mean_kb = float(sizes.mean()) / 1e3 if len(sizes) else 0.0
    std_kb = float(sizes.std()) / 1e3 if len(sizes) else 0.0
    out = np.array([
        float(m["n_frames"]), float(m["width"]), float(m["height"]),
        float(m["duration_sec"]), float(m["fps"]),
        len(m["keyframes"]) / max(1, m["n_frames"]),
        mean_kb, std_kb,
        float(sizes.sum()) * 8 / dur / 1e6,
        (std_kb / mean_kb) if mean_kb else 0.0,
    ])
    out = np.pad(out, (0, max(0, feature_dim - len(out))))
    return out[:feature_dim].astype(np.float32)


def synth_mp4_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL MP4 rows (valid BMFF structure + genuine SPS;
    sample payloads are fill bytes — the features under test are
    container-derived)."""
    from opensearch_jvector_ray.pipelines.multimodal import MEDIA_SCHEMA
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        w = int(rng.integers(4, 40)) * 16
        h = int(rng.integers(4, 24)) * 16 + int(rng.integers(0, 8)) * 2
        nf = int(rng.integers(8, 120))
        fps = float(rng.choice([24.0, 25.0, 30.0]))
        sizes = rng.integers(400, 4000, size=nf).tolist()
        rows.append((mp4_bytes(w, h, sizes, fps=fps), w, h, nf))
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(["video"] * n, type=pa.string()),
        "payload": pa.array([p for p, *_ in rows], type=pa.binary()),
        "meta": pa.array([{"width": w, "height": h, "sample_rate": 0,
                           "n_frames": nf} for _, w, h, nf in rows],
                         type=MEDIA_SCHEMA.field("meta").type),
    })
