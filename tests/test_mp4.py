"""MP4/H.264-SPS demux tests: writer->parser round-trips on the synth
container, SPS bit-exact round-trips incl. cropping, and the multimodal
decode path over a real-container table."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.pipelines import mp4 as m4
from opensearch_jvector_ray.pipelines import multimodal as mm


def test_sps_roundtrip_aligned():
    sps = m4.sps_encode(1920, 1088)
    got = m4.sps_parse(sps)
    assert (got["width"], got["height"]) == (1920, 1088)
    assert got["profile_idc"] == 66


@pytest.mark.parametrize("w,h", [(1920, 1080), (1280, 720), (640, 360),
                                 (100, 50), (16, 16), (3840, 2160)])
def test_sps_roundtrip_cropped(w, h):
    got = m4.sps_parse(m4.sps_encode(w, h))
    assert (got["width"], got["height"]) == (w, h)


def test_sps_rejects_odd_dims_and_non_sps():
    with pytest.raises(ValueError, match="even"):
        m4.sps_encode(641, 360)
    with pytest.raises(ValueError, match="SPS"):
        m4.sps_parse(b"\x68\xce\x38\x80")      # a PPS, not an SPS


def test_exp_golomb_roundtrip():
    w = m4._BitWriter()
    vals = [0, 1, 2, 7, 8, 255, 1000]
    svals = [0, 1, -1, 5, -5, 200, -200]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    r = m4._BitReader(w.rbsp_bytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_mp4_roundtrip_metadata():
    sizes = [500, 700, 900, 1100, 1300, 1500, 1700, 1900, 2100, 2300]
    payload = m4.mp4_bytes(1280, 720, sizes, fps=25.0, keyframe_every=4)
    got = m4.mp4_parse(payload)
    assert got["brand"] == "isom"
    assert got["codec"] == "avc1"
    assert (got["width"], got["height"]) == (1280, 720)
    assert got["n_frames"] == 10
    assert got["fps"] == pytest.approx(25.0, rel=1e-3)
    assert got["duration_sec"] == pytest.approx(10 / 25.0, abs=2e-3)
    assert got["sample_sizes"].tolist() == sizes
    assert got["keyframes"].tolist() == [1, 5, 9]
    assert got["sps"]["profile_idc"] == 66


def test_mp4_audio_first_mux_order_selects_video_trak():
    """Real muxes commonly put the audio trak first: the parser must
    select the first VIDEO trak (hdlr 'vide'), never read mp4a fields
    as video dims."""
    sizes = [900] * 20
    plain = m4.mp4_parse(m4.mp4_bytes(1280, 720, sizes, fps=30.0))
    afirst = m4.mp4_parse(m4.mp4_bytes(1280, 720, sizes, fps=30.0,
                                       audio_first=True))
    for key in ("width", "height", "n_frames", "fps", "codec"):
        assert afirst[key] == plain[key], key
    assert afirst["sample_sizes"].tolist() == sizes


def test_first_pass_k_cap_only_on_defaults():
    from opensearch_jvector_ray.pipelines.pq import first_pass_k
    # defaults: dimension rule + compression floor + 10000 cap
    assert first_pass_k(10, None, 128, 16) == 400
    assert first_pass_k(10_000, None, 128, 8) == 10_000   # capped
    # EXPLICIT oversample is trusted uncapped — the degenerate-exact
    # (full-corpus first pass == brute force) gate contract
    assert first_pass_k(10, 5_000.0, 128, 16) == 50_000
    assert first_pass_k(10, 1.0, 128, 16) == 400          # floor holds


def test_mp4_parse_rejects_foreign():
    with pytest.raises(ValueError, match="mp4"):
        m4.mp4_parse(b"\x00" * 64)
    with pytest.raises(ValueError, match="mp4"):
        m4.mp4_parse(mm.video_bytes(
            [np.zeros((8, 8, 3), dtype=np.uint8)]))


def test_mp4_features_planted_values():
    sizes = [1000] * 50
    payload = m4.mp4_bytes(640, 360, sizes, fps=25.0, keyframe_every=10)
    f = m4.mp4_features(payload, feature_dim=16)
    assert f[:5].tolist() == [50.0, 640.0, 360.0,
                              pytest.approx(2.0, abs=1e-2),
                              pytest.approx(25.0, rel=1e-3)]
    assert f[5] == pytest.approx(5 / 50)          # keyframe ratio
    assert f[6] == pytest.approx(1.0)             # mean sample kB
    assert f[7] == pytest.approx(0.0)             # std (uniform sizes)
    # bitrate: 50 kB * 8 / 2 s = 0.2 Mbps
    assert f[8] == pytest.approx(0.2, rel=1e-2)


def test_decode_features_over_mp4_table():
    tbl = m4.synth_mp4_table(40, seed=9)
    out = mm.decode_features(rd.from_arrow(tbl), fake=False).to_pandas()
    assert len(out) == 40
    feats = np.stack(out.sort_values("media_id").feature.to_numpy())
    meta = tbl["meta"].to_pylist()
    np.testing.assert_array_equal(feats[:, 0],
                                  [m["n_frames"] for m in meta])
    np.testing.assert_array_equal(feats[:, 1],
                                  [m["width"] for m in meta])
    np.testing.assert_array_equal(feats[:, 2],
                                  [m["height"] for m in meta])
    assert (feats[:, 4] > 0).all()                # fps present


def test_mp4_parse_corruption_fuzz_single_error_type():
    """Damaged containers must surface as ValueError only — a decode
    stage at corpus scale needs ONE error type for bad payloads, never
    struct.error/IndexError crash shapes."""
    rng = np.random.default_rng(17)
    good = m4.mp4_bytes(640, 368, [800] * 12, fps=30.0)
    for _ in range(60):
        bad = bytearray(good)
        mode = rng.integers(0, 3)
        if mode == 0:                                 # truncate
            bad = bad[: int(rng.integers(9, len(bad)))]
        elif mode == 1:                               # byte flips
            for _ in range(int(rng.integers(1, 8))):
                bad[int(rng.integers(0, len(bad)))] = int(
                    rng.integers(0, 256))
        else:                                         # size-field smash
            off = int(rng.integers(0, len(bad) - 4))
            bad[off: off + 4] = rng.integers(
                0, 256, 4, dtype=np.uint8).tobytes()
        try:
            m4.mp4_parse(bytes(bad))
        except ValueError:
            pass                                      # the contract
        # (a mutation that stays parseable is fine too)


def test_decode_features_on_error_modes():
    tbl = m4.synth_mp4_table(6, seed=2)
    bad = b"\x00\x00\x00\x20ftyp" + b"\x99" * 8      # truncated BMFF
    payloads = tbl["payload"].to_pylist()
    payloads[2] = bad
    tbl = tbl.set_column(2, "payload",
                         pa.array(payloads, type=pa.binary()))
    ds = rd.from_arrow(tbl)
    with pytest.raises(Exception):                   # strict default
        mm.decode_features(ds, fake=False).to_pandas()
    skipped = mm.decode_features(ds, fake=False,
                                 on_error="skip").to_pandas()
    assert sorted(skipped["media_id"]) == [0, 1, 3, 4, 5]
    # consume as Arrow: a list<float32> column with nulls is exactly
    # what Arrow represents natively (pandas' tensor-extension cast
    # can't hold ragged nulls — that's a pandas limitation, not ours)
    nt = pa.concat_tables(list(
        mm.decode_features(ds, fake=False, on_error="null")
        .iter_batches(batch_format="pyarrow")))
    nt = nt.take(pa.compute.sort_indices(nt["media_id"]))
    assert nt.num_rows == 6
    assert nt["feature"].combine_chunks().is_null().to_pylist() == [
        False, False, True, False, False, False]


def test_mixed_ojrv_and_mp4_batch():
    """One decode stage handles both container families in one batch."""
    ojrv = mm.synth_video_table(5, seed=3)
    mp4t = m4.synth_mp4_table(5, seed=3)
    mp4t = mp4t.set_column(0, "media_id",
                           pa.array(np.arange(5, 10, dtype=np.int64)))
    both = pa.concat_tables([ojrv, mp4t])
    out = mm.decode_features(rd.from_arrow(both), fake=False).to_pandas()
    assert len(out) == 10
    assert out["feature"].map(len).eq(16).all()
