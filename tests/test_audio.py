"""Audio/video multimodal plumbing (brief: binary columns + actor
pools; codecs are the documented pcmz/ulawz stand-ins)."""

import numpy as np
import pyarrow as pa
import pytest

from geobuf_ray.io import audio as au


def test_pcmz_lossless_roundtrip():
    s = au.procedural_samples("clip000000000001", 8000, 16000)
    back, rate = au.decode_audio(au.encode_pcmz(s, 16000))
    assert rate == 16000
    assert np.allclose(back, s, atol=1 / 32767)


def test_ulawz_snr_bound():
    s = au.procedural_samples("clip000000000002", 16000, 16000)
    back, _ = au.decode_audio(au.encode_ulawz(s, 16000))
    err = np.mean((back - s) ** 2)
    snr = 10 * np.log10(np.mean(s ** 2) / err)
    assert snr >= 25.0, snr  # mu-law: ~30+ dB on speech-like signals


def test_unknown_codec_raises_stub():
    # a RIFF container that isn't WAVE is corrupt input for the real
    # pure-Python WAV codec (ValueError), not a missing decoder
    with pytest.raises(ValueError):
        au.decode_audio(b"RIFFxxxx" + b"\x00" * 16)
    # genuinely compressed formats stay gated on soundfile
    with pytest.raises(NotImplementedError):
        au.decode_audio(b"ID3\x04" + b"\x00" * 16)


def test_audio_features_pipeline(ray_session):
    ds = au.synthesize_audio_dataset(30)
    out = ds.map_batches(au.AudioFeaturesFn,
                         fn_constructor_kwargs=dict(check_fidelity=True),
                         batch_format="pyarrow",
                         batch_size=8, concurrency=(1, 2))
    rows = out.take_all()
    assert len(rows) == 30
    for r in rows:
        assert 0.4 < r["duration_s"] < 2.1
        assert 0.0 < r["rms"] < 1.0
        assert 50.0 < r["peak_hz"] < 4000.0
        assert r["snr_db"] > 25.0  # lossless rows are ~120 dB


def test_audio_resample_halves_samples(ray_session):
    ds = au.synthesize_audio_dataset(10)
    out = ds.map_batches(
        au.ResampleAudioFn, fn_constructor_kwargs=dict(target_rate=8000),
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2))
    orig = {r["clip_id"]: r["n_samples"] for r in ds.take_all()}
    for r in out.take_all():
        assert r["sample_rate"] == 8000
        assert abs(r["n_samples"] - orig[r["clip_id"]] / 2) <= 1
        back, rate = au.decode_audio(r["bytes"])
        assert rate == 8000 and len(back) == r["n_samples"]


def test_video_frame_sampling(ray_session):
    from geobuf_ray.io.images import decode_image

    ds = au.synthesize_video_index(12)
    idx = {r["clip_id"]: r["n_frames"] for r in ds.take_all()}
    frames = ds.map_batches(
        au.SampleVideoFramesFn, fn_constructor_kwargs=dict(every=4),
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2))
    rows = frames.take_all()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], []).append(r["frame"])
        px = decode_image(r["bytes"])
        assert px.shape == (32, 32, 3)
    for cid, fr in by_clip.items():
        exp = list(range(0, idx[cid], 4))
        assert sorted(fr) == exp  # ONLY sampled frames materialized


def test_silence_segments_constructed_waveform():
    from geobuf_ray.io.audio import SilenceSegmentsFn, encode_pcmz

    frame = 256
    loud = np.sin(np.linspace(0, 400 * np.pi, frame * 6)) * 0.8
    quiet = np.zeros(frame * 5, np.float64) + 0.001
    wav = np.concatenate([loud, quiet, loud, quiet[:frame * 2], loud]) \
        .astype(np.float32)
    tbl = pa.table({
        "clip_id": pa.array(["c0"], pa.string()),
        "bytes": pa.array([encode_pcmz(wav, 16000)], pa.binary()),
        "fmt": pa.array(["pcmz"], pa.string())})
    out = SilenceSegmentsFn(frame=frame, min_run=3)(tbl).to_pandas()
    # 18 + 7 quiet frames -> but min_run=3: both quiet runs (5, 2):
    # only the 5-run counts as a silence segment; 3 active segments
    assert out["n_frames"][0] == 6 + 5 + 6 + 2 + 6
    assert out["n_quiet_frames"][0] == 7
    assert out["n_silence_segs"][0] == 1
    assert out["n_active_segs"][0] == 3


def test_silence_segments_gain_invariance():
    from geobuf_ray.io.audio import SilenceSegmentsFn, encode_pcmz

    frame = 256
    rng = np.random.default_rng(5)
    base = np.repeat(rng.uniform(0.2, 0.9, 40), frame) \
        * np.sin(np.linspace(0, 900 * np.pi, frame * 40))
    gaps = base.copy()
    gaps[frame * 10: frame * 14] = 0.0
    for gain in (1.0, 0.25):
        tbl = pa.table({
            "clip_id": pa.array(["g"], pa.string()),
            "bytes": pa.array([encode_pcmz(
                (gaps * gain).astype(np.float32), 16000)], pa.binary()),
            "fmt": pa.array(["pcmz"], pa.string())})
        out = SilenceSegmentsFn(frame=frame, min_run=3)(tbl).to_pandas()
        assert out["n_silence_segs"][0] >= 1
        if gain == 1.0:
            ref = out["n_silence_segs"][0]
        else:  # relative threshold: same segmentation at 1/4 gain
            assert out["n_silence_segs"][0] == ref


def test_normalize_hits_target_and_clip_guard():
    from geobuf_ray.io.audio import NormalizeAudioFn, decode_audio, \
        encode_pcmz

    quiet = (0.01 * np.sin(np.linspace(0, 50 * np.pi, 4000))) \
        .astype(np.float32)
    # spiky clip: normalizing its tiny RMS to 0.125 would push the
    # peak far past full scale — the guard must cap the gain
    spiky = np.zeros(4000, np.float32)
    spiky[::400] = 0.9
    tbl = pa.table({
        "clip_id": pa.array(["q", "s"], pa.string()),
        "bytes": pa.array([encode_pcmz(quiet, 16000),
                           encode_pcmz(spiky, 16000)], pa.binary())})
    out = NormalizeAudioFn(target_rms=0.125)(tbl).to_pandas()
    s0, _ = decode_audio(out["bytes"][0])
    assert abs(out["rms_out"][0] - 0.125) < 0.125 * 0.01
    assert np.abs(s0).max() <= 1.0
    s1, _ = decode_audio(out["bytes"][1])
    assert np.abs(s1).max() <= 0.9995  # capped, not clipped
    assert out["rms_out"][1] < 0.125  # cap kept it below target
    assert out["gain"][1] < 0.125 / out["rms_in"][1]


def test_scene_cuts_recovers_planted_and_no_cut_clip(ray_session):
    from geobuf_ray.io import audio as au

    fn = au.SceneCutsFn()
    # vid...7: period = 7%7+4 = 4; 13 frames -> planted cuts at 4,8,12
    batch = pa.table({"clip_id": pa.array(["vid000000000007"]),
                      "n_frames": pa.array([13], pa.int32())})
    out = fn(batch)
    assert out["n_cuts"][0].as_py() == 3
    assert out["cut_checksum"][0].as_py() == 4 + 8 + 12
    assert out["matched"][0].as_py() == 1

    # a clip shorter than its period has NO scene change
    batch2 = pa.table({"clip_id": pa.array(["vid000000000003"]),
                       "n_frames": pa.array([6], pa.int32())})
    out2 = fn(batch2)  # period = 3%7+4 = 7 > 6 frames
    assert out2["n_cuts"][0].as_py() == 0
    assert out2["n_planted"][0].as_py() == 0
    assert out2["matched"][0].as_py() == 1


def test_scene_cuts_within_scene_jitter_below_threshold(ray_session):
    """The brightness jitter alone must never fire the detector: a
    single-scene clip (period > n_frames) detects zero cuts even
    though every consecutive frame pair differs."""
    from geobuf_ray.io import audio as au
    from geobuf_ray.io import images as im

    px0 = im.procedural_pixels("vid000000000003/s0000", 32, 32)
    j0 = np.minimum(px0.astype(np.int64) + 0, 255)
    j1 = np.minimum(px0.astype(np.int64) + 1, 255)
    assert np.abs(j1 - j0).sum() > 0  # frames genuinely differ
    out = au.SceneCutsFn()(pa.table({
        "clip_id": pa.array(["vid000000000003"]),
        "n_frames": pa.array([6], pa.int32())}))
    assert out["n_cuts"][0].as_py() == 0


def test_clip_audit_code_domain_replay():
    import pyarrow as pa

    from geobuf_ray.io.audio import (AudioClipAuditFn, encode_pcmz,
                                     encode_ulawz, longest_true_run)

    # run-length kernel
    assert longest_true_run(np.array([], bool)) == 0
    assert longest_true_run(np.array([0, 1, 1, 0, 1, 1, 1], bool)) == 3
    assert longest_true_run(np.ones(5, bool)) == 5

    # pcmz: a wave with a planted flat top of 6 samples at +1.0 and
    # one isolated -1.0 peak
    x = np.zeros(100, np.float64)
    x[10:16] = 1.0
    x[50] = -1.0
    x[70] = 0.5
    t = pa.table({"clip_id": pa.array(["a", "b"]),
                  "fmt": pa.array(["pcmz", "ulawz"]),
                  "bytes": pa.array([encode_pcmz(x, 16000),
                                     encode_ulawz(x, 16000)],
                                    pa.binary())})
    out = AudioClipAuditFn()(t).to_pandas()
    # pcmz row: 7 full-scale codes, longest run 6, peak 32767
    assert out["n_codes"][0] == 100
    assert out["n_clipped"][0] == 7
    assert out["clip_run"][0] == 6
    assert out["peak"][0] == 32767
    v = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int64)
    assert out["sumsq"][0] == int((v * v).sum())
    # ulawz row: codes 0/255 at the same positions
    assert out["n_clipped"][1] == 7
    assert out["clip_run"][1] == 6
    assert out["peak"][1] == 255  # |2*code - 255| at full scale


def test_motion_estimate_scalar_replay():
    """MotionEstimateFn recovers planted velocities on a tiny clip
    set; a manual crop replay confirms the frame model and that the
    true displacement's SAD is exactly zero while neighbors are
    positive."""
    import pyarrow as pa

    from geobuf_ray.io import audio as au
    from geobuf_ray.io import images as im

    # idx 0 -> v=(-1,-1); idx 4 -> static (0,0); idx 5 -> v=(1,0)
    tbl = pa.table({"clip_id": pa.array([f"vid{i:012d}"
                                         for i in (0, 4, 5)]),
                    "n_frames": pa.array([10, 12, 49], pa.int32())})
    out = au.MotionEstimateFn()(tbl).to_pylist()
    for r, (vx, vy) in zip(out, [(-1, -1), (0, 0), (1, 0)]):
        assert (r["est_vx"], r["est_vy"]) == (vx, vy)
        assert r["n_recovered"] == r["n_pairs"] == r["n_frames"] - 1
        assert r["sum_best_sad"] == 0

    # manual replay: frame crops of vid..5 really shift by (1,0)
    base = im.procedural_pixels("vid000000000005/pan", 132, 132) \
        .astype(np.int64)
    f0 = base[50:82, 50:82]
    f1 = base[50:82, 51:83]
    # cur(y,x) == prev(y+vy, x+vx) on the overlap for (vx,vy)=(1,0)
    assert np.array_equal(f1[:, 0:31], f0[:, 1:32])
    # and a wrong displacement does not match
    assert not np.array_equal(f1[0:31, 0:31], f0[1:32, 1:32])


def test_wav_pcm16_roundtrip_sample_exact():
    """encode_wav(pcm16) -> decode_wav reproduces the int16 samples
    exactly (one quantization, then lossless)."""
    from geobuf_ray.io import audio as au
    from geobuf_ray.io import wav as W

    s = au.procedural_samples("clipwav", 12345, 16000)
    b = W.encode_wav(s, 16000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    d, r = W.decode_wav(b)
    assert r == 16000 and len(d) == len(s)
    p0 = np.clip(np.round(s.astype(np.float64) * 32767.0),
                 -32768, 32767).astype(np.int16)
    p1 = np.round(d.astype(np.float64) * 32767.0).astype(np.int16)
    assert (p0 == p1).all()
    # dispatch through decode_audio
    d2, r2 = au.decode_audio(b)
    assert r2 == 16000 and (d2 == d).all()


def test_wav_g711_mulaw_spec_properties():
    """The G.711 mu-law codec obeys the spec's analytic laws: exact
    idempotence (decode->encode fixpoint), monotonicity, and the
    segmented quantization error bound |x - dec(enc(x))| <
    2^(seg+4) for every int16 input."""
    from geobuf_ray.io import wav as W

    x = np.arange(-32768, 32768, dtype=np.int16)
    u = W.mulaw_encode(x)
    y = W.mulaw_decode(u)
    # fixpoint: re-encoding the decoded value reproduces the code
    # (except at decoded 0, where G.711's +0/-0 codes collapse)
    nz = y != 0
    assert (W.mulaw_encode(y[nz]) == u[nz]).all()
    assert (np.abs(x[~nz].astype(np.int32)) <= 3).all()
    # decoded values are monotone non-decreasing in x
    assert (np.diff(y.astype(np.int32)) >= 0).all()
    # error bound per segment: step is 2^(seg+3), so error < 2^(seg+4)
    mag = np.abs(np.clip(x.astype(np.int32), -32635, 32635)) + 0x84
    seg = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    err = np.abs(np.clip(x.astype(np.int32), -32635, 32635)
                 - y.astype(np.int32))
    assert (err < (1 << (seg + 4))).all()


def test_wav_mulaw_container_roundtrip_snr():
    from geobuf_ray.io import audio as au
    from geobuf_ray.io import wav as W

    s = au.procedural_samples("clipu", 16000, 16000)
    b = W.encode_wav(s, 16000, fmt="mulaw")
    d, r = W.decode_wav(b)
    snr = 10 * np.log10(float(np.mean(s.astype(np.float64) ** 2))
                        / float(np.mean((s - d).astype(np.float64) ** 2)))
    assert snr >= 30.0, snr


def test_wav_hand_built_variants_decode():
    """Hand-assembled fixtures the encoder never writes: 8-bit PCM,
    24-bit PCM, 32-bit float, stereo (channel 0 returned), an
    extensible-format header, and an extra chunk before fmt."""
    import struct

    from geobuf_ray.io import wav as W

    def rif(chunks):
        body = b"WAVE" + chunks
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def ck(tag, payload):
        out = tag + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")

    # 8-bit unsigned PCM ramp
    pcm8 = np.array([0, 64, 128, 192, 255], np.uint8)
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    d, r = W.decode_wav(rif(ck(b"fmt ", fmt8) + ck(b"data", pcm8.tobytes())))
    assert r == 8000
    assert np.allclose(d, (pcm8.astype(np.float32) - 128) / 127.0)

    # 24-bit PCM: values +/- full scale
    v24 = np.array([8388607, -8388608, 0, 1], np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in v24)
    fmt24 = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    d, r = W.decode_wav(rif(ck(b"fmt ", fmt24) + ck(b"data", raw)))
    assert np.allclose(d[:2], [1.0, -8388608 / 8388607], atol=1e-6)

    # 32-bit float with a LIST chunk in front of fmt
    f32 = np.array([0.5, -0.25, 1.0], "<f4")
    fmtf = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    d, r = W.decode_wav(rif(ck(b"LIST", b"INFOjunk")
                            + ck(b"fmt ", fmtf)
                            + ck(b"data", f32.tobytes())))
    assert r == 48000 and np.array_equal(d, f32)

    # stereo 16-bit: channel 0 comes back
    st = np.array([100, -100, 200, -200, 300, -300], "<i2")
    fmts = struct.pack("<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    d, r = W.decode_wav(rif(ck(b"fmt ", fmts) + ck(b"data", st.tobytes())))
    assert np.allclose(d * 32767.0, [100, 200, 300], atol=0.01)

    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16
    sub = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    fmte = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16) \
        + struct.pack("<H", 22) + struct.pack("<H", 16) \
        + struct.pack("<I", 1) + sub
    pcm = np.array([1000, -1000], "<i2")
    d, r = W.decode_wav(rif(ck(b"fmt ", fmte) + ck(b"data", pcm.tobytes())))
    assert np.allclose(d * 32767.0, [1000, -1000], atol=0.01)


def test_wav_unsupported_and_corrupt():
    import struct

    import pytest

    from geobuf_ray.io import wav as W

    with pytest.raises(ValueError):
        W.decode_wav(b"nope")
    # ADPCM (format 2) is declared unsupported
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    with pytest.raises(NotImplementedError):
        W.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
