"""Real multimodal bodies: WAV codec, log-mel features, NPV framing."""

import numpy as np
import pyarrow as pa
import pytest

from rasters_ray.multimodal import (
    AudioFeatureStage,
    FrameSampleStage,
    decode_wav,
    encode_npv,
    logmel,
    mel_filterbank,
    n_frames_for,
    synth_wav,
)


def test_wav_roundtrip_pcm16():
    blob = synth_wav(seed=1, sr=8000, n_samples=4000, freq=440.0)
    sr, sig = decode_wav(blob)
    assert sr == 8000 and len(sig) == 4000
    assert sig.dtype == np.float32
    assert 0.3 < np.abs(sig).max() <= 1.0


def test_wav_stereo_averages_and_float32():
    import struct

    sr = 8000
    left = np.linspace(-0.5, 0.5, 100, dtype=np.float32)
    right = -left
    inter = np.empty(200, dtype=np.float32)
    inter[0::2] = left
    inter[1::2] = right
    pcm = inter.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, sr, sr * 8, 8, 32)
    blob = hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    got_sr, sig = decode_wav(blob)
    assert got_sr == sr
    np.testing.assert_allclose(sig, np.zeros(100), atol=1e-6)  # L+R cancel


def test_logmel_peak_tracks_tone_frequency():
    sr, n = 16000, 16000
    lo = logmel(decode_wav(synth_wav(1, sr, n, freq=300.0))[1], sr, n_mels=24)
    hi = logmel(decode_wav(synth_wav(1, sr, n, freq=4000.0))[1], sr, n_mels=24)
    assert lo.shape == (n_frames_for(n), 24)
    assert np.argmax(lo.mean(axis=0)) < np.argmax(hi.mean(axis=0))


def test_mel_filterbank_covers_spectrum():
    fb = mel_filterbank(16000, 512, 16)
    assert fb.shape == (16, 257)
    # every interior fft bin is covered by some filter
    assert (fb[:, 1:-1].sum(axis=0) > 0).all()


def test_audio_stage_real_and_fallback(ray_session):
    wav = synth_wav(seed=2, sr=8000, n_samples=8000)
    foreign = b"\x00\x01" * 500
    batch = pa.table({
        "audio_id": pa.array(["a", "b"]),
        "bytes": pa.array([wav, foreign], pa.binary()),
    })
    out = AudioFeatureStage(n_features=8)(batch)
    assert out.column("sr").to_pylist() == [8000, -1]
    assert out.column("n_frames").to_pylist() == [n_frames_for(8000), -1]
    assert out.column("duration_ms").to_pylist() == [1000, -1]
    feats = out.column("features").to_pylist()
    assert len(feats[0]) == 8 and len(feats[1]) == 8


def test_npv_frame_sampling_exact_offsets():
    frames = [bytes([i]) * 32 for i in range(25)]
    blob = encode_npv(frames)
    batch = pa.table({
        "image_id": pa.array(["v0"]),
        "bytes": pa.array([blob], pa.binary()),
    })
    out = FrameSampleStage(every_k=10)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 10, 20]
    assert out.column("frame").to_pylist() == [frames[0], frames[10], frames[20]]


def test_npv_rejects_ragged():
    with pytest.raises(ValueError, match="equal-sized"):
        encode_npv([b"ab", b"c"])
