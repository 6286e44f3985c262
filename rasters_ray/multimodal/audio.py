"""Real audio support, dependency-free: RIFF/WAV PCM codec + log-mel
spectrogram features (public DSP formulas: Hann window, HTK mel scale).

This replaces the round-2 stub body of the audio featurizer for every
input the engine can actually parse (WAV PCM 8/16/32-bit and float32);
foreign compressed formats (mp3/ogg) still route to the documented
byte-energy fallback because no codec library ships in this container.

``synth_wav`` generates deterministic PCM16 fixtures so the plumbing is
testable end to end (frame math carries a DuckDB value oracle).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


# ---------------------------------------------------------------------------
# WAV codec (RIFF, public format)
# ---------------------------------------------------------------------------


def synth_wav(seed: int, sr: int = 16000, n_samples: int = 16000,
              freq: float = 440.0) -> bytes:
    """Deterministic PCM16 mono WAV: sine at ``freq`` + seeded noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64) / sr
    sig = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n_samples)
    pcm = np.clip(np.rint(sig * 32767.0), -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def decode_wav(data) -> Tuple[int, np.ndarray]:
    """(sample_rate, mono float32 in [-1, 1]) from a RIFF/WAV blob.
    PCM 8/16/32-bit and IEEE float32; channels average to mono. Accepts
    anything with the buffer protocol."""
    mv = memoryview(data)
    if bytes(mv[:4]) != b"RIFF" or bytes(mv[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    sr = None
    n_ch = 1
    bits = 16
    audio_fmt = 1
    signal = None
    while pos + 8 <= len(mv):
        tag = bytes(mv[pos : pos + 4])
        (size,) = struct.unpack("<I", mv[pos + 4 : pos + 8])
        body = mv[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, n_ch, sr = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif tag == b"data":
            if audio_fmt == 3 and bits == 32:  # IEEE float
                sig = np.frombuffer(body, dtype="<f4").astype(np.float32)
            elif bits == 16:
                sig = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
            elif bits == 32:
                sig = np.frombuffer(body, dtype="<i4").astype(np.float32) / 2147483648.0
            elif bits == 8:  # unsigned
                sig = (np.frombuffer(body, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
            else:
                raise ValueError(f"unsupported WAV bit depth: {bits}")
            if n_ch > 1:
                sig = sig[: len(sig) - len(sig) % n_ch].reshape(-1, n_ch).mean(axis=1)
            signal = sig.astype(np.float32)
        pos += 8 + size + (size % 2)
    if sr is None or signal is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(sr), signal


# ---------------------------------------------------------------------------
# log-mel features (Hann + rfft + HTK mel filterbank — public formulas)
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters on the HTK mel scale."""
    n_bins = n_fft // 2 + 1
    fft_hz = np.arange(n_bins) * (sr / n_fft)
    pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (fft_hz - lo) / max(mid - lo, 1e-9)
        down = (hi - fft_hz) / max(hi - mid, 1e-9)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def n_frames_for(n_samples: int, n_fft: int = 512, hop: int = 256) -> int:
    """Frame count of the framing rule below — SQL-recomputable:
    1 + floor((n_samples - n_fft) / hop) when n_samples >= n_fft, else 0."""
    return 1 + (n_samples - n_fft) // hop if n_samples >= n_fft else 0


def logmel(signal: np.ndarray, sr: int, n_fft: int = 512, hop: int = 256,
           n_mels: int = 16) -> np.ndarray:
    """(n_frames, n_mels) log-power mel spectrogram, fully vectorized
    (stride-tricks framing, one rfft over all frames)."""
    n = len(signal)
    t = n_frames_for(n, n_fft, hop)
    if t == 0:
        return np.zeros((0, n_mels), dtype=np.float32)
    frames = np.lib.stride_tricks.as_strided(
        signal, shape=(t, n_fft),
        strides=(signal.strides[0] * hop, signal.strides[0]),
    )
    win = np.hanning(n_fft).astype(np.float64)
    spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
    mel = spec @ mel_filterbank(sr, n_fft, n_mels).T
    return np.log10(mel + 1e-10).astype(np.float32)
