"""Multimodal actor-pool stages: decode / resize / feature-extract /
frame-sample over opaque binary columns.

The Ray-side plumbing (schemas, actor signatures, batch sizing, output
layout) is REAL and tested; the codec bodies are pluggable because this
container ships no image/audio libraries (PIL/ffmpeg absent — SURVEY.md
§7.0). Each stage takes a ``decoder`` callable; the default handles the
engine's own formats (npy/png/qnt via rasters_ray.codec) and a
``deterministic_fake`` decoder exists for foreign formats (jpeg/mp3/mp4),
clearly marked. Passing ``strict=True`` raises NotImplementedError for
foreign formats instead.

Batch-size guidance: binary payloads are MB-scale — size batches so
batch_size x payload x concurrency fits the worker heap (the guide's
memory rule); these stages default to small batches (8).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from .. import codec

_NATIVE_FMTS = {"npy", "png", "qnt"}


def deterministic_fake_decode(data: bytes, fmt: str) -> np.ndarray:
    """STUB for foreign codecs (no PIL/ffmpeg in this container): expands
    the byte stream into a deterministic pseudo-pixel array — shape and
    values depend only on the bytes, so pipelines stay testable."""
    h = max(1, min(64, len(data) // 64 + 1))
    w = 64
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def default_decode(data: bytes, fmt: str, strict: bool = False) -> np.ndarray:
    if fmt in _NATIVE_FMTS:
        return codec.decode(data, fmt)
    if strict:
        raise NotImplementedError(
            f"no codec for fmt={fmt!r} in this environment (PIL/ffmpeg absent); "
            "plug a decoder or use deterministic_fake_decode"
        )
    return deterministic_fake_decode(data, fmt)


class ImageDecodeStage:
    """binary -> decoded stats columns (keeps bytes out of the output)."""

    def __init__(self, decoder: Optional[Callable] = None, strict: bool = False):
        self.decoder = decoder or (lambda b, f: default_decode(b, f, strict))

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        h, w, mean = [], [], []
        for b, f in zip(blobs, fmts):
            arr = self.decoder(b, f)
            h.append(arr.shape[0])
            w.append(arr.shape[1])
            mean.append(float(np.asarray(arr, dtype=np.float64).mean()))
        out = batch.drop_columns(["bytes"])
        out = out.append_column("dec_h", pa.array(h, pa.int32()))
        out = out.append_column("dec_w", pa.array(w, pa.int32()))
        out = out.append_column("dec_mean", pa.array(mean, pa.float64()))
        return out


class ImageResizeStage:
    """binary -> resized binary (nearest-neighbor, pure numpy)."""

    def __init__(self, out_h: int, out_w: int, decoder: Optional[Callable] = None,
                 strict: bool = False):
        self.out_h = out_h
        self.out_w = out_w
        self.decoder = decoder or (lambda b, f: default_decode(b, f, strict))

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_blobs = []
        for b, f in zip(blobs, fmts):
            arr = self.decoder(b, f)
            ri = np.minimum((np.arange(self.out_h) * arr.shape[0]) // self.out_h, arr.shape[0] - 1)
            ci = np.minimum((np.arange(self.out_w) * arr.shape[1]) // self.out_w, arr.shape[1] - 1)
            small = arr[np.ix_(ri, ci)]
            enc_fmt = f if f in _NATIVE_FMTS else "npy"
            out_blobs.append(codec.encode(small, enc_fmt))
        i = batch.column_names.index("bytes")
        return batch.set_column(i, "bytes", pa.array(out_blobs, pa.binary()))


class AudioFeatureStage:
    """binary audio -> fixed-length feature vector (STUB body: windowed
    byte-energy; real pipelines plug an actual featurizer)."""

    def __init__(self, n_features: int = 16):
        self.n = n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        feats = []
        for b in blobs:
            raw = np.frombuffer(b or b"\0", dtype=np.uint8).astype(np.float32)
            chunks = np.array_split(raw, self.n)
            feats.append([float(c.mean()) if c.size else 0.0 for c in chunks])
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


class FrameSampleStage:
    """binary video -> every k-th 'frame' (STUB framing: fixed-size byte
    windows); output explodes rows (one per sampled frame)."""

    def __init__(self, frame_bytes: int = 4096, every_k: int = 10, id_col: str = "image_id"):
        self.frame_bytes = frame_bytes
        self.every_k = every_k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for vid, b in zip(ids, blobs):
            b = b or b""
            n_frames = max(1, len(b) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_k):
                out_id.append(vid)
                out_idx.append(fi)
                out_frame.append(b[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )
