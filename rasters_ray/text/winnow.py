"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the public MOSS algorithm).

The local fingerprinting primitive plagiarism/near-dup pipelines use:
hash every k-gram with a rolling polynomial hash, slide a window of w
consecutive hashes, keep each window's MINIMUM (rightmost position on
ties — the paper's robust-winnowing rule), dedupe consecutive picks.
Guarantees: any shared substring of length >= w + k - 1 produces at
least one shared fingerprint, and the density is ~2/(w+1).

Distributed shape: strictly per-document (embarrassingly parallel
``map_batches``; nothing shuffles). The hash is a base-B polynomial in
WRAPPING uint64 arithmetic — exact and platform-independent — computed
with k vectorized passes (k is small), and the window minimum is one
``sliding_window_view`` argmin; no per-character Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_B = np.uint64(1000003)  # odd multiplier; wrapping mod 2^64


def kgram_hashes(text: str, k: int) -> np.ndarray:
    """uint64 polynomial hash of every k-gram of UTF-8 bytes.
    len = max(0, n - k + 1)."""
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(raw)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):  # k small: k vector ops, no per-char python
            h = h * _B + raw[j : n - k + 1 + j]
    return h


def winnow_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Robust winnowing: per window of ``w`` hashes keep the RIGHTMOST
    minimum's global position; consecutive duplicates collapse."""
    if len(h) == 0:
        return np.zeros(0, dtype=np.int64)
    if len(h) <= w:
        # single (short) window: rightmost min
        rev = h[::-1]
        return np.array([len(h) - 1 - int(np.argmin(rev))], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost min: argmin over the reversed window, flipped back
    rm = w - 1 - np.argmin(win[:, ::-1], axis=1)
    pos = rm + np.arange(len(rm))
    return np.unique(pos).astype(np.int64)


def winnow_fingerprints(
    docs_ds, k: int = 8, w: int = 16, id_col: str = "doc_id", text_col: str = "text"
):
    """-> Dataset[(doc_id, pos, fp)] — one row per selected fingerprint,
    ``fp`` the k-gram hash reinterpreted as int64, ``pos`` its k-gram
    start offset (UTF-8 bytes)."""

    def fp(t: pa.Table) -> pa.Table:
        ids_out, pos_out, fp_out = [], [], []
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        for did, txt in zip(ids, texts):
            h = kgram_hashes(txt or "", k)
            sel = winnow_positions(h, w)
            if not len(sel):
                continue
            ids_out.append(np.full(len(sel), did, dtype=np.int64))
            pos_out.append(sel)
            fp_out.append(h[sel].view(np.int64))
        if not ids_out:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids_out), pa.int64()),
                "pos": pa.array(np.concatenate(pos_out), pa.int64()),
                "fp": pa.array(np.concatenate(fp_out), pa.int64()),
            }
        )

    return docs_ds.map_batches(fp, batch_format="pyarrow")


def winnow_local(texts, ids, k: int = 8, w: int = 16):
    """Sequential reference: [(doc_id, pos, fp)] via the same kernels
    (per-document compute is layout-independent by construction; this
    exists for the golden oracle and tests)."""
    out = []
    for did, txt in zip(ids, texts):
        h = kgram_hashes(txt or "", k)
        sel = winnow_positions(h, w)
        for p, f in zip(sel, h[sel].view(np.int64)):
            out.append((int(did), int(p), int(f)))
    return out
