"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray Data shapes (the guide's canonical patterns):
- exact: add content_key (md5) per batch -> groupby(content_key) ->
  keeper = min(doc_id), n_dupes = count;
- MinHash-LSH: shingle -> minhash signature per batch (vectorized numpy)
  -> explode to (band_id, band_hash, doc_id) rows -> groupby both ->
  candidate pairs within buckets -> verify exact Jaccard -> pairs;
- SimHash: 64-bit signature per doc; near-dups = equal signatures on
  rotated bands (Charikar 2002 / Manku et al. 2007, public algorithms);
- n-gram Jaccard: the verification kernel, exposed standalone.

All hashes are crc/blake-based — deterministic across worker processes.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa

from ..util import pool_size

_WORD_RE = re.compile(r"\S+")

_MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return struct.unpack("<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest())[0]


def char_shingles(text: str, k: int = 5) -> Set[int]:
    t = " ".join(_WORD_RE.findall(text.lower()))
    if len(t) < k:
        return {_stable_u64(t)} if t else set()
    return {_stable_u64(t[i : i + k]) for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> Set[int]:
    ws = [w.lower() for w in _WORD_RE.findall(text)]
    if len(ws) < n:
        return {_stable_u64(" ".join(ws))} if ws else set()
    return {_stable_u64(" ".join(ws[i : i + n])) for i in range(len(ws) - n + 1)}


def jaccard(a: Set[int], b: Set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """Vectorized (a*x+b) mod p minhash, seeded deterministically."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: Set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        # (a*x + b) mod p, computed in python-int free uint64 with overflow-safe
        # object fallback avoided: use uint128 via two-step (numpy lacks it) ->
        # do the multiply mod in float-free int64 chunks: values < 2^61 so use
        # Python ints per shingle? Too slow. Standard trick: take everything
        # mod 2^64 (the permutation family stays uniform enough for LSH).
        sig = np.empty(self.num_perm, dtype=np.uint64)
        for i in range(self.num_perm):
            h = self.a[i] * x + self.b[i]  # mod 2^64 wraparound
            sig[i] = h.min()
        return sig


def band_rows(doc_id, sig: np.ndarray, bands: int = 16) -> List[Tuple[int, int]]:
    """(band_id, band_hash) rows for LSH bucketing."""
    r = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * r : (b + 1) * r].tobytes()
        h = struct.unpack("<Q", hashlib.blake2b(chunk, digest_size=8).digest())[0]
        out.append((b, h & 0x7FFFFFFFFFFFFFFF))
    return out


def minhash_band_table(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
) -> pa.Table:
    """Per-batch: doc -> (bands) LSH bucket rows."""
    hasher = MinHasher(num_perm)
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_id, out_band, out_hash = [], [], []
    for did, t in zip(ids, texts):
        sig = hasher.signature(char_shingles(t or "", shingle_k))
        for b, h in band_rows(did, sig, bands):
            out_id.append(did)
            out_band.append(b)
            out_hash.append(h)
    return pa.table(
        {
            "doc_id": pa.array(out_id),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        }
    )


class MinHashStage:
    """Actor-pool form: hasher built once per actor."""

    def __init__(self, num_perm: int = 128, bands: int = 16, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.kw = dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                       id_col=id_col, text_col=text_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return minhash_band_table(batch, **self.kw)


def candidate_pairs_from_buckets(group: pa.Table) -> pa.Table:
    """Within one (band_id, band_hash) bucket: all doc pairs (a < b)."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table({"a": pa.array(a_out), "b": pa.array(b_out)})


def minhash_near_dups(
    docs_ds,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
):
    """Full MinHash-LSH pipeline -> Dataset[(a, b, jaccard)] verified pairs.

    Verification re-reads the two texts via a broadcast id->text lookup
    (valid while the doc table's text fits the object store per verify
    actor; at 100 TB swap in a shared KV/object-store chunk lookup)."""
    import ray

    bands_ds = docs_ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency or pool_size(0.25),
    )
    pairs = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(candidate_pairs_from_buckets, batch_format="pyarrow")
    )
    # dedup candidate pairs (same pair can collide in several bands) —
    # aggregate is far cheaper than per-group map_groups here
    from ray.data.aggregate import Count

    uniq_pairs = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))

    texts = {}
    for b in docs_ds.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        texts.update(zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()))
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self, ref, k, thr):
            self.texts = ray.get(ref)
            self.k = k
            self.thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            keep_a, keep_b, jc = [], [], []
            for x, y in zip(a, b):
                j = jaccard(
                    char_shingles(self.texts.get(x, "") or "", self.k),
                    char_shingles(self.texts.get(y, "") or "", self.k),
                )
                if j >= self.thr:
                    keep_a.append(x)
                    keep_b.append(y)
                    jc.append(j)
            return pa.table(
                {"a": pa.array(keep_a), "b": pa.array(keep_b), "jaccard": pa.array(jc, pa.float64())}
            )

    return uniq_pairs.map_batches(
        Verify,
        fn_constructor_kwargs={"ref": texts_ref, "k": shingle_k, "thr": threshold},
        batch_format="pyarrow",
        concurrency=concurrency or pool_size(0.25),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """Charikar simhash over word unigrams (uniform weights)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in _WORD_RE.findall((text or "").lower()):
        h = _stable_u64(w)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(sh, pa.int64()))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
