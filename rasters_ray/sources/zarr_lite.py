"""Minimal pure-Python Zarr v2 + v3 store reader/writer — no zarr lib.

Parity/usefulness target: modern geo archives increasingly publish
chunked arrays as Zarr stores; the PUBLIC Zarr specs are small, so this
module implements the subset the engine needs:

- ``read_zarr``: directory store, v2 (``.zarray``/``.zgroup`` JSON,
  chunk files ``i.j``) and v3 (``zarr.json``, regular chunk grid,
  default ``c/i/j`` or v2-style chunk key encodings); groups with array
  members; 1D/2D arrays; any numpy dtype; compressors/codecs
  ``null``/``zlib``/``gzip`` and BLOSC (the zarr-python default —
  lz4/lz4hc/zlib chunks with byte OR bit shuffle, via
  codec/blosc_lite); v3 bytes->bytes codecs STACK in declared order,
  including the ``crc32c`` data codec (verified+stripped) and the
  array->array ``transpose`` codec (permutation inverted at the typed
  chunk); ``fill_value`` for missing chunk files; numcodecs array-side
  filters Delta (what xarray puts on coordinate arrays) and Shuffle;
  the xarray ``_ARRAY_DIMENSIONS`` (v2) / ``dimension_names`` (v3)
  conventions; v3 ``sharding_indexed`` shards (inner chunk index with
  verified CRC-32C, absent inner chunks -> fill_value) read natively.
  Blosclz/snappy/zstd, other filters and nested sharding raise
  NotImplementedError with the remediation.
- ``write_zarr``: same subset (``zarr_format=2`` default or 3;
  compressor zlib, blosc or none; ``shards=`` emits v3
  sharding_indexed shard files) — round-trip tests prove the reader
  and the output is readable by real zarr/xarray elsewhere.
- ``zarr_raster``: CF-style (array, GridSpec) extraction — 2D variable
  + 1D coordinate arrays — mirroring ``netcdf_raster`` (same
  regular-spacing validation, same north-up flip for ascending
  latitude axes).
- ``write_zarr_tiles``: coordination-free distributed tile sink (one
  chunk file per worker-written tile).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..grids import GridSpec

_V3_DTYPES = {
    "bool": "|b1", "int8": "|i1", "int16": "i2", "int32": "i4",
    "int64": "i8", "uint8": "|u1", "uint16": "u2", "uint32": "u4",
    "uint64": "u8", "float16": "f2", "float32": "f4", "float64": "f8",
}
_V3_DTYPES_INV = {v.lstrip("|"): k for k, v in _V3_DTYPES.items()}


class _ArrayInfo:
    """Uniform view over a v2 or v3 array directory: metadata plus the
    chunk-path and chunk-decompress rules."""

    __slots__ = ("adir", "version", "shape", "chunks", "dtype", "fill",
                 "dims", "attrs", "_codec", "_sep", "_key_v2", "_filters",
                 "_shard", "_transpose")

    def __init__(self, adir: str):
        self.adir = adir
        v2 = os.path.join(adir, ".zarray")
        v3 = os.path.join(adir, "zarr.json")
        if os.path.exists(v2):
            self._init_v2(json.load(open(v2)))
        elif os.path.exists(v3):
            meta = json.load(open(v3))
            if meta.get("node_type") != "array":
                raise ValueError(f"{adir}: zarr.json is not an array node")
            self._init_v3(meta)
        else:
            raise ValueError(f"not a zarr array dir (no .zarray/zarr.json): {adir}")

    # ---- v2
    def _init_v2(self, meta: dict) -> None:
        if meta.get("zarr_format") != 2:
            raise NotImplementedError(
                f"zarr_format {meta.get('zarr_format')} in .zarray")
        if meta.get("order", "C") != "C":
            raise NotImplementedError("only C-order zarr chunks supported")
        self.version = 2
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        self._shard = None
        self._transpose = None
        self._filters = [_filter_codec(f) for f in (meta.get("filters") or [])]
        fill = meta.get("fill_value")
        self.fill = 0 if fill is None else fill
        comp = meta.get("compressor")
        self._codec = _compressor_codec(comp)
        self._sep = meta.get("dimension_separator", ".")
        self._key_v2 = True
        attrs = {}
        zattrs = os.path.join(self.adir, ".zattrs")
        if os.path.exists(zattrs):
            attrs = json.load(open(zattrs))
        self.attrs = attrs
        self.dims = attrs.get("_ARRAY_DIMENSIONS", [])

    # ---- v3
    def _init_v3(self, meta: dict) -> None:
        self.version = 3
        self._filters = []  # v3 expresses everything as codecs
        self.shape = tuple(meta["shape"])
        grid = meta.get("chunk_grid", {})
        if grid.get("name") != "regular":
            raise NotImplementedError(
                f"zarr v3 chunk grid {grid.get('name')!r} (regular only)")
        self.chunks = tuple(grid["configuration"]["chunk_shape"])
        dt = meta["data_type"]
        if dt not in _V3_DTYPES:
            raise NotImplementedError(f"zarr v3 data_type {dt!r}")
        base = _V3_DTYPES[dt]
        endian, codec, shard, transpose = _parse_v3_codecs(
            meta.get("codecs", []))
        if shard is not None:
            endian = shard["endian"]  # the 'bytes' codec nests inside
        self.dtype = np.dtype(base if base.startswith("|") else endian + base)
        self._codec = codec
        self._shard = shard
        self._transpose = transpose
        if shard is not None:
            # the chunk_grid describes SHARD files; inner chunks live
            # inside each shard behind the binary index
            if any(sc % ic for sc, ic in zip(self.chunks,
                                             shard["chunk_shape"])):
                raise NotImplementedError(
                    "zarr v3 shard shape must be a multiple of the inner "
                    "chunk shape")
        fill = meta.get("fill_value", 0)
        if fill in ("NaN", "nan"):
            fill = float("nan")
        elif fill in ("Infinity", "+Infinity"):
            fill = float("inf")
        elif fill == "-Infinity":
            fill = float("-inf")
        self.fill = 0 if fill is None else fill
        cke = meta.get("chunk_key_encoding",
                       {"name": "default", "configuration": {"separator": "/"}})
        conf = cke.get("configuration") or {}
        self._sep = conf.get("separator", "/" if cke.get("name") == "default"
                             else ".")
        self._key_v2 = cke.get("name") == "v2"
        self.attrs = dict(meta.get("attributes") or {})
        self.dims = list(meta.get("dimension_names") or
                         self.attrs.get("_ARRAY_DIMENSIONS", []))

    # ---- shared
    def grid_counts(self) -> List[int]:
        return [-(-s // c) for s, c in zip(self.shape, self.chunks)]

    def chunk_relpath(self, idx: Tuple[int, ...]) -> str:
        key = self._sep.join(str(i) for i in idx)
        if self.version == 3 and not self._key_v2:
            return "c" + self._sep + key if idx else "c"
        return key

    def read_chunk_file(self, idx: Tuple[int, ...]) -> Optional[np.ndarray]:
        p = os.path.join(self.adir, self.chunk_relpath(idx))
        if not os.path.exists(p):
            return None
        data = open(p, "rb").read()
        if self._shard is not None:
            return self._read_shard(data)
        raw = self._codec[0](data)
        for _dec, _enc in reversed(self._filters):
            raw = _dec(raw)
        return _typed_chunk(raw, self.dtype, self.chunks, self._transpose)

    def _read_shard(self, data: bytes) -> np.ndarray:
        """sharding_indexed shard file: inner chunks + a binary index of
        (offset, nbytes) uint64 pairs per inner chunk (2^64-1 = absent),
        crc32c-checked, at the end (default) or start of the file."""
        sh = self._shard
        ishape = sh["chunk_shape"]
        counts = [sc // ic for sc, ic in zip(self.chunks, ishape)]
        n_inner = int(np.prod(counts))
        idx_len = n_inner * 16 + (4 if sh["index_crc"] else 0)
        if len(data) < idx_len:
            raise ValueError("zarr v3 shard shorter than its index")
        raw_idx = (data[-idx_len:] if sh["index_location"] == "end"
                   else data[:idx_len])
        if sh["index_crc"]:
            body, crc = raw_idx[:-4], raw_idx[-4:]
            if _crc32c(body) != int.from_bytes(crc, "little"):
                raise ValueError("zarr v3 shard index crc32c mismatch")
            raw_idx = body
        pairs = np.frombuffer(raw_idx, dtype="<u8").reshape(n_inner, 2)
        out = np.full(self.chunks, self.fill, dtype=self.dtype)
        absent = (1 << 64) - 1
        import itertools

        for flat, pos in enumerate(itertools.product(*[range(c)
                                                       for c in counts])):
            off, nb = int(pairs[flat, 0]), int(pairs[flat, 1])
            if off == absent:
                continue
            raw = sh["codec"][0](data[off : off + nb])
            blk = _typed_chunk(raw, self.dtype, ishape, sh.get("transpose"))
            sl = tuple(slice(p * c, (p + 1) * c)
                       for p, c in zip(pos, ishape))
            out[sl] = blk
        return out

    def encode_chunk(self, block: np.ndarray) -> bytes:
        if self._shard is not None:
            return self._encode_shard(block)
        if self._transpose is not None:
            block = block.transpose(self._transpose)
        raw = np.ascontiguousarray(block).tobytes()
        for _dec, _enc in self._filters:
            raw = _enc(raw)
        return self._codec[1](raw)

    def _encode_shard(self, block: np.ndarray) -> bytes:
        """Inverse of _read_shard: inner chunks back-to-back, then the
        (offset, nbytes) index (+ CRC-32C) at index_location."""
        import itertools

        sh = self._shard
        ishape = sh["chunk_shape"]
        counts = [sc // ic for sc, ic in zip(self.chunks, ishape)]
        payload = bytearray()
        pairs = []
        head = 0 if sh["index_location"] == "end" else (
            int(np.prod(counts)) * 16 + (4 if sh["index_crc"] else 0))
        for pos in itertools.product(*[range(c) for c in counts]):
            sl = tuple(slice(p * c, (p + 1) * c)
                       for p, c in zip(pos, ishape))
            inner = block[sl]
            if sh.get("transpose") is not None:
                inner = inner.transpose(sh["transpose"])
            enc = sh["codec"][1](np.ascontiguousarray(inner).tobytes())
            pairs.append((head + len(payload), len(enc)))
            payload += enc
        idx = np.array(pairs, dtype="<u8").tobytes()
        if sh["index_crc"]:
            idx += _crc32c(idx).to_bytes(4, "little")
        return (bytes(payload) + idx if sh["index_location"] == "end"
                else idx + bytes(payload))

    def present_chunks(self) -> List[Tuple[int, ...]]:
        ndim = len(self.shape)
        if self._sep == "/":
            # nested chunk files: v3 default layout under c/, or a v2
            # store with dimension_separator "/" directly in the array dir
            root = (os.path.join(self.adir, "c")
                    if self.version == 3 and not self._key_v2 else self.adir)
            out = []
            for dirpath, _dirs, files in os.walk(root):
                rel = os.path.relpath(dirpath, root)
                head = [] if rel == "." else rel.split(os.sep)
                for f in files:
                    parts = head + [f]
                    if len(parts) == ndim and all(p.isdigit() for p in parts):
                        out.append(tuple(int(v) for v in parts))
            return sorted(out)
        if self.version == 3 and not self._key_v2:
            prefix = "c" + self._sep
            names = [n[len(prefix):] for n in os.listdir(self.adir)
                     if n.startswith(prefix)]
        else:
            names = os.listdir(self.adir)
        out = []
        for name in names:
            parts = name.split(self._sep)
            if len(parts) == ndim and all(p.isdigit() for p in parts):
                out.append(tuple(int(v) for v in parts))
        return sorted(out)


_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, reflected poly 0x82F63B78) — the checksum
    the zarr v3 sharding index carries. Table-driven; the index is tiny
    so pure Python is fine."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _typed_chunk(raw: bytes, dtype, cshape, order):
    """Decoded chunk bytes -> typed array of ``cshape``. With a v3
    transpose codec the stored layout is the chunk permuted by
    ``order``; view it in that shape and invert the permutation."""
    if order is None:
        return np.frombuffer(raw, dtype=dtype).reshape(cshape)
    if len(order) != len(cshape):
        raise ValueError(
            f"zarr v3 transpose order {order} does not match chunk rank "
            f"{len(cshape)}")
    pshape = tuple(cshape[o] for o in order)
    inv = tuple(int(i) for i in np.argsort(order))
    return np.frombuffer(raw, dtype=dtype).reshape(pshape).transpose(inv)


def _crc32c_codec():
    """zarr v3 'crc32c' bytes->bytes codec: a 4-byte little-endian
    CRC-32C APPENDED to the payload on encode, verified and stripped on
    decode (zarr v3 crc32c codec spec)."""

    def dec(b):
        if len(b) < 4:
            raise ValueError("crc32c codec payload shorter than its checksum")
        body, crc = b[:-4], int.from_bytes(b[-4:], "little")
        if _crc32c(body) != crc:
            raise ValueError("zarr v3 chunk crc32c mismatch")
        return body

    def enc(b):
        return bytes(b) + _crc32c(bytes(b)).to_bytes(4, "little")

    return dec, enc


def _parse_v3_codecs(codecs):
    """v3 codec chain -> (endian, (decode, encode), shard_cfg|None,
    transpose_order|None). The array->array 'transpose' codec records
    its axis permutation (applied at the typed-chunk layer by the
    callers); the array->bytes 'bytes' codec fixes endianness;
    gzip/zlib/blosc/crc32c are the supported bytes->bytes codecs and
    STACK in declared order (encode forward, decode reverse);
    'sharding_indexed' nests an inner chain."""
    endian = "<"
    bstack = []  # (decode, encode) pairs in declared (encode) order
    shard = None
    transpose = None
    for c in codecs:
        name = c.get("name")
        conf = c.get("configuration", {}) or {}
        if name == "bytes":
            endian = "<" if conf.get("endian", "little") == "little" else ">"
        elif name in ("gzip", "zlib", "blosc"):
            bstack.append(_compressor_codec({"id": name, **conf}))
        elif name == "crc32c":
            bstack.append(_crc32c_codec())
        elif name == "transpose":
            order = tuple(int(v) for v in conf.get("order", ()))
            if sorted(order) != list(range(len(order))):
                raise ValueError(
                    f"zarr v3 transpose order {order} is not a permutation")
            transpose = order
        elif name == "sharding_indexed":
            i_endian, i_codec, i_shard, i_transpose = _parse_v3_codecs(
                conf.get("codecs", []))
            if i_shard is not None:
                raise NotImplementedError("nested zarr v3 sharding")
            index_codecs = conf.get("index_codecs",
                                    [{"name": "bytes"}, {"name": "crc32c"}])
            index_names = [ic.get("name") for ic in index_codecs]
            if any(n not in ("bytes", "crc32c") for n in index_names):
                raise NotImplementedError(
                    f"zarr v3 shard index codecs {index_names}")
            shard = {
                "chunk_shape": tuple(conf["chunk_shape"]),
                "codec": i_codec,
                "endian": i_endian,
                "transpose": i_transpose,
                "index_crc": "crc32c" in index_names,
                "index_location": conf.get("index_location", "end"),
            }
        else:
            raise NotImplementedError(f"zarr v3 codec {name!r}")
    if not bstack:
        codec = _compressor_codec(None)
    elif len(bstack) == 1:
        codec = bstack[0]
    else:

        def dec(b, _cs=tuple(bstack)):
            for d_, _e in reversed(_cs):
                b = d_(b)
            return b

        def enc(b, _cs=tuple(bstack)):
            for _d, e_ in _cs:
                b = e_(b)
            return b

        codec = (dec, enc)
    return endian, codec, shard, transpose


def _filter_codec(cfg: dict):
    """numcodecs array-side filter config -> (decode, encode) byte
    transforms, applied between the raw chunk bytes and the compressor.
    Delta (the filter real xarray stores put on coordinate arrays) and
    Shuffle are implemented; anything else raises naming the id."""
    fid = (cfg or {}).get("id")
    if fid == "delta":
        vdt = np.dtype(cfg["dtype"])
        adt = np.dtype(cfg.get("astype") or cfg["dtype"])

        def dec(b, _v=vdt, _a=adt):
            enc = np.frombuffer(b, dtype=_a)
            return np.cumsum(enc, dtype=_v).tobytes()

        def enc(b, _v=vdt, _a=adt):
            arr = np.frombuffer(b, dtype=_v)
            out = np.empty(arr.shape, dtype=_a)
            if arr.size:
                out[0] = arr[0]
                # modular in the value dtype, then cast — numcodecs parity
                out[1:] = (arr[1:] - arr[:-1]).astype(_a)
            return out.tobytes()

        return dec, enc
    if fid == "shuffle":
        size = int(cfg.get("elementsize", 4))
        from .hdf5lite import _shuffle_bytes

        return (lambda b, _s=size: _shuffle_bytes(b, _s, forward=False)), (
            lambda b, _s=size: _shuffle_bytes(b, _s, forward=True))
    raise NotImplementedError(
        f"zarr v2 filter {fid!r} unsupported (delta/shuffle are readable; "
        "rewrite the store without other numcodecs filters)")


def _compressor_codec(comp: Optional[dict]):
    """compressor metadata -> (decode, encode) byte transforms."""
    if comp is None:
        return (lambda b: b), (lambda b: b)
    cid = comp.get("id")
    if cid == "zlib":
        lvl = int(comp.get("level", 6))
        return zlib.decompress, (lambda b, _l=lvl: zlib.compress(b, _l))
    if cid == "gzip":
        lvl = int(comp.get("level", 5))

        def gz(b, _l=lvl):
            co = zlib.compressobj(_l, zlib.DEFLATED, 31)
            return co.compress(b) + co.flush()

        return (lambda b: zlib.decompress(b, 47)), gz
    if cid == "blosc":
        from ..codec import blosc_lite

        cname = comp.get("cname", "lz4")
        if cname not in ("lz4", "lz4hc", "zlib"):
            raise NotImplementedError(
                f"blosc cname {cname!r} unsupported in this environment; "
                "rewrite with cname='lz4' or 'zlib'"
            )
        sh = comp.get("shuffle", 1)
        bitsh = sh in ("bitshuffle", 2)
        shuffle = sh in ("shuffle", 1, True)
        ts = int(comp.get("typesize", 4) or 4)
        return blosc_lite.decompress, (
            lambda b, _t=ts, _s=shuffle, _b=bitsh: blosc_lite.compress(
                b, typesize=_t, shuffle=_s, bitshuffle=_b))
    raise NotImplementedError(
        f"zarr compressor {cid!r} unsupported in this environment; "
        "rewrite with zlib, gzip, blosc(lz4/zlib) or no compression"
    )


def _read_array(adir: str) -> Tuple[np.ndarray, dict]:
    info = _ArrayInfo(adir)
    shape, chunks, dt = info.shape, info.chunks, info.dtype
    grid_counts = info.grid_counts()
    # Sparse-store guard: a planetary-quadtree sink (write_zarr_tiles)
    # declares a huge logical shape with few chunks present; allocating
    # it here would OOM. Real-extent rasters (mostly-present chunks, or
    # small arrays) pass untouched.
    logical_bytes = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
    if logical_bytes > 256 * 1024 * 1024:
        n_grid = int(np.prod(grid_counts, dtype=np.int64))
        n_present = len(info.present_chunks())
        if n_present < n_grid // 2:
            raise ValueError(
                f"zarr array at {adir} declares "
                f"{logical_bytes / 2**30:.1f} GiB logical shape {shape} but "
                f"only {n_present}/{n_grid} chunks are present — a sparse "
                "store; use list_zarr_chunks + read_zarr_chunk to stream "
                "chunks instead of materializing the logical array"
            )
    out = np.full(shape, info.fill, dtype=dt)
    for idx in np.ndindex(*grid_counts):
        block = info.read_chunk_file(idx)
        if block is None:
            continue  # missing chunk = fill_value per spec
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sl] = block[tuple(slice(0, x.stop - x.start) for x in sl)]
    attrs = dict(info.attrs)
    if info.dims and "_ARRAY_DIMENSIONS" not in attrs:
        attrs["_ARRAY_DIMENSIONS"] = list(info.dims)
    return out, attrs


def _is_array_dir(adir: str) -> bool:
    if os.path.exists(os.path.join(adir, ".zarray")):
        return True
    p = os.path.join(adir, "zarr.json")
    if os.path.exists(p):
        try:
            return json.load(open(p)).get("node_type") == "array"
        except Exception:
            return False
    return False


def read_zarr(path: str) -> Dict[str, Dict]:
    """Store directory -> {name: {"data": array, "dims": [...],
    "attrs": {...}}}.  Accepts a bare array store or a group store,
    zarr v2 or v3."""
    if _is_array_dir(path):
        arr, attrs = _read_array(path)
        return {os.path.basename(path.rstrip("/")): {
            "data": arr, "dims": attrs.get("_ARRAY_DIMENSIONS", []),
            "attrs": attrs}}
    is_v2_group = os.path.exists(os.path.join(path, ".zgroup"))
    v3_meta = os.path.join(path, "zarr.json")
    is_v3_group = (os.path.exists(v3_meta) and
                   json.load(open(v3_meta)).get("node_type") == "group")
    if not (is_v2_group or is_v3_group):
        raise ValueError(
            f"not a zarr store (no .zgroup/.zarray/zarr.json): {path}")
    out: Dict[str, Dict] = {}
    for name in sorted(os.listdir(path)):
        adir = os.path.join(path, name)
        if os.path.isdir(adir) and _is_array_dir(adir):
            arr, attrs = _read_array(adir)
            out[name] = {"data": arr,
                         "dims": attrs.get("_ARRAY_DIMENSIONS", []),
                         "attrs": attrs}
    return out


def write_zarr(path: str, arrays: Dict[str, Dict], chunks: int = 64,
               compress: bool = True, zarr_format: int = 2,
               compressor: str = "zlib",
               shards: Optional[int] = None) -> str:
    """{name: {"data": ndarray, "dims": [names]}} -> group store.

    ``zarr_format`` 2 (default) or 3; ``compressor`` 'zlib', 'blosc'
    (byte-shuffled zlib-coded blosc chunks) or ignored when
    ``compress=False``. ``shards`` (v3 only) emits sharding_indexed
    shard files of that edge length with ``chunks``-sized inner chunks
    behind a CRC-32C'd binary index — fewer files for object stores."""
    if zarr_format not in (2, 3):
        raise ValueError(f"zarr_format must be 2 or 3, got {zarr_format}")
    if compressor not in ("zlib", "blosc"):
        raise ValueError(f"compressor must be 'zlib' or 'blosc': {compressor}")
    if shards is not None:
        if zarr_format != 3:
            raise ValueError("shards= requires zarr_format=3")
        if shards % chunks:
            raise ValueError(
                f"shards ({shards}) must be a multiple of chunks ({chunks})")
    os.makedirs(path, exist_ok=True)
    if zarr_format == 2:
        json.dump({"zarr_format": 2}, open(os.path.join(path, ".zgroup"), "w"))
    else:
        json.dump({"zarr_format": 3, "node_type": "group", "attributes": {}},
                  open(os.path.join(path, "zarr.json"), "w"))
    for name, spec in arrays.items():
        a = np.ascontiguousarray(spec["data"])
        adir = os.path.join(path, name)
        os.makedirs(adir, exist_ok=True)
        ch = tuple(min(chunks, s) for s in a.shape)
        attrs = dict(spec.get("attrs") or {})
        dims = list(spec.get("dims") or [])
        if zarr_format == 2:
            if compress and compressor == "blosc":
                comp = {"id": "blosc", "cname": "zlib", "clevel": 5,
                        "shuffle": 1, "typesize": a.dtype.itemsize,
                        "blocksize": 0}
            elif compress:
                comp = {"id": "zlib", "level": 6}
            else:
                comp = None
            meta = {
                "zarr_format": 2,
                "shape": list(a.shape),
                "chunks": list(ch),
                "dtype": a.dtype.str,
                "compressor": comp,
                "fill_value": 0,
                "filters": None,
                "order": "C",
            }
            json.dump(meta, open(os.path.join(adir, ".zarray"), "w"))
            if dims:
                attrs["_ARRAY_DIMENSIONS"] = dims
            if attrs:
                json.dump(attrs, open(os.path.join(adir, ".zattrs"), "w"))
        else:
            base = a.dtype.str.lstrip("<>|=")
            if base not in _V3_DTYPES_INV:
                raise NotImplementedError(f"zarr v3 write: dtype {a.dtype}")
            codecs = [{"name": "bytes", "configuration": {
                "endian": "big" if a.dtype.byteorder == ">" else "little"}}]
            if compress and compressor == "blosc":
                codecs.append({"name": "blosc", "configuration": {
                    "cname": "zlib", "clevel": 5, "shuffle": "shuffle",
                    "typesize": a.dtype.itemsize, "blocksize": 0}})
            elif compress:
                codecs.append({"name": "gzip", "configuration": {"level": 5}})
            if shards is not None:
                inner = list(ch)
                ch = tuple(min(shards, s) for s in a.shape)
                # clamp the shard to a whole multiple of the inner chunk
                ch = tuple(max(i, (c // i) * i)
                           for c, i in zip(ch, inner))
                codecs = [{"name": "sharding_indexed", "configuration": {
                    "chunk_shape": inner,
                    "codecs": codecs,
                    "index_codecs": [
                        {"name": "bytes",
                         "configuration": {"endian": "little"}},
                        {"name": "crc32c"}],
                    "index_location": "end"}}]
            meta = {
                "zarr_format": 3,
                "node_type": "array",
                "shape": list(a.shape),
                "data_type": _V3_DTYPES_INV[base],
                "chunk_grid": {"name": "regular",
                               "configuration": {"chunk_shape": list(ch)}},
                "chunk_key_encoding": {"name": "default",
                                       "configuration": {"separator": "/"}},
                "fill_value": 0,
                "codecs": codecs,
                "attributes": attrs,
            }
            if dims:
                meta["dimension_names"] = dims
            json.dump(meta, open(os.path.join(adir, "zarr.json"), "w"))
        info = _ArrayInfo(adir)
        grid_counts = [-(-s // c) for s, c in zip(a.shape, ch)]
        for idx in np.ndindex(*grid_counts):
            sl = tuple(slice(i * c, min((i + 1) * c, s))
                       for i, c, s in zip(idx, ch, a.shape))
            block = np.zeros(ch, dtype=a.dtype)
            view = a[sl]
            block[tuple(slice(0, v) for v in view.shape)] = view
            p = os.path.join(adir, info.chunk_relpath(idx))
            os.makedirs(os.path.dirname(p), exist_ok=True)
            open(p, "wb").write(info.encode_chunk(block))
    return path


def zarr_raster(path: str, var: Optional[str] = None) -> Tuple[np.ndarray, GridSpec]:
    """CF-style 2D variable + 1D coordinate arrays -> (array, GridSpec),
    mirroring netcdf_raster (regular spacing validated; ascending
    latitude flipped north-up)."""
    from .netcdf import cf_unpack

    store = read_zarr(path)
    if var is None:
        two_d = [k for k, v in store.items() if v["data"].ndim == 2]
        if len(two_d) != 1:
            raise ValueError(
                f"zarr store has {len(two_d)} 2D arrays {two_d}; pass var="
            )
        var = two_d[0]
    v = store[var]
    a = cf_unpack(v["data"], v.get("attrs") or {})
    if a.ndim != 2:
        raise ValueError(f"{var} is not 2D: shape {a.shape}")
    crs = str(v["attrs"].get("crs", "EPSG:4326"))
    dims = v["dims"] or []
    if len(dims) != 2 or any(d not in store for d in dims):
        # coordinate-less store (e.g. a bare .zarray array): unit pixel
        # grid, mirroring open_raster's behavior for bare images
        return np.ascontiguousarray(a), GridSpec(
            crs=crs, x_origin=0.0, y_origin=0.0, cell_width=1.0,
            cell_height=-1.0, rows=a.shape[0], cols=a.shape[1],
        )
    ydim, xdim = dims
    from .netcdf import grid_from_coords

    return grid_from_coords(
        a, store[ydim]["data"], store[xdim]["data"], crs
    )


def write_zarr_tiles(tiles, path: str, level: int, tile_size: int,
                     dtype: str = "<f4", compress: bool = True,
                     fill_value: float = 0.0, overwrite: bool = True) -> int:
    """Engine tile table -> ONE logical Zarr v2 array written in
    PARALLEL: each worker writes its tiles as independent chunk files
    (``iy.ix``) straight into the store — the cloud-native pattern Zarr
    exists for (chunks are standalone objects; no coordination, no
    shuffle, resumable by construction since a re-run overwrites the
    same chunk names idempotently). The driver writes only the
    ``.zarray`` metadata; missing chunks read back as ``fill_value``.

    ``tiles`` is a Ray Dataset or pyarrow Table with TILES_SCHEMA
    columns (cell_key, bytes, fmt, th, tw); the world quadtree cell at
    ``level`` becomes chunk (iy, ix) of the (2^level * tile_size)^2
    array. Expects one tile per cell (composite first); returns the
    tile count."""
    import pyarrow as pa_mod

    from .. import codec
    from ..grids.cellkey import decode as _cell_decode

    import shutil

    n = 1 << level
    if overwrite and os.path.exists(path):
        shutil.rmtree(path)  # stale chunks from a prior layout would
        # otherwise survive the metadata rewrite and corrupt readback
    os.makedirs(path, exist_ok=True)
    json.dump({"zarr_format": 2}, open(os.path.join(path, ".zgroup"), "w"))
    adir = os.path.join(path, "tiles")
    os.makedirs(adir, exist_ok=True)
    dt = np.dtype(dtype)
    meta = {
        "zarr_format": 2,
        "shape": [n * tile_size, n * tile_size],
        "chunks": [tile_size, tile_size],
        "dtype": dt.str,
        "compressor": {"id": "zlib", "level": 6} if compress else None,
        "fill_value": fill_value,
        "filters": None,
        "order": "C",
    }
    json.dump(meta, open(os.path.join(adir, ".zarray"), "w"))

    def write_batch(t: pa_mod.Table) -> pa_mod.Table:
        blobs = codec.BlobReader(t.column("bytes"))  # zero-copy slices
        fmts = t.column("fmt").to_pylist()
        keys = t.column("cell_key").to_numpy(zero_copy_only=False)
        written = []
        for i in range(t.num_rows):
            arr = codec.decode(blobs[i], fmts[i])
            block = np.full((tile_size, tile_size), fill_value, dtype=dt)
            block[: arr.shape[0], : arr.shape[1]] = arr[:tile_size, :tile_size]
            lvl, ix, iy = (int(v) for v in _cell_decode(int(keys[i])))
            if lvl != level:
                raise ValueError(
                    f"tile cell_key level {lvl} != sink level {level}; "
                    "chunk indices would fall outside the declared grid"
                )
            raw = block.tobytes()
            if compress:
                raw = zlib.compress(raw, 6)
            # atomic per chunk (unique temp per writer: duplicate keys
            # cannot interleave into a torn file); idempotent re-runs
            p = os.path.join(adir, f"{iy}.{ix}")
            tmp = f"{p}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, p)
            written.append(int(keys[i]))
        return pa_mod.table({"cell_key": pa_mod.array(written, pa_mod.int64())})

    if isinstance(tiles, pa_mod.Table):
        return write_batch(tiles).num_rows
    return int(tiles.map_batches(write_batch, batch_format="pyarrow").count())


def read_zarr_chunk(store: str, array: str, idx: Tuple[int, ...]) -> np.ndarray:
    """Read ONE chunk of a store array without materializing the logical
    array (read_zarr allocates the FULL declared shape — fine for real
    extents, catastrophic for a sparse planetary-quadtree sink where the
    logical array is huge and chunks are few). Missing chunks return a
    fill_value block per spec."""
    info = _ArrayInfo(os.path.join(store, array))
    block = info.read_chunk_file(idx)
    if block is None:
        return np.full(info.chunks, info.fill, dtype=info.dtype)
    # copy: consistent writable result on both present/missing paths
    return block.copy()


def list_zarr_chunks(store: str, array: str) -> list:
    """Sorted chunk index tuples present on disk for one store array."""
    return _ArrayInfo(os.path.join(store, array)).present_chunks()


def read_zarr_window(store: str, array: str, window) -> np.ndarray:
    """AOI read: assemble only the chunks a window touches (the Zarr
    counterpart of hdf5lite.read_hdf5_window / the windowed TIFF path).
    ``window`` is a per-axis sequence of ``(offset, length)`` pairs, or
    the raster-style ``(row_off, col_off, height, width)`` 4-tuple for
    2D arrays; clamped to the declared shape. Absent chunks fill per
    spec — safe on sparse planetary stores because cost scales with
    the WINDOW's chunk count, never the logical shape."""
    import numpy as _np

    info = _ArrayInfo(os.path.join(store, array))
    shape, cdims = info.shape, info.chunks
    if (len(shape) == 2 and len(window) == 4
            and all(_np.isscalar(v) for v in window)):
        window = ((int(window[0]), int(window[2])),
                  (int(window[1]), int(window[3])))
    if len(window) != len(shape):
        raise ValueError(
            f"window has {len(window)} axes, array {array} has {len(shape)}")
    offs_lens = []
    for (o, ln), s in zip(window, shape):
        o = max(0, min(int(o), s))
        ln = max(0, min(int(ln), s - o))
        if ln == 0:
            raise ValueError(f"window {window} is empty after clamping")
        offs_lens.append((o, ln))
    out = _np.full(tuple(ln for _, ln in offs_lens), info.fill,
                   dtype=info.dtype)
    ranges = [range(wo // cd, (wo + wl - 1) // cd + 1)
              for (wo, wl), cd in zip(offs_lens, cdims)]
    import itertools

    for idx in itertools.product(*ranges):
        block = info.read_chunk_file(idx)
        if block is None:
            continue  # stays fill
        sl_out, sl_in = [], []
        for i, ((wo, wl), cd, s) in enumerate(zip(offs_lens, cdims, shape)):
            co = idx[i] * cd
            lo, hi = max(co, wo), min(co + cd, wo + wl, s)
            sl_out.append(slice(lo - wo, hi - wo))
            sl_in.append(slice(lo - co, hi - co))
        out[tuple(sl_out)] = block[tuple(sl_in)]
    return out
