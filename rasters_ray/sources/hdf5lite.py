"""Minimal pure-Python HDF5 reader/writer — contiguous datasets only.

Parity target: the reference opens NetCDF-4 granules (HDF5 containers)
through rasterio/GDAL (reference debug_reading_netcdf.py:6-10,
raster.py:634-771). No HDF5 library ships in this container, so this
module implements the documented subset of the public "HDF5 File Format
Specification Version 2.0" needed to extract UNCOMPRESSED, UNCHUNKED
(contiguous or compact) datasets:

- superblock version 0 (the default emitted by netcdf-c/h5py),
- old-style groups (symbol-table message -> local heap + v1 B-tree ->
  SNOD symbol nodes), recursing into subgroups,
- object header version 1 (with continuation blocks),
- dataspace v1/v2, datatype classes 0/1 (fixed-point/float, either
  endianness), data layout v3 classes 0 (compact) and 1 (contiguous).

Chunked (layout class 2) or filtered datasets raise NotImplementedError
with a clear message — that is the documented env-blocked boundary
(real NASA granules are usually chunked+deflate; converting with
``nccopy -d0 -c var:contiguous`` produces files this reader handles).

``write_hdf5`` emits exactly that subset (one flat root group of
contiguous datasets) and exists so round-trip tests can prove the
reader against independently-constructed bytes; it doubles as an
interchange sink readable by h5py/netcdf4 elsewhere.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# object-header message type ids (spec IV.A.2)
_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_LAYOUT = 0x0008
_MSG_CONTINUATION = 0x0010
_MSG_SYMBOL_TABLE = 0x0011


def _u(buf, off, n):
    return int.from_bytes(buf[off : off + n], "little")


# ---------------------------------------------------------------- reader


class Hdf5LiteError(ValueError):
    pass


def _parse_superblock(d: bytes) -> Dict:
    if d[:8] != _SIG:
        raise Hdf5LiteError("not an HDF5 file (bad signature)")
    ver = d[8]
    if ver != 0:
        raise NotImplementedError(
            f"HDF5 superblock version {ver}: only version 0 (the netcdf-c/"
            "h5py default) is supported in this environment"
        )
    size_off, size_len = d[13], d[14]
    if (size_off, size_len) != (8, 8):
        raise NotImplementedError(
            f"HDF5 offset/length sizes {size_off}/{size_len}: only 8/8 supported"
        )
    base = _u(d, 24, 8)
    if base != 0:
        raise NotImplementedError("HDF5 non-zero base address unsupported")
    # root group symbol table entry starts at byte 56
    root_ohdr = _u(d, 56 + 8, 8)
    return {"root_ohdr": root_ohdr}


def _parse_ohdr_v1(d: bytes, addr: int) -> List[Tuple[int, bytes]]:
    """Object header v1 -> [(msg_type, body)], following continuations."""
    if d[addr] != 1:
        if d[addr : addr + 4] == b"OHDR":
            raise NotImplementedError(
                "HDF5 object header version 2 unsupported (file written with "
                "libver=latest); rewrite with default library version"
            )
        raise Hdf5LiteError(f"bad object header version {d[addr]} @ {addr}")
    nmsgs = _u(d, addr + 2, 2)
    hsize = _u(d, addr + 8, 4)
    # messages start after the 12-byte prefix + 4 pad bytes (8-alignment)
    blocks = [(addr + 16, hsize)]
    msgs: List[Tuple[int, bytes]] = []
    while blocks and len(msgs) < nmsgs:
        off, remaining = blocks.pop(0)
        while remaining >= 8 and len(msgs) < nmsgs:
            mtype = _u(d, off, 2)
            msize = _u(d, off + 2, 2)
            body = bytes(d[off + 8 : off + 8 + msize])
            off += 8 + msize
            remaining -= 8 + msize
            if mtype == _MSG_CONTINUATION:
                blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
            else:
                msgs.append((mtype, body))
    return msgs


def _parse_dataspace(body: bytes) -> Tuple[int, ...]:
    ver = body[0]
    rank = body[1]
    if ver == 1:
        off = 8  # version, rank, flags, 5 reserved
    elif ver == 2:
        off = 4  # version, rank, flags, type
    else:
        raise Hdf5LiteError(f"dataspace version {ver} unsupported")
    return tuple(_u(body, off + 8 * i, 8) for i in range(rank))


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    ver = body[0] >> 4
    if ver not in (1, 2, 3):
        raise Hdf5LiteError(f"datatype version {ver} unsupported")
    bits0 = body[1]
    size = _u(body, 4, 4)
    endian = ">" if (bits0 & 1) else "<"
    if cls == 0:  # fixed-point
        signed = bool(bits0 & 0x08)
        return np.dtype(f"{endian}{'i' if signed else 'u'}{size}")
    if cls == 1:  # floating-point
        if size not in (4, 8):
            raise NotImplementedError(f"float size {size} unsupported")
        return np.dtype(f"{endian}f{size}")
    raise NotImplementedError(
        f"HDF5 datatype class {cls}: only fixed-point/float supported"
    )


def _parse_heap(d: bytes, addr: int) -> Tuple[int, int]:
    if d[addr : addr + 4] != b"HEAP":
        raise Hdf5LiteError(f"bad local heap signature @ {addr}")
    data_addr = _u(d, addr + 24, 8)
    data_size = _u(d, addr + 8, 8)
    return data_addr, data_size


def _heap_name(d: bytes, heap_data: int, off: int) -> str:
    end = d.index(b"\x00", heap_data + off)
    return d[heap_data + off : end].decode("utf-8")


def _walk_btree_snods(d: bytes, addr: int) -> List[int]:
    """v1 group B-tree -> flat list of SNOD addresses (any depth)."""
    if d[addr : addr + 4] != b"TREE":
        raise Hdf5LiteError(f"bad B-tree signature @ {addr}")
    level = d[addr + 5]
    n = _u(d, addr + 6, 2)
    # entries: key0(len=8), child0(8), key1, child1, ... keyN
    children = [_u(d, addr + 24 + 8 + i * 16, 8) for i in range(n)]
    if level == 0:
        return children
    out: List[int] = []
    for c in children:
        out.extend(_walk_btree_snods(d, c))
    return out


def _group_children(d: bytes, msgs) -> Dict[str, int]:
    """Symbol-table message -> {link name: object header address}."""
    stab = next(b for t, b in msgs if t == _MSG_SYMBOL_TABLE)
    btree, heap = _u(stab, 0, 8), _u(stab, 8, 8)
    heap_data, _ = _parse_heap(d, heap)
    out: Dict[str, int] = {}
    for snod in _walk_btree_snods(d, btree):
        if d[snod : snod + 4] != b"SNOD":
            raise Hdf5LiteError(f"bad SNOD signature @ {snod}")
        nsym = _u(d, snod + 6, 2)
        for i in range(nsym):
            e = snod + 8 + i * 40
            name = _heap_name(d, heap_data, _u(d, e, 8))
            out[name] = _u(d, e + 8, 8)
    return out


def _read_dataset(d: bytes, msgs, name: str) -> np.ndarray:
    shape = dtype = None
    layout = None
    for t, b in msgs:
        if t == _MSG_DATASPACE:
            shape = _parse_dataspace(b)
        elif t == _MSG_DATATYPE:
            dtype = _parse_datatype(b)
        elif t == _MSG_LAYOUT:
            layout = b
    if shape is None or dtype is None or layout is None:
        raise Hdf5LiteError(f"dataset {name}: missing dataspace/datatype/layout")
    ver = layout[0]
    if ver != 3:
        raise NotImplementedError(f"dataset {name}: layout version {ver} unsupported")
    lclass = layout[1]
    if lclass == 2:
        raise NotImplementedError(
            f"dataset {name}: chunked/filtered HDF5 layout unsupported in this "
            "environment; rewrite contiguous (e.g. nccopy -d0 with contiguous "
            "storage) or use classic NetCDF"
        )
    if lclass == 0:  # compact: size(2) then raw bytes in the message
        size = _u(layout, 2, 2)
        raw = layout[4 : 4 + size]
    elif lclass == 1:  # contiguous: address(8), size(8)
        addr, size = _u(layout, 2, 8), _u(layout, 10, 8)
        if addr == _UNDEF:
            return np.zeros(shape, dtype=dtype.newbyteorder("="))
        raw = d[addr : addr + size]
    else:
        raise Hdf5LiteError(f"dataset {name}: unknown layout class {lclass}")
    n = int(np.prod(shape or (1,)))
    arr = np.frombuffer(raw, dtype=dtype, count=n).reshape(shape)
    return arr.astype(dtype.newbyteorder("="), copy=False)


def read_hdf5(path_or_bytes) -> Dict[str, np.ndarray]:
    """Extract every contiguous/compact dataset -> {"/path/name": array}.

    Raises NotImplementedError (with the remediation) on chunked or
    filtered datasets, v2+ superblocks, or new-style groups.
    """
    d = (
        bytes(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, memoryview))
        else open(path_or_bytes, "rb").read()
    )
    sb = _parse_superblock(d)
    out: Dict[str, np.ndarray] = {}

    def walk(ohdr_addr: int, prefix: str):
        msgs = _parse_ohdr_v1(d, ohdr_addr)
        types = {t for t, _ in msgs}
        if _MSG_SYMBOL_TABLE in types:
            for name, child in _group_children(d, msgs).items():
                walk(child, f"{prefix}{name}/")
        elif _MSG_LAYOUT in types or _MSG_DATASPACE in types:
            out[prefix.rstrip("/")] = _read_dataset(d, msgs, prefix.rstrip("/"))

    walk(sb["root_ohdr"], "/")
    return out


# ---------------------------------------------------------------- writer


def _dtype_msg(dt: np.dtype) -> bytes:
    le = dt.byteorder in ("<", "=", "|")
    if dt.kind in ("i", "u"):
        bits0 = (0 if le else 1) | (0x08 if dt.kind == "i" else 0)
        props = struct.pack("<HH", 0, dt.itemsize * 8)
        head = bytes([0x10 | 0, bits0, 0, 0]) + struct.pack("<I", dt.itemsize)
        return head + props
    if dt.kind == "f":
        # IEEE-754 layout constants per spec examples
        if dt.itemsize == 4:
            eloc, esz, mloc, msz, bias = 23, 8, 0, 23, 127
        elif dt.itemsize == 8:
            eloc, esz, mloc, msz, bias = 52, 11, 0, 52, 1023
        else:
            raise Hdf5LiteError(f"unsupported float size {dt.itemsize}")
        bits0 = (0 if le else 1) | 0x20  # sign location flag bits: msb sign
        head = bytes([0x10 | 1, bits0, dt.itemsize * 8 - 1, 0]) + struct.pack(
            "<I", dt.itemsize
        )
        props = struct.pack(
            "<HHBBBBI", 0, dt.itemsize * 8, eloc, esz, mloc, msz, bias
        )
        return head + props
    raise Hdf5LiteError(f"unsupported dtype {dt}")


def _msg(mtype: int, body: bytes) -> bytes:
    pad = (8 - len(body) % 8) % 8
    body = body + b"\x00" * pad
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _ohdr_v1(msgs: List[bytes]) -> bytes:
    blob = b"".join(msgs)
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(blob)) + blob


def write_hdf5(path: str, datasets: Dict[str, np.ndarray]) -> str:
    """Flat root group of contiguous datasets, superblock v0."""
    names = sorted(datasets)
    if not names:
        raise Hdf5LiteError("write_hdf5 requires at least one dataset")

    # --- local heap data: offset 0 = empty string (spec convention)
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        b = nm.encode("utf-8") + b"\x00"
        heap_data += b + b"\x00" * ((8 - len(b) % 8) % 8)

    # --- dataset object headers (layout address patched after placement)
    ds_hdrs = []
    for nm in names:
        a = np.ascontiguousarray(datasets[nm])
        space = struct.pack("<BBB5x", 1, a.ndim, 0) + b"".join(
            struct.pack("<Q", s) for s in a.shape
        )
        layout = struct.pack("<BBQQ", 3, 1, 0, a.nbytes)  # addr patched later
        hdr = _ohdr_v1(
            [
                _msg(_MSG_DATASPACE, space),
                _msg(_MSG_DATATYPE, _dtype_msg(a.dtype)),
                _msg(_MSG_LAYOUT, layout),
            ]
        )
        ds_hdrs.append(hdr)

    # --- placement
    def align(n):
        return (n + 7) & ~7

    sb_size = 96
    root_hdr = _ohdr_v1([_msg(_MSG_SYMBOL_TABLE, struct.pack("<QQ", 0, 0))])
    root_addr = sb_size
    heap_addr = align(root_addr + len(root_hdr))
    heap_hdr_size = 32
    heap_data_addr = heap_addr + heap_hdr_size
    btree_addr = align(heap_data_addr + len(heap_data))
    # group B-tree leaf: sig4, type1, level1, used2, left8, right8,
    # then key0(8), child0(8), key1(8)
    btree_size = 24 + 8 + 8 + 8
    snod_addr = align(btree_addr + btree_size)
    snod_size = 8 + 40 * len(names)
    pos = align(snod_addr + snod_size)
    hdr_addr = {}
    for nm, hdr in zip(names, ds_hdrs):
        hdr_addr[nm] = pos
        pos = align(pos + len(hdr))
    data_addr = {}
    for nm in names:
        data_addr[nm] = pos
        pos = align(pos + np.ascontiguousarray(datasets[nm]).nbytes)
    eof = pos

    # --- rebuild dataset headers with true data addresses
    ds_hdrs = []
    for nm in names:
        a = np.ascontiguousarray(datasets[nm])
        space = struct.pack("<BBB5x", 1, a.ndim, 0) + b"".join(
            struct.pack("<Q", s) for s in a.shape
        )
        layout = struct.pack("<BBQQ", 3, 1, data_addr[nm], a.nbytes)
        ds_hdrs.append(
            _ohdr_v1(
                [
                    _msg(_MSG_DATASPACE, space),
                    _msg(_MSG_DATATYPE, _dtype_msg(a.dtype)),
                    _msg(_MSG_LAYOUT, layout),
                ]
            )
        )
    root_hdr = _ohdr_v1(
        [_msg(_MSG_SYMBOL_TABLE, struct.pack("<QQ", btree_addr, heap_addr))]
    )

    buf = bytearray(eof)
    # superblock v0
    struct.pack_into(
        "<8s4B4B2HI4Q", buf, 0, _SIG, 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0,
        0, _UNDEF, eof, _UNDEF,
    )
    # root symbol table entry @56: name off 0, ohdr addr, cache 0
    struct.pack_into("<QQII16x", buf, 56, 0, root_addr, 0, 0)
    buf[root_addr : root_addr + len(root_hdr)] = root_hdr
    struct.pack_into(
        "<4sB3xQQQ", buf, heap_addr, b"HEAP", 0, len(heap_data), _UNDEF,
        heap_data_addr,
    )
    buf[heap_data_addr : heap_data_addr + len(heap_data)] = heap_data
    struct.pack_into(
        "<4sBBHQQQQQ", buf, btree_addr, b"TREE", 0, 0, 1, _UNDEF, _UNDEF,
        0, snod_addr, name_off[names[-1]],
    )
    struct.pack_into("<4sBxH", buf, snod_addr, b"SNOD", 1, len(names))
    for i, nm in enumerate(names):
        struct.pack_into(
            "<QQII16x", buf, snod_addr + 8 + i * 40, name_off[nm], hdr_addr[nm], 0, 0
        )
    for nm, hdr in zip(names, ds_hdrs):
        buf[hdr_addr[nm] : hdr_addr[nm] + len(hdr)] = hdr
        raw = np.ascontiguousarray(datasets[nm]).tobytes()
        buf[data_addr[nm] : data_addr[nm] + len(raw)] = raw
    with open(path, "wb") as f:
        f.write(buf)
    return path
