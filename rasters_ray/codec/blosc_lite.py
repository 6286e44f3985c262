"""Blosc1 chunk codec — pure Python, public c-blosc container format.

Blosc is the default Zarr compressor (numcodecs ``Blosc(cname='lz4',
shuffle=SHUFFLE)``), so real-world Zarr v2 stores are mostly
blosc-framed. The chunk format (c-blosc README_HEADER_FORMAT.rst,
public) is:

- 16-byte header: version, versionlz, flags, typesize, nbytes(u32le),
  blocksize(u32le), cbytes(u32le). flags bit0 = byte-shuffle, bit1 =
  pure memcpy, bit2 = bit-shuffle; bits 5-7 = compressor id
  (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd).
- unless memcpy: u32le block offsets (one per ceil(nbytes/blocksize)
  block, relative to chunk start), then per block 1..typesize
  "[i32 csize][payload]" split streams; csize == stream's uncompressed
  size marks a stored-raw stream. Byte-shuffle applies per block.

``decompress`` reads lz4 / zlib / memcpy chunks with or without byte
shuffle. Whether an encoder SPLIT each block into typesize streams is a
deterministic function of its settings, but rather than replicate
c-blosc's exact constants, the reader INFERS it: it walks the block
once assuming splits and validates stream sizes, falling back to
unsplit — both layouts are self-describing enough to disambiguate.

``compress`` emits zlib-coded chunks (split never applies to zlib in
c-blosc, so the layout is unambiguous for real blosc readers too) with
optional byte or bit shuffle. Blosclz, snappy and zstd raise naming
the codec.

Bit-shuffle (flags bit 2) follows the public bitshuffle library layout
c-blosc embeds (``bshuf_trans_bit_elem``): per block, the elements are
byte-transposed, then each byte plane is split into 8 bit planes (LSB
first), each plane packing bit ``b`` of byte ``k`` of every element in
little-endian element order — i.e. a bit-matrix transpose of
(n_elements, 8*typesize). c-blosc rounds the element count down to a
multiple of 8 and memcpy's the tail (shuffle.c ``bitshuffle``)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import lz4_lite

_COMP_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Undo blosc byte-shuffle on one block; trailing bytes that don't
    fill a whole item are stored unshuffled (c-blosc convention)."""
    if typesize <= 1:
        return buf
    n = len(buf)
    main = (n // typesize) * typesize
    a = np.frombuffer(buf[:main], np.uint8)
    out = a.reshape(typesize, -1).T.reshape(-1).tobytes()
    return out + buf[main:]


def _shuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return buf
    n = len(buf)
    main = (n // typesize) * typesize
    a = np.frombuffer(buf[:main], np.uint8)
    out = a.reshape(-1, typesize).T.reshape(-1).tobytes()
    return out + buf[main:]


def _bit_unshuffle(buf: bytes, typesize: int) -> bytes:
    """Undo blosc bit-shuffle on one block. The shuffled layout is the
    transpose of the (n_elements, 8*typesize) bit matrix with planes
    ordered byte-then-bit (LSB first) and elements packed little-endian;
    c-blosc shuffles only ``n - n % 8`` elements and stores the tail
    raw (shuffle.c ``bitshuffle``/``bitunshuffle``)."""
    n = len(buf) // typesize
    n -= n % 8
    main = n * typesize
    if n == 0:
        return buf
    planes = np.frombuffer(buf[:main], np.uint8).reshape(typesize * 8, n // 8)
    bits = np.unpackbits(planes, axis=1, bitorder="little")  # (8T, n)
    elems = np.packbits(bits.T, axis=1, bitorder="little")  # (n, T)
    return elems.tobytes() + buf[main:]


def _bit_shuffle(buf: bytes, typesize: int) -> bytes:
    """Forward bit-shuffle matching ``_bit_unshuffle``."""
    n = len(buf) // typesize
    n -= n % 8
    main = n * typesize
    if n == 0:
        return buf
    elems = np.frombuffer(buf[:main], np.uint8).reshape(n, typesize)
    bits = np.unpackbits(elems, axis=1, bitorder="little")  # (n, 8T)
    planes = np.packbits(bits.T, axis=1, bitorder="little")  # (8T, n/8)
    return planes.tobytes() + buf[main:]


def _decode_streams(d: bytes, pos: int, neblock: int, nsplits: int,
                    codec: int) -> bytes:
    """One block's [csize][payload] streams -> neblock raw bytes.
    Raises ValueError on any inconsistency (used for split inference)."""
    part = neblock // nsplits
    out = bytearray()
    for si in range(nsplits):
        want = part if si < nsplits - 1 else neblock - part * (nsplits - 1)
        if pos + 4 > len(d):
            raise ValueError("blosc: truncated stream header")
        csize = struct.unpack_from("<i", d, pos)[0]
        pos += 4
        if csize < 0 or pos + csize > len(d):
            raise ValueError("blosc: bad stream size")
        payload = d[pos : pos + csize]
        pos += csize
        if csize == want:
            out += payload  # stored raw
        elif codec == 1:
            raw = lz4_lite.decompress(payload, max_out=want)
            if len(raw) != want:
                raise ValueError("blosc: lz4 stream size mismatch")
            out += raw
        elif codec == 3:
            raw = zlib.decompress(payload)
            if len(raw) != want:
                raise ValueError("blosc: zlib stream size mismatch")
            out += raw
        else:
            raise NotImplementedError(
                f"blosc compressor {_COMP_NAMES.get(codec, codec)!r} "
                "unsupported in this environment (lz4/zlib/memcpy only); "
                "rewrite the store with cname='lz4' or 'zlib'"
            )
    return bytes(out)


def decompress(data: bytes) -> bytes:
    d = bytes(data)
    if len(d) < 16:
        raise ValueError("blosc chunk shorter than its 16-byte header")
    flags, typesize = d[2], d[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", d, 4)
    if cbytes != len(d):
        # tolerate trailing padding some writers leave, but never short
        if cbytes > len(d):
            raise ValueError("blosc: cbytes exceeds chunk length")
    if flags & 0x02:  # pure memcpy: original bytes follow the header
        return d[16 : 16 + nbytes]
    codec = flags >> 5
    shuffled = bool(flags & 0x01)
    bitshuffled = bool(flags & 0x04)
    nblocks = -(-nbytes // blocksize) if blocksize else 0
    starts = list(struct.unpack_from(f"<{nblocks}I", d, 16))
    out = bytearray()
    for j in range(nblocks):
        neblock = min(blocksize, nbytes - j * blocksize)
        block = None
        # split inference: typesize streams first, then unsplit
        tries = [typesize, 1] if (
            typesize > 1 and neblock % typesize == 0) else [1]
        err = None
        for nsplits in tries:
            try:
                block = _decode_streams(d, starts[j], neblock, nsplits, codec)
                break
            except ValueError as e:
                err = e
        if block is None:
            raise ValueError(f"blosc: block {j} undecodable: {err}")
        if shuffled:
            block = _unshuffle(block, typesize)
        elif bitshuffled:
            block = _bit_unshuffle(block, max(typesize, 1))
        out += block
    if len(out) != nbytes:
        raise ValueError("blosc: reassembled size mismatch")
    return bytes(out)


def compress(data: bytes, typesize: int = 4, shuffle: bool = True,
             blocksize: int = 1 << 18, clevel: int = 5,
             bitshuffle: bool = False) -> bytes:
    """Raw bytes -> blosc chunk (zlib codec, unsplit blocks — the layout
    every c-blosc build reads back deterministically). ``bitshuffle``
    selects the bit-plane transpose (flags bit 2) instead of the byte
    shuffle; the two are mutually exclusive per the c-blosc header."""
    d = bytes(data)
    nbytes = len(d)
    if nbytes == 0:
        return struct.pack("<BBBBIII", 2, 1, 0x02, max(typesize, 1), 0, 0, 16)
    if bitshuffle:
        shuffle = False
    blocksize = min(blocksize, nbytes)
    nblocks = -(-nbytes // blocksize)
    flags = ((3 << 5) | (0x01 if shuffle and typesize > 1 else 0)
             | (0x04 if bitshuffle else 0))
    blobs = []
    for j in range(nblocks):
        raw = d[j * blocksize : j * blocksize + blocksize]
        if shuffle and typesize > 1:
            raw = _shuffle(raw, typesize)
        elif bitshuffle:
            raw = _bit_shuffle(raw, max(typesize, 1))
        comp = zlib.compress(raw, clevel)
        if len(comp) >= len(raw):
            comp, csize = raw, len(raw)  # stored raw (csize == neblock)
        else:
            csize = len(comp)
        blobs.append(struct.pack("<i", csize) + comp)
    header_len = 16 + 4 * nblocks
    total = header_len + sum(len(b) for b in blobs)
    if total >= nbytes + 16:  # incompressible: memcpy mode
        return struct.pack("<BBBBIII", 2, 1, 0x02, max(typesize, 1),
                           nbytes, blocksize, 16 + nbytes) + d
    out = bytearray(struct.pack("<BBBBIII", 2, 1, flags, max(typesize, 1),
                                nbytes, blocksize, total))
    pos = header_len
    for b in blobs:
        out += struct.pack("<I", pos)
        pos += len(b)
    for b in blobs:
        out += b
    return bytes(out)
