"""LZ4 block-format codec — pure Python, public format spec.

The LZ4 block format (github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md)
is a sequence of [token][literal-length*][literals][offset(2,LE)]
[match-length*] sequences; the last sequence is literals-only. No
framing, no checksums — exactly what blosc stores inside its chunks.

``compress`` is a greedy hash-chain matcher (correctness over ratio —
the engine uses it for round-trip tests and interchange sinks);
``decompress`` handles any conformant stream, including overlapping
matches (the RLE trick real encoders emit)."""

from __future__ import annotations


def decompress(src: bytes, max_out: int | None = None) -> bytes:
    """LZ4 block bytes -> raw bytes. Decodes until input is exhausted;
    ``max_out`` (if given) bounds output as a sanity check."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            out += src[i : i + lit]
            i += lit
        if i >= n:
            break  # last sequence is literals-only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("LZ4: zero match offset")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("LZ4: match offset before start")
        if off >= mlen:
            out += out[start : start + mlen]
        else:  # overlapping match: byte-wise RLE-style copy
            for k in range(mlen):
                out.append(out[start + k])
        if max_out is not None and len(out) > max_out:
            raise ValueError("LZ4: output exceeds declared size")
    return bytes(out)


def compress(src: bytes) -> bytes:
    """Raw bytes -> LZ4 block bytes (greedy single-entry hash matcher).

    Honors the format's end conditions: the last 5 bytes are always
    literals and the last match must start >= 12 bytes before the end."""
    n = len(src)
    out = bytearray()

    def put_len(base: int, val: int, token_pos: int, shift: int):
        if val < 15:
            out[token_pos] |= val << shift
            return
        out[token_pos] |= 15 << shift
        val -= 15
        while val >= 255:
            out.append(255)
            val -= 255
        out.append(val)

    def emit(lit_start: int, lit_end: int, off: int = 0, mlen: int = 0):
        lit = lit_end - lit_start
        token_pos = len(out)
        out.append(0)
        if lit >= 15:
            put_len(token_pos, lit, token_pos, 4)
        else:
            out[token_pos] |= lit << 4
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.append(off & 0xFF)
            out.append(off >> 8)
            m = mlen - 4
            if m >= 15:
                put_len(token_pos, m, token_pos, 0)
            else:
                out[token_pos] |= m

    if n < 13:  # too short for any match per the end rules
        emit(0, n)
        return bytes(out)
    table: dict = {}
    anchor = 0
    i = 0
    limit = n - 12  # last match must leave >= 12 bytes
    while i <= limit:
        key = src[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF and src[j : j + 4] == key:
            mlen = 4
            end = n - 5  # last 5 bytes must stay literals
            while i + mlen < end and src[j + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, i - j, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n)
    return bytes(out)
