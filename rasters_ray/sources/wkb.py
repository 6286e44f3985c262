"""Well-Known Binary / Well-Known Text geometry codec (OGC 06-103r4
"Simple feature access" §8; PostGIS EWKB extensions tolerated on read).

The reference reaches WKB through shapely/geopandas (rasters/
vector_geometry.py wraps ``shapely.geometry`` whose constructors accept
WKB/WKT); this engine parses the public byte format directly, the same
from-spec stance as sources/shapefile.py.

Coverage:
- geometry types 1-6 (Point, LineString, Polygon, MultiPoint,
  MultiLineString, MultiPolygon) in BOTH byte orders;
  GeometryCollection raises (mixed classes don't fit the engine's
  uniformly-typed vector tables).
- ISO 3-D/measured variants (type + 1000/2000/3000) and the EWKB
  dimension flags (0x80000000 Z, 0x40000000 M): extra ordinates are
  read and DROPPED, the same policy as the shapefile reader's Z/M
  shapes. The EWKB SRID flag (0x20000000) yields ``EPSG:<srid>``.
- encode emits little-endian ISO 2-D WKB (the GeoParquet §"WKB"
  requirement).
- WKT: the same six types, ``Z``/``M``/``ZM`` suffixes dropped,
  ``EMPTY`` supported for the multi types.

Decoded geometries map onto the engine's vector schema classes
(sources/vectors.py): "point" -> (x, y) pairs, "line" -> ``paths``
part lists, "poly" -> ``rings`` lists.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from .vectors import RING_TYPE

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

_KIND_OF = {1: "point", 2: "line", 3: "poly",
            4: "point", 5: "line", 6: "poly"}


def _geom_header(b: bytes, off: int) -> Tuple[str, int, int, int, Optional[int]]:
    """Parse one geometry header at ``off`` -> (endian_char, base_type,
    n_extra_dims, new_offset, srid)."""
    if off + 5 > len(b):
        raise ValueError("truncated WKB (header)")
    bo = "<" if b[off] == 1 else ">" if b[off] == 0 else None
    if bo is None:
        raise ValueError(f"bad WKB byte-order marker {b[off]!r}")
    (t,) = struct.unpack_from(bo + "I", b, off + 1)
    off += 5
    srid = None
    extra = 0
    if t & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # PostGIS EWKB flags
        if t & _EWKB_Z:
            extra += 1
        if t & _EWKB_M:
            extra += 1
        has_srid = bool(t & _EWKB_SRID)
        t &= 0x0FFFFFFF
        if has_srid:
            (srid,) = struct.unpack_from(bo + "I", b, off)
            off += 4
    else:  # ISO: 1000 Z, 2000 M, 3000 ZM
        iso = t // 1000
        if iso not in (0, 1, 2, 3):
            raise ValueError(f"unknown WKB geometry type {t}")
        extra = 2 if iso == 3 else 1 if iso else 0
        t %= 1000
    if t == 7:
        raise NotImplementedError(
            "WKB GeometryCollection mixes shape classes; split it into "
            "typed collections (the engine's vector tables are "
            "uniformly point/line/polygon)")
    if t not in _KIND_OF:
        raise ValueError(f"unknown WKB geometry type {t}")
    return bo, t, extra, off, srid


def _read_coords(b: bytes, off: int, n: int, bo: str, extra: int
                 ) -> Tuple[np.ndarray, int]:
    """n points of (2 + extra) float64 ordinates -> (n, 2) array."""
    dim = 2 + extra
    nbytes = 8 * dim * n
    if off + nbytes > len(b):
        raise ValueError("truncated WKB (coordinates)")
    a = np.frombuffer(b, bo + "f8", count=dim * n, offset=off)
    pts = a.reshape(n, dim)[:, :2]
    return np.ascontiguousarray(pts, dtype=np.float64), off + nbytes


def decode_wkb(b: bytes) -> Tuple[str, list, Optional[str]]:
    """One WKB blob -> (kind, payload, crs_or_None).

    kind "point": payload is a list of (x, y) tuples (1 for Point,
    n for MultiPoint); "line"/"poly": payload is a list of parts/rings,
    each an (k, 2) float64 ndarray."""
    kind, payload, srid, off = _decode_geom(b, 0)
    if off != len(b):
        # trailing bytes tolerated (some writers pad), but only NULs
        if any(b[off:]):
            raise ValueError(f"{len(b) - off} trailing bytes after WKB body")
    crs = f"EPSG:{srid}" if srid else None
    return kind, payload, crs


def _decode_geom(b: bytes, off: int) -> Tuple[str, list, Optional[int], int]:
    bo, t, extra, off, srid = _geom_header(b, off)
    if t == 1:  # Point
        pts, off = _read_coords(b, off, 1, bo, extra)
        return "point", [(float(pts[0, 0]), float(pts[0, 1]))], srid, off
    if t in (2, 3):  # LineString / Polygon
        (n_parts,) = struct.unpack_from(bo + "I", b, off)
        off += 4
        if t == 2:
            pts, off = _read_coords(b, off, n_parts, bo, extra)
            return "line", [pts], srid, off
        rings = []
        for _ in range(n_parts):
            (npts,) = struct.unpack_from(bo + "I", b, off)
            off += 4
            pts, off = _read_coords(b, off, npts, bo, extra)
            rings.append(pts)
        return "poly", rings, srid, off
    # Multi*: n child geometries, each with its own full header
    (n,) = struct.unpack_from(bo + "I", b, off)
    off += 4
    kind = _KIND_OF[t]
    out: list = []
    for _ in range(n):
        ck, payload, _, off = _decode_geom(b, off)
        if ck != kind:
            raise ValueError(
                f"WKB Multi{kind} contains a {ck} child geometry")
        out.extend(payload)
    return kind, out, srid, off


def encode_wkb(kind: str, payload: Sequence) -> bytes:
    """(kind, payload) in decode_wkb's representation -> little-endian
    ISO 2-D WKB. A single-element point/line/part-list emits the simple
    type; multi-element emits the Multi* wrapper. A "poly" payload is
    ONE polygon's ring list (multipolygon callers encode per polygon
    and wrap with :func:`encode_multipolygon`)."""
    if kind == "point":
        if len(payload) == 1:
            x, y = payload[0]
            return struct.pack("<BIdd", 1, 1, float(x), float(y))
        parts = [struct.pack("<BIdd", 1, 1, float(x), float(y))
                 for x, y in payload]
        return struct.pack("<BII", 1, 4, len(parts)) + b"".join(parts)
    if kind == "line":
        bodies = []
        for pts in payload:
            a = np.ascontiguousarray(pts, dtype="<f8")
            bodies.append(struct.pack("<BII", 1, 2, len(a))
                          + a.tobytes())
        if len(bodies) == 1:
            return bodies[0]
        return struct.pack("<BII", 1, 5, len(bodies)) + b"".join(bodies)
    if kind == "poly":
        body = [struct.pack("<BII", 1, 3, len(payload))]
        for ring in payload:
            a = np.ascontiguousarray(ring, dtype="<f8")
            body.append(struct.pack("<I", len(a)) + a.tobytes())
        return b"".join(body)
    raise ValueError(f"unknown geometry kind {kind!r}")


def encode_multipolygon(polys: Sequence[Sequence]) -> bytes:
    """List of ring-lists -> one MultiPolygon WKB."""
    bodies = [encode_wkb("poly", rings) for rings in polys]
    return struct.pack("<BII", 1, 6, len(bodies)) + b"".join(bodies)


# ---------------------------------------------------------------- WKT

def decode_wkt(s: str) -> Tuple[str, list]:
    """WKT string -> (kind, payload) in decode_wkb's representation."""
    s = s.strip()
    up = s.upper()
    for name, t in (("MULTIPOLYGON", 6), ("MULTILINESTRING", 5),
                    ("MULTIPOINT", 4), ("POLYGON", 3),
                    ("LINESTRING", 2), ("POINT", 1)):
        if up.startswith(name):
            rest = s[len(name):].strip()
            break
    else:
        raise ValueError(f"unknown WKT geometry: {s[:40]!r}")
    # optional dimension suffix
    extra = 0
    ru = rest.upper()
    for suf, e in (("ZM", 2), ("Z", 1), ("M", 1)):
        if ru.startswith(suf) and (len(ru) == len(suf)
                                   or not ru[len(suf)].isalnum()):
            extra = e
            rest = rest[len(suf):].strip()
            break
    kind = _KIND_OF[t]
    if rest.upper() == "EMPTY":
        return kind, []
    if not (rest.startswith("(") and rest.endswith(")")):
        raise ValueError(f"malformed WKT body: {rest[:40]!r}")

    def coords(txt: str) -> np.ndarray:
        pts = []
        for tok in txt.split(","):
            vals = [float(v) for v in tok.split()]
            if len(vals) != 2 + extra:
                raise ValueError(f"WKT point {tok.strip()!r} has "
                                 f"{len(vals)} ordinates, expected {2 + extra}")
            pts.append(vals[:2])
        return np.array(pts, dtype=np.float64)

    def split_groups(txt: str) -> List[str]:
        """Split a (..),(..) list at depth-0 commas, strip one paren."""
        groups, depth, start = [], 0, 0
        for i, ch in enumerate(txt):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                groups.append(txt[start:i])
                start = i + 1
        groups.append(txt[start:])
        out = []
        for g in groups:
            g = g.strip()
            if not (g.startswith("(") and g.endswith(")")):
                raise ValueError(f"malformed WKT group: {g[:40]!r}")
            out.append(g[1:-1])
        return out

    body = rest[1:-1].strip()
    if t == 1:
        return "point", [tuple(coords(body)[0])]
    if t == 2:
        return "line", [coords(body)]
    if t == 3:
        return "poly", [coords(g) for g in split_groups(body)]
    if t == 4:
        # MULTIPOINT accepts both (1 2, 3 4) and ((1 2), (3 4))
        if body.lstrip().startswith("("):
            return "point", [tuple(coords(g)[0]) for g in split_groups(body)]
        return "point", [tuple(p) for p in coords(body)]
    if t == 5:
        return "line", [coords(g) for g in split_groups(body)]
    # t == 6: MULTIPOLYGON ( ((..)) , ((..),(..)) ) — flatten rings,
    # the engine's rings column is per-feature (exterior-first parts)
    rings: List[np.ndarray] = []
    for poly in split_groups(body):
        rings.extend(coords(g) for g in split_groups(poly))
    return "poly", rings


def encode_wkt(kind: str, payload: Sequence) -> str:
    """(kind, payload) -> 2-D WKT."""
    def pt(p) -> str:
        return f"{p[0]:.17g} {p[1]:.17g}"

    def seq(a) -> str:
        return ", ".join(pt(p) for p in np.asarray(a, dtype=np.float64))

    if kind == "point":
        if len(payload) == 1:
            return f"POINT ({pt(payload[0])})"
        return ("MULTIPOINT (" +
                ", ".join(f"({pt(p)})" for p in payload) + ")")
    if kind == "line":
        if len(payload) == 1:
            return f"LINESTRING ({seq(payload[0])})"
        return ("MULTILINESTRING (" +
                ", ".join(f"({seq(p)})" for p in payload) + ")")
    if kind == "poly":
        return ("POLYGON (" +
                ", ".join(f"({seq(r)})" for r in payload) + ")")
    raise ValueError(f"unknown geometry kind {kind!r}")


# ------------------------------------------------- table conversions

def _is_plain_le_points(vals: List[Optional[bytes]]) -> bool:
    return all(v is not None and len(v) == 21 and v[0] == 1
               and v[1:5] == b"\x01\x00\x00\x00" for v in vals)


def wkb_column_to_table(ids: Sequence[str], wkb_vals: Sequence[Optional[bytes]],
                        crs: str = "EPSG:4326",
                        extra: Optional[Dict[str, list]] = None) -> pa.Table:
    """A WKB geometry column -> the engine's vector table for the
    column's (single) shape class; nulls are skipped like shapefile
    null shapes. Pure little-endian 2-D Point columns (the dominant
    GeoParquet case) take a vectorized path: one buffer concat + one
    frombuffer, no per-row struct calls."""
    vals = list(wkb_vals)
    ids = list(ids)
    extra = extra or {}
    keep = [i for i, v in enumerate(vals) if v is not None]
    if len(keep) != len(vals):
        vals = [vals[i] for i in keep]
        ids = [ids[i] for i in keep]
        extra = {k: [col[i] for i in keep] for k, col in extra.items()}
    if not vals:
        raise ValueError("WKB column has no non-null geometries")

    if _is_plain_le_points(vals):
        buf = np.frombuffer(b"".join(vals), np.uint8).reshape(len(vals), 21)
        xy = buf[:, 5:].copy().view("<f8").reshape(len(vals), 2)
        data: Dict[str, pa.Array] = {
            "point_id": pa.array(ids, pa.string()),
            "x": pa.array(xy[:, 0], pa.float64()),
            "y": pa.array(xy[:, 1], pa.float64()),
        }
    else:
        base: Optional[str] = None
        out_ids: List[str] = []
        row_src: List[int] = []
        xs: List[float] = []
        ys: List[float] = []
        geoms: List[list] = []
        for i, (rid, v) in enumerate(zip(ids, vals)):
            kind, payload, gcrs = decode_wkb(v)
            if gcrs:
                crs = gcrs
            if base is None:
                base = kind
            elif base != kind:
                raise ValueError(
                    f"mixed shape classes in WKB column ({base} then {kind})")
            if kind == "point":
                for j, (x, y) in enumerate(payload):
                    out_ids.append(rid if len(payload) == 1 else f"{rid}/{j}")
                    row_src.append(i)
                    xs.append(x)
                    ys.append(y)
            else:
                out_ids.append(rid)
                row_src.append(i)
                geoms.append([[{"x": float(x), "y": float(y)} for x, y in part]
                              for part in payload])
        extra = {k: [col[i] for i in row_src] for k, col in extra.items()}
        if base == "point":
            data = {"point_id": pa.array(out_ids, pa.string()),
                    "x": pa.array(xs, pa.float64()),
                    "y": pa.array(ys, pa.float64())}
        else:
            col = "rings" if base == "poly" else "paths"
            data = {("poly_id" if base == "poly" else "line_id"):
                    pa.array(out_ids, pa.string()),
                    col: pa.array(geoms, RING_TYPE)}
    n = len(data[next(iter(data))])
    data["crs"] = pa.array([crs] * n, pa.string())
    for k, colv in extra.items():
        if k not in data:
            data[k] = pa.array(colv)
    return pa.table(data)


def table_to_wkb(table: pa.Table) -> Tuple[List[str], List[bytes], str, str]:
    """Engine vector table -> (ids, wkb_list, kind, crs). Points emit
    21-byte LE Point blobs vectorized; rings/paths emit Polygon /
    (Multi)LineString per feature."""
    cols = set(table.column_names)
    crs_col = table.column("crs").to_pylist() if "crs" in cols else []
    crs = crs_col[0] if crs_col else "EPSG:4326"
    if "x" in cols and "y" in cols:
        x = table.column("x").to_numpy().astype("<f8")
        y = table.column("y").to_numpy().astype("<f8")
        n = len(x)
        buf = np.empty((n, 21), np.uint8)
        buf[:, 0] = 1
        buf[:, 1:5] = np.frombuffer(struct.pack("<I", 1), np.uint8)
        buf[:, 5:13] = x.reshape(n, 1).view(np.uint8)
        buf[:, 13:21] = y.reshape(n, 1).view(np.uint8)
        raw = buf.tobytes()
        ids = table.column("point_id").to_pylist()
        return ids, [raw[i * 21:(i + 1) * 21] for i in range(n)], "point", crs
    geom_col = "rings" if "rings" in cols else "paths" if "paths" in cols else None
    if geom_col is None:
        raise ValueError(
            f"need x/y or rings/paths columns, got {sorted(cols)}")
    kind = "poly" if geom_col == "rings" else "line"
    id_col = "poly_id" if kind == "poly" else "line_id"
    ids = table.column(id_col).to_pylist()
    blobs = []
    for cell in table.column(geom_col).to_pylist():
        parts = [np.array([(p["x"], p["y"]) for p in part], dtype=np.float64)
                 for part in cell]
        blobs.append(encode_wkb(kind, parts))
    return ids, blobs, kind, crs
