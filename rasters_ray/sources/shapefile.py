"""ESRI Shapefile read/write — the vector staple (the reference gets
vector geometries via geopandas/fiona for its rasterize/mask/to_point
paths, rasters/raster.py:1488-1530; same public spec: "ESRI Shapefile
Technical Description", July 1998).

A shapefile is three files: ``.shp`` (geometry records), ``.shx``
(record index), ``.dbf`` (dBase III attributes), plus the optional
``.prj``/``.crs`` CRS sidecar. This module reads the ``.shp`` directly
(the index is redundant for a sequential scan), joins the ``.dbf``
columns positionally, and emits the engine's Arrow vector schemas:

- Point / PointZ/M / MultiPoint  -> ``point_id, x, y, crs`` (+ dbf
  attribute columns; multipoints explode to one row per point)
- Polygon / PolygonZ/M           -> ``poly_id, rings, crs`` (+ attrs),
  parts -> rings of ``list<list<struct<x,y>>>`` (RING_TYPE)
- PolyLine / Z/M                 -> ``line_id, paths, crs`` (+ attrs)

Z and M payloads are tolerated and dropped (the GDAL default when the
consumer is 2D). ``write_shapefile`` emits .shp + .shx + .dbf (+ .crs)
from the same Arrow shapes so the reader is proven by round-trip.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .vectors import RING_TYPE

_FILE_CODE = 9994
_VERSION = 1000

# shape-type code -> (base geometry, has_z, has_m); spec table at p.4
_POINT_T = {1, 11, 21}
_MULTIPOINT_T = {8, 18, 28}
_POLYLINE_T = {3, 13, 23}
_POLYGON_T = {5, 15, 25}


def _sidecar_crs(path: str) -> str:
    base = os.path.splitext(path)[0]
    for sc in (base + ".prj", base + ".crs"):
        if os.path.exists(sc):
            return open(sc).read().strip()
    return "EPSG:4326"


# ---------------------------------------------------------------------------
# dBase III (.dbf)
# ---------------------------------------------------------------------------


def _read_dbf(path: str) -> Dict[str, list]:
    """dBase III attribute columns: C -> str, N/F -> float (int when
    the decimal count is 0), L -> bool, D -> 'YYYYMMDD' str. Missing
    file -> no attributes."""
    if not os.path.exists(path):
        return {}
    d = open(path, "rb").read()
    nrec = struct.unpack("<I", d[4:8])[0]
    hdr_size, rec_size = struct.unpack("<HH", d[8:12])
    fields = []
    off = 32
    while off < hdr_size - 1 and d[off] != 0x0D:
        name = d[off:off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(d[off + 11])
        flen, fdec = d[off + 16], d[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    cols: Dict[str, list] = {name: [] for name, *_ in fields}
    p = hdr_size
    for _ in range(nrec):
        rec = d[p:p + rec_size]
        p += rec_size
        if not rec or rec[0:1] == b"*":  # deleted row
            continue
        fp = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[fp:fp + flen].decode("ascii", "replace").strip()
            fp += flen
            if ftype in ("N", "F"):
                if raw in ("", "*" * flen):
                    cols[name].append(None)
                elif fdec == 0 and ftype == "N":
                    cols[name].append(int(raw))
                else:
                    cols[name].append(float(raw))
            elif ftype == "L":
                cols[name].append(raw.upper() in ("T", "Y"))
            else:  # C, D and anything exotic stay text
                cols[name].append(raw)
    return cols


def _write_dbf(path: str, cols: Dict[str, list], nrec: int) -> None:
    fields = []
    encoded: List[List[bytes]] = []
    for name, vals in cols.items():
        if all(v is None or isinstance(v, bool) for v in vals) and any(
                isinstance(v, bool) for v in vals):
            cells = [b"T" if v else b"F" for v in vals]
            fields.append((name, "L", 1, 0))
        elif all(v is None or isinstance(v, (int, np.integer)) for v in vals):
            cells = [b"" if v is None else str(int(v)).encode() for v in vals]
            w = max(1, max((len(c) for c in cells), default=1))
            cells = [c.rjust(w) for c in cells]
            fields.append((name, "N", w, 0))
        elif all(v is None or isinstance(v, (int, float, np.floating,
                                             np.integer)) for v in vals):
            cells = [b"" if v is None else np.format_float_positional(
                float(v), precision=11, unique=True).encode() for v in vals]
            w = max(1, max((len(c) for c in cells), default=1))
            cells = [c.rjust(w) for c in cells]
            fields.append((name, "F", w, 11))
        else:
            cells = [("" if v is None else str(v)).encode("ascii", "replace")
                     for v in vals]
            w = max(1, min(254, max((len(c) for c in cells), default=1)))
            cells = [c[:w].ljust(w) for c in cells]
            fields.append((name, "C", w, 0))
        encoded.append(cells)
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 126, 1, 1, nrec, hdr_size, rec_size)
    for name, ftype, flen, fdec in fields:
        out += struct.pack("<11sc4xBB14x", name.encode("ascii")[:11],
                           ftype.encode(), flen, fdec)
    out += b"\x0d"
    for i in range(nrec):
        out += b" "
        for cells in encoded:
            out += cells[i]
    out += b"\x1a"
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# .shp
# ---------------------------------------------------------------------------


def _iter_records(d: bytes):
    """Yield (recnum, shape_type, content) honoring the per-record
    BIG-ENDIAN headers (content itself is little-endian)."""
    off = 100
    n = len(d)
    while off + 8 <= n:
        recnum, nwords = struct.unpack(">ii", d[off:off + 8])
        content = d[off + 8:off + 8 + 2 * nwords]
        off += 8 + 2 * nwords
        if len(content) < 4:
            break
        (stype,) = struct.unpack("<i", content[:4])
        yield recnum, stype, content


def read_shapefile(path: str) -> pa.Table:
    """Read ``.shp`` (+ ``.dbf`` attributes, ``.prj``/``.crs`` CRS) ->
    an Arrow table in the engine's vector schema for the file's shape
    class. The id column is the first ``C`` attribute when the .dbf
    has one, else ``shp%06d`` record numbers."""
    d = open(path, "rb").read()
    code, flen_words = struct.unpack(">i20xi", d[:28])
    if code != _FILE_CODE:
        raise ValueError(f"not a shapefile (file code {code}): {path}")
    version, ftype = struct.unpack("<ii", d[28:36])
    if version != _VERSION:
        raise ValueError(f"unsupported shapefile version {version}: {path}")
    crs = _sidecar_crs(path)
    attrs = _read_dbf(os.path.splitext(path)[0] + ".dbf")
    id_field = next((k for k, v in attrs.items()
                     if v and isinstance(v[0], str)), None)

    base: Optional[str] = None
    ids: List[str] = []
    row_attr_idx: List[int] = []  # which dbf row each output row uses
    xs: List[float] = []
    ys: List[float] = []
    geoms: List[list] = []
    rec_i = -1
    for recnum, stype, content in _iter_records(d):
        rec_i += 1
        if stype == 0:  # null shape: skipped, keeps dbf alignment
            continue
        rid = (attrs[id_field][rec_i] if id_field is not None
               and rec_i < len(attrs[id_field]) else f"shp{recnum:06d}")
        if stype in _POINT_T:
            kind = "point"
            x, y = struct.unpack("<dd", content[4:20])
            ids.append(rid); row_attr_idx.append(rec_i)
            xs.append(x); ys.append(y)
        elif stype in _MULTIPOINT_T:
            kind = "point"
            (npts,) = struct.unpack("<i", content[36:40])
            pts = np.frombuffer(content, "<f8", count=2 * npts, offset=40)
            for j in range(npts):
                ids.append(rid if npts == 1 else f"{rid}/{j}")
                row_attr_idx.append(rec_i)
                xs.append(float(pts[2 * j])); ys.append(float(pts[2 * j + 1]))
        elif stype in _POLYLINE_T or stype in _POLYGON_T:
            kind = "poly" if stype in _POLYGON_T else "line"
            nparts, npts = struct.unpack("<ii", content[36:44])
            parts = np.frombuffer(content, "<i4", count=nparts, offset=44)
            pts = np.frombuffer(content, "<f8", count=2 * npts,
                                offset=44 + 4 * nparts).reshape(npts, 2)
            bounds = list(parts) + [npts]
            rings = [
                [{"x": float(px), "y": float(py)}
                 for px, py in pts[bounds[k]:bounds[k + 1]]]
                for k in range(nparts)
            ]
            ids.append(rid); row_attr_idx.append(rec_i)
            geoms.append(rings)
        else:
            raise NotImplementedError(
                f"shapefile shape type {stype} (record {recnum}) is not "
                "supported (points/multipoints/polylines/polygons only)")
        if base is None:
            base = kind
        elif base != kind:
            raise ValueError(
                f"mixed shape classes in one file ({base} then {kind})")
    if base is None:
        raise ValueError(f"shapefile has no non-null records: {path}")

    extra = {k: [v[i] if i < len(v) else None for i in row_attr_idx]
             for k, v in attrs.items() if k != id_field}
    if base == "point":
        data = {"point_id": pa.array(ids, pa.string()),
                "x": pa.array(xs, pa.float64()),
                "y": pa.array(ys, pa.float64())}
    else:
        col = "rings" if base == "poly" else "paths"
        data = {("poly_id" if base == "poly" else "line_id"):
                pa.array(ids, pa.string()),
                col: pa.array(geoms, RING_TYPE)}
    data["crs"] = pa.array([crs] * len(ids), pa.string())
    for k, v in extra.items():
        data[k] = pa.array(v)
    return pa.table(data)


def write_shapefile(table: pa.Table, path: str) -> None:
    """Write a points table (``x``/``y`` columns) or polygons/lines
    table (``rings``/``paths``) as .shp + .shx + .dbf; a non-4326
    ``crs`` column value goes to the ``.crs`` sidecar. All remaining
    columns become .dbf attributes (the id column first, so the reader
    recovers it)."""
    cols = set(table.column_names)
    if {"x", "y"} <= cols:
        mode, idcol = "point", ("point_id" if "point_id" in cols else None)
    elif "rings" in cols:
        mode, idcol = "poly", ("poly_id" if "poly_id" in cols else None)
    elif "paths" in cols:
        mode, idcol = "line", ("line_id" if "line_id" in cols else None)
    else:
        raise ValueError(
            f"need x/y or rings/paths columns, got {sorted(cols)}")

    records: List[bytes] = []
    allx: List[float] = []
    ally: List[float] = []
    if mode == "point":
        xs = table.column("x").to_numpy()
        ys = table.column("y").to_numpy()
        shape_type = 1
        for x, y in zip(xs, ys):
            records.append(struct.pack("<idd", 1, float(x), float(y)))
        allx, ally = list(xs), list(ys)
    else:
        geom_col = "rings" if mode == "poly" else "paths"
        shape_type = 5 if mode == "poly" else 3
        for rings_v in table.column(geom_col).to_pylist():
            pts = [(p["x"], p["y"]) for ring in rings_v for p in ring]
            parts, acc = [], 0
            for ring in rings_v:
                parts.append(acc)
                acc += len(ring)
            a = np.asarray(pts, dtype="<f8").reshape(-1, 2)
            box = (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())
            rec = struct.pack("<i4dii", shape_type, *box, len(parts), len(a))
            rec += np.asarray(parts, "<i4").tobytes() + a.tobytes()
            records.append(rec)
            allx += list(a[:, 0]); ally += list(a[:, 1])

    shp = bytearray()
    shx = bytearray()
    body_words = sum(4 + len(r) // 2 for r in records)
    bbox = (min(allx), min(ally), max(allx), max(ally)) if allx else (0,) * 4
    for buf, words in ((shp, 50 + body_words), (shx, 50 + 4 * len(records))):
        buf += struct.pack(">i20xi", _FILE_CODE, words)
        buf += struct.pack("<ii", _VERSION, shape_type)
        buf += struct.pack("<8d", *bbox, 0.0, 0.0, 0.0, 0.0)  # zmin..mmax
    off_words = 50
    for i, rec in enumerate(records):
        shp += struct.pack(">ii", i + 1, len(rec) // 2) + rec
        shx += struct.pack(">ii", off_words, len(rec) // 2)
        off_words += 4 + len(rec) // 2
    base = os.path.splitext(path)[0]
    for ext, blob in ((".shp", shp), (".shx", shx)):
        tmp = f"{base}{ext}.tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(bytes(blob))
        os.replace(tmp, base + ext)

    geom_cols = {"x", "y", "rings", "paths", "crs"}
    attr_names = ([idcol] if idcol else []) + [
        c for c in table.column_names
        if c not in geom_cols and c != idcol]
    attrs = {c: table.column(c).to_pylist() for c in attr_names}
    _write_dbf(base + ".dbf", attrs, table.num_rows)
    crs_vals = (table.column("crs").to_pylist()
                if "crs" in table.column_names else ["EPSG:4326"])
    if crs_vals and crs_vals[0] != "EPSG:4326":
        with open(base + ".crs", "w") as fh:
            fh.write(crs_vals[0])


def write_shapefile_dataset(ds, out_dir: str, prefix: str = "part"):
    """Distributed shapefile sink: each block of a points/polygons/
    lines dataset becomes one ``out_dir/<prefix>-<firstid>.shp`` (+
    .shx/.dbf/.crs) written ON ITS WORKER — the shard-per-block layout
    every sink in this engine uses (resumable, no driver funnel; a
    consumer opens the directory as a multi-file layer, which is how
    large shapefile deliveries ship in practice since one .shp caps at
    2 GB). Returns the manifest Dataset[(path, n_rows)] — consume it to
    drive the write."""
    import pyarrow as pa_mod

    def write(batch: pa_mod.Table) -> pa_mod.Table:
        os.makedirs(out_dir, exist_ok=True)
        if batch.num_rows == 0:
            return pa_mod.table({"path": pa_mod.array([], pa_mod.string()),
                                 "n_rows": pa_mod.array([], pa_mod.int64())})
        idcol = next(c for c in ("point_id", "poly_id", "line_id")
                     if c in batch.column_names)
        first = str(batch.column(idcol)[0].as_py()).replace(os.sep, "_")
        p = os.path.join(out_dir, f"{prefix}-{first}.shp")
        write_shapefile(batch, p)
        return pa_mod.table({"path": pa_mod.array([p]),
                             "n_rows": pa_mod.array([batch.num_rows],
                                                    pa_mod.int64())})

    return ds.map_batches(write, batch_format="pyarrow")
