"""rasters_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``python-rasters/rasters`` (the reference, studied at /root/reference) as
streaming Ray Data pipelines over zero-copy Arrow batches:

- ``grids``    — affine grid / swath georeferencing math (RasterGrid /
  RasterGeolocation semantics: reference rasters/raster_grid.py,
  rasters/raster_geolocation.py), hierarchical cell keys (H3/S2-style
  covering tiles).
- ``proj``     — pure-numpy CRS transforms (WGS84 <-> UTM / AEQD) with the
  reference's transform_xy NaN-clipping semantics (rasters/transform_xy.py).
- ``codec``    — image encode/decode (npy raw, stdlib-zlib PNG), PSNR, and a
  deterministic synthetic image+caption table generator.
- ``stages``   — Ray Data operators: tiling, point->cell join, PIP actor
  pool, kNN resample actor pool, composites (merge/mosaic), elementwise.
- ``state``    — broadcastable indexes (STR R-tree, uniform grid kNN index).
- ``text``     — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard) and
  text analysis (langid, quality, tokens, fingerprints).
- ``ann``      — embedding similarity search (brute-force + LSH-bucketed).
- ``pipelines``— end-to-end flagship pipelines with per-partition
  checkpoint manifests.

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(bench.py, tests/conftest.py, or the driver).
"""

__version__ = "0.1.0"
