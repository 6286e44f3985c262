"""Property-based invariants (hypothesis) for the geometry/warp core.

These pin the engine's algebraic contracts independently of the fixture
values: center round-trips, window containment, supercover endpoints,
reduction conservation, popcount correctness.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rasters_ray.grids import GridSpec

_grids = st.builds(
    GridSpec,
    crs=st.just("EPSG:4326"),
    x_origin=st.floats(-170, 160),
    y_origin=st.floats(-70, 80),
    cell_width=st.floats(0.001, 0.5),
    cell_height=st.floats(-0.5, -0.001),
    rows=st.integers(1, 60),
    cols=st.integers(1, 60),
)


@settings(max_examples=60, deadline=None)
@given(_grids, st.integers(0, 59), st.integers(0, 59))
def test_index_point_center_round_trip(g, r, c):
    r = r % g.rows
    c = c % g.cols
    x = g.x_origin + (c + 0.5) * g.cell_width
    y = g.y_origin + (r + 0.5) * g.cell_height
    rr, cc = g.index_points(np.array([x]), np.array([y]))
    assert (int(rr[0]), int(cc[0])) == (r, c)


@settings(max_examples=40, deadline=None)
@given(_grids, st.data())
def test_window_contains_inbounds_points(g, data):
    xmin, ymin, xmax, ymax = g.bbox
    x0 = data.draw(st.floats(xmin, xmax))
    x1 = data.draw(st.floats(x0, xmax))
    y0 = data.draw(st.floats(ymin, ymax))
    y1 = data.draw(st.floats(y0, ymax))
    from rasters_ray.grids import OutOfBoundsError

    try:
        win = g.window((x0, y0, x1, y1))
    except OutOfBoundsError:
        return
    # every interior point of the box maps inside the (clamped) window
    for fx, fy in [(0.25, 0.25), (0.5, 0.5), (0.75, 0.75)]:
        px = x0 + (x1 - x0) * fx
        py = y0 + (y1 - y0) * fy
        r, c = g.index_points(np.array([px]), np.array([py]))
        if 0 <= r[0] < g.rows and 0 <= c[0] < g.cols:
            assert win.row_off <= r[0] < win.row_off + win.height
            assert win.col_off <= c[0] < win.col_off + win.width


@settings(max_examples=40, deadline=None)
@given(
    st.floats(0.2, 9.8), st.floats(0.2, 9.8), st.floats(0.2, 9.8), st.floats(0.2, 9.8)
)
def test_segment_cells_contains_endpoints(x1, y1, x2, y2):
    from rasters_ray.stages.pip import segment_cells

    g = GridSpec("EPSG:4326", 0.0, 10.0, 1.0, -1.0, 10, 10)
    rr, cc = segment_cells(g, x1, y1, x2, y2)
    cells = set(zip(rr.tolist(), cc.tolist()))
    for x, y in ((x1, y1), (x2, y2)):
        r = int(np.floor((y - 10.0) / -1.0))
        c = int(np.floor(x))
        assert (r, c) in cells


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 5), st.integers(1, 5), st.integers(0, 2**31))
def test_sum_reduction_conserves_total(fy, fx, seed):
    from rasters_ray.stages.resample import warp_array

    rng = np.random.default_rng(seed)
    rows, cols = 12 * fy, 10 * fx
    src = GridSpec("EPSG:4326", 0.0, 50.0, 0.01, -0.01, rows, cols)
    tgt = GridSpec("EPSG:4326", 0.0, 50.0, 0.01 * fx, -0.01 * fy, 12, 10)
    arr = rng.integers(0, 100, (rows, cols)).astype(np.float64)
    out = warp_array(arr, src, tgt, "sum")
    np.testing.assert_allclose(np.nansum(out), arr.sum())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
def test_popcount_matches_python(vals):
    from rasters_ray.text.dedup import _popcount64

    got = _popcount64(np.array(vals, dtype=np.uint64))
    want = [bin(v).count("1") for v in vals]
    assert got.tolist() == want


@settings(max_examples=20, deadline=None)
@given(st.text(max_size=400), st.text(max_size=400))
def test_shingle_jaccard_symmetric_bounded(a, b):
    from rasters_ray.text.dedup import char_shingles, jaccard

    ja = jaccard(char_shingles(a), char_shingles(b))
    jb = jaccard(char_shingles(b), char_shingles(a))
    assert ja == jb
    assert 0.0 <= ja <= 1.0
    assert jaccard(char_shingles(a), char_shingles(a)) == 1.0


# --- round-3 op kernels -----------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    rows=st.integers(2, 20),
    cols=st.integers(2, 20),
    radius=st.integers(1, 4),
    seed=st.integers(0, 10**6),
    nan_frac=st.floats(0.0, 0.4),
)
def test_box_filter_sum_matches_brute_force(rows, cols, radius, seed, nan_frac):
    from rasters_ray.stages.focal import box_filter_sum

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 251, (rows, cols)).astype(np.float64)
    a[rng.random(a.shape) < nan_frac] = np.nan
    fs, nn = box_filter_sum(a, radius)
    for i in (0, rows // 2, rows - 1):
        for j in (0, cols // 2, cols - 1):
            w = a[max(i - radius, 0) : i + radius + 1, max(j - radius, 0) : j + radius + 1]
            v = w[np.isfinite(w)]
            assert nn[i, j] == v.size
            assert fs[i, j] == v.sum()  # integral inputs: exact


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=64))
def test_hll_rho_equals_bit_length(words):
    from rasters_ray.relational.distinct import HLL_P, _rho

    bits = 64 - HLL_P
    w = np.array(words, dtype=np.uint64)
    got = _rho(w, bits)
    for wi, gi in zip(words, got):
        # leading zeros of the full 64-bit word, capped at `bits`
        clz = 64 - int(wi).bit_length() if wi else 64
        assert gi == min(clz + 1, bits + 1)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 200),
    n_keys=st.integers(1, 5),
    seed=st.integers(0, 10**6),
)
def test_int_sum_partial_matches_pandas(n, n_keys, seed):
    import pandas as pd
    import pyarrow as pa

    from rasters_ray.relational import int_sum_partial

    rng = np.random.default_rng(seed)
    keys = np.array(["k%d" % i for i in rng.integers(0, n_keys, n)], dtype=object)
    vals = rng.integers(-1000, 1000, n)
    t = pa.table({"g": pa.array(keys, pa.string()), "v": pa.array(vals, pa.int64())})
    out = int_sum_partial(
        t, ["g"], lambda b: {"s": b.column("v").to_numpy(zero_copy_only=False)}
    ).to_pandas()
    exp = (
        pd.DataFrame({"g": keys, "s": vals})
        .groupby("g")
        .agg(s=("s", "sum"), n=("s", "size"))
        .reset_index()
    )
    got = out.sort_values("g").reset_index(drop=True)
    exp = exp.sort_values("g").reset_index(drop=True)
    assert got["g"].tolist() == exp["g"].tolist()
    assert got["s"].tolist() == exp["s"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    q=st.integers(20, 95),
    seed=st.integers(0, 10**6),
    rgb=st.booleans(),
    ri=st.sampled_from([0, 3]),
)
def test_jpeg_roundtrip_properties(h, w, q, seed, rgb, ri):
    """Any size/content/quality: decode(encode(x)) has the input's shape,
    dtype uint8, and bounded error (quantization can't exceed the value
    range); restart intervals never change pixels."""
    from rasters_ray.codec import jpeg_codec as J

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    out = J.decode(J.encode(a, quality=q, restart_interval=ri))
    assert out.shape == shape and out.dtype == np.uint8
    if ri:
        np.testing.assert_array_equal(
            out, J.decode(J.encode(a, quality=q))
        )


@settings(max_examples=20, deadline=None)
@given(
    rank=st.integers(1, 3),
    dt=st.sampled_from(["<f4", "<f8", "<i2", "<i8", ">f4", ">i4", "<u1"]),
    seed=st.integers(0, 10**6),
    n_ds=st.integers(1, 4),
)
def test_hdf5_roundtrip_properties(tmp_path_factory, rank, dt, seed, n_ds):
    """write_hdf5 -> read_hdf5 is exact for any dtype/endianness/rank."""
    from rasters_ray.sources import hdf5lite

    rng = np.random.default_rng(seed)
    dims = tuple(int(d) for d in rng.integers(1, 6, rank))
    data = {}
    for i in range(n_ds):
        a = rng.integers(-100, 100, dims).astype(np.dtype(dt))
        data[f"ds{i}"] = a
    p = tmp_path_factory.mktemp("h5") / "t.h5"
    hdf5lite.write_hdf5(str(p), data)
    back = hdf5lite.read_hdf5(str(p))
    for k, v in data.items():
        np.testing.assert_array_equal(back[f"/{k}"], v)
