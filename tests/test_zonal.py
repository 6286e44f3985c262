

def test_crosstab_bruteforce():
    import numpy as np

    from rasters_ray.stages.zonal import crosstab

    rng = np.random.default_rng(17)
    z = rng.integers(0, 5, (9, 11))
    c = rng.integers(0, 7, (9, 11))
    t = crosstab(z, c).to_pydict()
    got = {(zz, kk): nn for zz, kk, nn
           in zip(t["zone"], t["klass"], t["n_px"])}
    exp = {}
    for i in range(9):
        for j in range(11):
            exp[(z[i, j], c[i, j])] = exp.get((z[i, j], c[i, j]), 0) + 1
    assert got == exp
    # sorted by (zone, class)
    pairs = list(zip(t["zone"], t["klass"]))
    assert pairs == sorted(pairs)


def test_crosstab_errors():
    import numpy as np
    import pytest

    from rasters_ray.stages.zonal import crosstab

    with pytest.raises(ValueError):
        crosstab(np.zeros((2, 2), int), np.zeros((3, 2), int))
    with pytest.raises(ValueError):
        crosstab(np.array([[-1]]), np.array([[0]]))


def test_crosstab_images_distributed(ray_session):
    import numpy as np

    from rasters_ray.sources.images import make_oracle_images, oracle_pixels
    from rasters_ray.stages import crosstab_images

    import ray.data as rd

    ids = np.arange(6)
    ds = rd.from_arrow(make_oracle_images(ids))

    def classify(arr):
        v = np.rint(arr).astype(np.int64)
        return v // 51, v % 7

    got = crosstab_images(ds, classify).to_pandas()
    got = got.sort_values(["zone", "klass"]).reset_index(drop=True)

    exp = {}
    for d in ids:
        v = oracle_pixels(int(d)).astype(np.int64)
        for z, k in zip((v // 51).ravel(), (v % 7).ravel()):
            exp[(z, k)] = exp.get((z, k), 0) + 1
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        assert exp[(row["zone"], row["klass"])] == row["n_px"]
