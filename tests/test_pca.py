"""Distributed PCA vs single-machine numpy PCA (block-layout independent)."""

import numpy as np
import pyarrow as pa

from rasters_ray.ann.pca import fit_pca, pca_project


def _make_ds(x: np.ndarray, n_blocks: int):
    import ray.data as rd

    tab = pa.table(
        {
            "vec_id": np.arange(len(x), dtype=np.int64),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x], pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(tab).random_shuffle(seed=3).repartition(n_blocks)


def _numpy_pca(x: np.ndarray, k: int):
    mu = x.mean(axis=0)
    cov = np.cov(x.T, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return comps, evals[order], mu


def test_fit_pca_matches_numpy(ray_session):
    rng = np.random.default_rng(8)
    # anisotropic cloud: a few dominant directions
    basis = rng.normal(size=(6, 16))
    x = rng.normal(size=(2000, 6)) * np.array([10, 6, 3, 1, 0.5, 0.2]) @ basis
    x = x.astype(np.float32).astype(np.float64)
    ds = _make_ds(x, 7)
    comps, evals, mu, n = fit_pca(ds, 3)
    ref_comps, ref_evals, ref_mu = _numpy_pca(x, 3)
    assert n == 2000
    np.testing.assert_allclose(mu, ref_mu, rtol=0, atol=1e-9)
    np.testing.assert_allclose(evals, ref_evals, rtol=1e-9)
    np.testing.assert_allclose(comps, ref_comps, rtol=0, atol=1e-7)


def test_pca_project_variance_and_reconstruction(ray_session):
    rng = np.random.default_rng(4)
    basis = rng.normal(size=(4, 12))
    x = (rng.normal(size=(1500, 4)) * np.array([8, 4, 2, 0.1])) @ basis
    x += rng.normal(scale=0.01, size=x.shape)
    x = x.astype(np.float32).astype(np.float64)
    ds = _make_ds(x, 5)
    proj_ds, evals = pca_project(ds, n_components=4)
    df = proj_ds.to_pandas().sort_values("vec_id")
    p = np.stack(df["proj"].to_numpy())
    assert p.shape == (1500, 4)
    # variance captured by 4 components ~ total variance (rank-4 + tiny noise)
    total_var = np.var(x, axis=0, ddof=1).sum()
    assert evals.sum() / total_var > 0.999
    # projection reproduces the data: reconstruction error is noise-level
    comps, _, mu, _ = fit_pca(ds, 4)
    recon = p @ comps + mu
    err = np.sqrt(np.mean((recon - x) ** 2))
    assert err < 0.05
