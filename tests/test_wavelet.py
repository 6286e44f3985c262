"""Haar lifting: perfect-reconstruction identities and energy totals."""

import numpy as np

from rasters_ray.stages.wavelet import haar_energies, haar_level


def test_haar_level_reconstruction():
    rng = np.random.default_rng(5)
    z = rng.integers(0, 251, (12, 16)).astype(np.int64)
    ll, lh, hl, hh = haar_level(z)
    # invert the unnormalized transform: 4*p00 = ll + lh + hl + hh, etc.
    p00 = (ll + lh + hl + hh) // 4
    p01 = (ll - lh + hl - hh) // 4
    p10 = (ll + lh - hl - hh) // 4
    p11 = (ll - lh - hl + hh) // 4
    assert (p00 == z[0::2, 0::2]).all()
    assert (p01 == z[0::2, 1::2]).all()
    assert (p10 == z[1::2, 0::2]).all()
    assert (p11 == z[1::2, 1::2]).all()


def test_haar_parseval_unnormalized():
    # unnormalized Haar: sum of the four subband energies = 4 * energy
    rng = np.random.default_rng(6)
    z = rng.integers(0, 100, (20, 20)).astype(np.int64)
    ll, lh, hl, hh = haar_level(z)
    lhs = (ll * ll + lh * lh + hl * hl + hh * hh).sum()
    assert lhs == 4 * (z * z).sum()


def test_haar_energies_shape_and_constants():
    z = np.full((8, 8), 7, dtype=np.int64)
    rows = haar_energies(z, levels=2)
    d = {(lv, sb): e for lv, sb, e in rows}
    # constant image: all detail energies zero, ll2 = (16*7)^2 * 4 cells
    assert d[(1, "lh")] == d[(1, "hl")] == d[(1, "hh")] == 0
    assert d[(2, "lh")] == d[(2, "hl")] == d[(2, "hh")] == 0
    assert d[(2, "ll")] == (16 * 7) ** 2 * 4
    assert len(rows) == 7


def test_haar_odd_crop():
    z = np.arange(9 * 11, dtype=np.int64).reshape(9, 11)
    ll, lh, hl, hh = haar_level(z)
    assert ll.shape == (4, 5)
