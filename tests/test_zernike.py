"""Zernike machinery: orthonormality, synthetic-mode recovery, and the
trace-level wavefront decomposition."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu.utils.zernike import (
    zernike, fit_zernike, noll_to_nm, zernike_table)


def _disc_grid(n=301):
    x, y = np.mgrid[-1:1:1j*n, -1:1:1j*n]
    inside = x**2 + y**2 <= 1
    return x[inside], y[inside]


def test_noll_indices():
    # classic table
    assert noll_to_nm(1) == (0, 0)
    assert noll_to_nm(4) == (2, 0)     # defocus
    assert noll_to_nm(11) == (4, 0)    # spherical
    assert noll_to_nm(7) == (3, -1)    # coma y
    assert noll_to_nm(8) == (3, 1)     # coma x


def test_orthonormality():
    x, y = _disc_grid()
    area = x.size
    for j in range(1, 12):
        zj = zernike(j, x, y)
        nptest.assert_allclose((zj*zj).sum()/area, 1., rtol=2e-2)
        for k in range(j + 1, 12):
            zk = zernike(k, x, y)
            nptest.assert_allclose((zj*zk).sum()/area, 0., atol=2e-2)


def test_fit_recovers_modes():
    rng = np.random.RandomState(0)
    x, y = _disc_grid(101)
    truth = np.zeros(11)
    truth[3] = .7    # defocus
    truth[10] = -.2  # spherical
    opd = sum(truth[j-1]*zernike(j, x, y) for j in range(1, 12))
    coeff, rms = fit_zernike(x, y, opd, nterms=11)
    nptest.assert_allclose(coeff, truth, atol=1e-10)
    assert rms < 1e-10
    lines = zernike_table(coeff)
    assert any("defocus" in ln for ln in lines)


def test_trace_zernike():
    import rayopt_tpu as ro
    from rayopt_tpu.models import cooke_triplet
    s = cooke_triplet()
    g = ro.GeometricTrace(s)
    g.rays_point((0, 0.), nrays=200, distribution="hexapolar",
                 filter=False)
    coeff, rms = g.zernike(nterms=15)
    assert np.isfinite(coeff).all()
    # on-axis: odd (tilt/coma-x/astig-45) terms vanish by symmetry
    nptest.assert_allclose(coeff[1], 0, atol=1e-6)   # tilt x
    nptest.assert_allclose(coeff[4], 0, atol=1e-6)   # astig 45
    # residual after 15 terms is small compared to the raw wavefront
    x, y, o = g.opd(resample=0)
    o = o[np.isfinite(o)]
    assert rms < max(o.std(), 1e-9)
