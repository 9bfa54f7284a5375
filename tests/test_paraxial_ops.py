"""Cross-engine parity: the jnp ABCD engine (ops.paraxial) must match
the host ParaxialTrace exactly, and be differentiable."""

import numpy as np
from numpy import testing as nptest
import jax
import jax.numpy as jnp
import pytest

from rayopt_tpu.models import cooke_triplet, double_gauss, \
    parabolic_mirror
from rayopt_tpu.ops import paraxial as P


@pytest.mark.parametrize("build", [cooke_triplet, double_gauss,
                                   parabolic_mirror])
def test_trace_matches_host(build):
    s = build()
    tab = s.table()
    host = s.paraxial
    y, u = P.paraxial_trace(tab, jnp.asarray(host.y[0]),
                            jnp.asarray(host.u[0]))
    nptest.assert_allclose(np.asarray(y), host.y, rtol=1e-12,
                           atol=1e-12)
    nptest.assert_allclose(np.asarray(u), host.u, rtol=1e-12,
                           atol=1e-12)


@pytest.mark.parametrize("build", [cooke_triplet, double_gauss])
def test_first_order_matches_host(build):
    s = build()
    tab = s.table()
    host = s.paraxial
    fo = P.first_order(tab, jnp.asarray(host.y[0]),
                       jnp.asarray(host.u[0]))
    nptest.assert_allclose(np.asarray(fo["lagrange"]), host.lagrange,
                           rtol=1e-12)
    nptest.assert_allclose(np.asarray(fo["focal_length"]),
                           host.focal_length, rtol=1e-12)
    nptest.assert_allclose(np.asarray(fo["focal_distance"]),
                           host.focal_distance, rtol=1e-12)
    nptest.assert_allclose(np.asarray(fo["pupil_distance"]),
                           host.pupil_distance, rtol=1e-12)
    nptest.assert_allclose(np.asarray(fo["pupil_height"]),
                           host.pupil_height, rtol=1e-10)


def test_abcd_product_matches_host():
    s = cooke_triplet()
    tab = s.table()
    n, m_host = s.paraxial_matrix(s.wavelengths[0])
    m = P.abcd_product(tab)
    nptest.assert_allclose(np.asarray(m), m_host, rtol=1e-12,
                           atol=1e-12)


def test_refocus_solve_matches():
    s = cooke_triplet()
    tab = s.table()
    host = s.paraxial
    d = float(P.paraxial_solve_image(
        tab, jnp.asarray(host.y[0]), jnp.asarray(host.u[0])))
    s.paraxial.refocus()
    nptest.assert_allclose(d, s[-1].distance, rtol=1e-12)


def test_first_order_differentiable():
    s = cooke_triplet()
    tab = s.table()
    host = s.paraxial
    y0 = jnp.asarray(host.y[0])
    u0 = jnp.asarray(host.u[0])

    def efl(curv):
        return P.first_order(tab.replace(curvature=curv),
                             y0, u0)["focal_length"][1]

    curv = jnp.asarray(tab.curvature)
    g = jax.grad(efl)(curv)
    eps = 1e-7
    i = 1
    fd = (efl(curv.at[i].add(eps)) - efl(curv.at[i].add(-eps)))/(2*eps)
    nptest.assert_allclose(g[i], fd, rtol=1e-5)


def test_abcd_anamorphic_per_axis_power():
    """The jnp ABCD twin reads curvature + curvature_dx for the
    sagittal slot, matching the host Biconic per-axis matrices: a
    y-cylinder has zero sagittal power."""
    import numpy as np
    import jax
    from rayopt_tpu.models import anamorphic_pair
    from rayopt_tpu.ops.paraxial import abcd_matrices
    s = anamorphic_pair()
    tab = s.table()
    m = np.asarray(abcd_matrices(tab))
    n0 = s.refractive_index(s.wavelengths[0], 0)
    for j, e in enumerate(s):
        if j == 0:
            continue
        n0, mh = e.paraxial_matrix(n0, s.wavelengths[0])
        np.testing.assert_allclose(m[j], mh, rtol=1e-9, atol=1e-12,
                                   err_msg=str(j))
    # the y-cylinder front row: sagittal power strictly zero,
    # tangential nonzero
    assert m[1][2, 0] == 0. and m[1][3, 1] != 0.
