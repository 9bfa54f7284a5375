"""The jittable polynomial trace must match the host PolyTrace, and
aberration coefficients must be differentiable."""

import numpy as np
from numpy import testing as nptest
import jax
import jax.numpy as jnp
import pytest

from rayopt_tpu import system_from_yaml, PolyTrace
from rayopt_tpu.ops.poly_jax import poly_trace_table
from rayopt_tpu.ops.kernels import specialize
from tests.test_poly import DOUBLET


@pytest.fixture(scope="module")
def doublet():
    return system_from_yaml(DOUBLET)


def test_matches_host(doublet):
    s = doublet
    kmax = 5
    host = PolyTrace(s, kmax)
    tab = s.table(s.wavelengths[0])
    specs = specialize(tab)
    stvwof, n = poly_trace_table(
        tab, specs, kmax, s.object.pupil.distance,
        telecentric=host.telecentric())
    nptest.assert_allclose(np.asarray(stvwof), host.stvwof,
                           rtol=1e-9, atol=1e-12)
    nptest.assert_allclose(np.asarray(n), host.n, rtol=1e-12)


@pytest.mark.slow
def test_jit_and_grad(doublet):
    s = doublet
    kmax = 3
    tab = s.table(s.wavelengths[0])
    specs = specialize(tab)
    pd = s.object.pupil.distance

    @jax.jit
    def spherical(curv):
        stvwof, n = poly_trace_table(tab.replace(curvature=curv),
                                     specs, kmax, pd)
        return stvwof[-1, 0, 1]  # s1-like leading s coefficient

    curv = jnp.asarray(tab.curvature)
    v = float(spherical(curv))
    assert np.isfinite(v)
    g = jax.grad(spherical)(curv)
    eps = 1e-6
    i = 1
    fd = (spherical(curv.at[i].add(eps)) -
          spherical(curv.at[i].add(-eps)))/(2*eps)
    nptest.assert_allclose(g[i], fd, rtol=1e-4)


@pytest.mark.slow
def test_grad_wrt_distance(doublet):
    s = doublet
    kmax = 3
    tab = s.table(s.wavelengths[0])
    specs = specialize(tab)
    pd = s.object.pupil.distance

    def coeff(off):
        stvwof, n = poly_trace_table(tab.replace(offset=off),
                                     specs, kmax, pd)
        return stvwof[-1, 1, 1]

    off = jnp.asarray(tab.offset)
    g = jax.grad(coeff)(off)
    eps = 1e-6
    fd = (coeff(off.at[2, 2].add(eps)) -
          coeff(off.at[2, 2].add(-eps)))/(2*eps)
    nptest.assert_allclose(g[2, 2], fd, rtol=1e-4, atol=1e-12)
