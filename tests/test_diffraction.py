"""Differentiable diffraction metrics (Strehl/PSF/MTF on device)."""

import numpy as np
from numpy import testing as nptest
import jax
import jax.numpy as jnp
import pytest

import rayopt_tpu as ro
from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.parallel.diffraction import (
    strehl_ratio, strehl_marechal, pupil_grid, psf_grid, mtf_radial)


@pytest.fixture(scope="module")
def setup():
    s = cooke_triplet()
    g = ro.GeometricTrace(s)
    g.rays_point((0, 0.), nrays=200, distribution="hexapolar",
                 clip=False, filter=False)
    g.refocus()
    tab = s.table(g.l)
    kw = dict(ref=g.ref, radius=-s.image.pupil.distance,
              wavelength=g.l, scale=s.scale, finite=s.object.finite)
    return s, g, tab, kw


def test_strehl_matches_host_phasor(setup):
    """The jnp Strehl equals the phasor sum over the host-computed
    OPD exactly (same rays, piston-removed)."""
    s, g, tab, kw = setup
    S = float(strehl_ratio(tab, jnp.asarray(g.y[0]),
                           jnp.asarray(g.u[0]), **kw))
    x, y, o = g.opd(resample=0)
    good = np.isfinite(o)
    o2 = o[good] - o[good].mean()
    # remove the tilt the jnp path removes
    A = np.stack([np.ones(good.sum()), x[good], y[good]], 1)
    o2 = o2 - A @ np.linalg.lstsq(A, o2, rcond=None)[0]
    S_host = abs(np.exp(-2j*np.pi*o2).mean())**2
    nptest.assert_allclose(S, S_host, rtol=1e-9)
    assert .5 < S < 1.


def test_strehl_orders_fields(setup):
    """Strehl decreases toward the aberrated field edge; the Marechal
    approximation tracks the exact value when the wavefront is good."""
    s, g, tab, kw = setup
    y0, u0 = jnp.asarray(g.y[0]), jnp.asarray(g.u[0])
    S0 = float(strehl_ratio(tab, y0, u0, **kw))
    Sm = float(strehl_marechal(tab, y0, u0, **kw))
    nptest.assert_allclose(Sm, S0, rtol=.05)
    g2 = ro.GeometricTrace(s)
    g2.rays_point((0, 1.), nrays=200, distribution="hexapolar",
                  clip=False, filter=False)
    S1 = float(strehl_ratio(tab, jnp.asarray(g2.y[0]),
                            jnp.asarray(g2.u[0]), **kw))
    assert S1 < S0


@pytest.mark.slow
def test_strehl_gradient(setup):
    s, g, tab, kw = setup
    y0, u0 = jnp.asarray(g.y[0]), jnp.asarray(g.u[0])

    def merit(curv):
        return strehl_ratio(tab.replace(curvature=curv), y0, u0, **kw)

    curv = jnp.asarray(tab.curvature)
    grad = jax.grad(merit)(curv)
    assert jnp.isfinite(grad).all()
    eps = 1e-9
    i = 2
    fd = (merit(curv.at[i].add(eps)) -
          merit(curv.at[i].add(-eps)))/(2*eps)
    nptest.assert_allclose(grad[i], fd, rtol=1e-3)


def test_psf_energy_and_peak(setup):
    s, g, tab, kw = setup
    y0, u0 = jnp.asarray(g.y[0]), jnp.asarray(g.u[0])
    p, q, psf = psf_grid(tab, y0, u0, ngrid=64, pad=2, **kw)
    psf = np.asarray(psf)
    nptest.assert_allclose(psf.sum(), 1., rtol=1e-6)
    # near-diffraction-limited: the peak sits at zero frequency offset
    peak = np.unravel_index(psf.argmax(), psf.shape)
    assert peak == (0, 0)


def test_mtf_normalized(setup):
    s, g, tab, kw = setup
    y0, u0 = jnp.asarray(g.y[0]), jnp.asarray(g.u[0])
    f, mx, my = mtf_radial(tab, y0, u0, ngrid=64, pad=2, **kw)
    mx, my = np.asarray(mx), np.asarray(my)
    nptest.assert_allclose(mx[0], 1., rtol=1e-9)
    assert (mx <= 1 + 1e-9).all() and (my <= 1 + 1e-9).all()


@pytest.mark.slow
def test_strehl_optimization_recovers_detuned_lens(setup):
    """Maximizing Strehl through jax.grad recovers a detuned surface
    (direct diffraction-merit optimization)."""
    import optax
    s, g, tab, kw = setup
    y0, u0 = jnp.asarray(g.y[0]), jnp.asarray(g.u[0])
    curv0 = jnp.asarray(tab.curvature)
    detuned = curv0.at[2].multiply(1.002)
    S_det = float(strehl_ratio(tab.replace(curvature=detuned),
                               y0, u0, **kw))
    S_ref = float(strehl_ratio(tab, y0, u0, **kw))
    assert S_det < S_ref - .01

    def loss(curv):
        return -strehl_ratio(tab.replace(curvature=curv), y0, u0, **kw)

    opt = optax.adam(1e-6)
    params = detuned
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(40):
        v, grad = vg(params)
        updates, state = opt.update(grad, state, params)
        params = optax.apply_updates(params, updates)
    S_opt = float(strehl_ratio(tab.replace(curvature=params),
                               y0, u0, **kw))
    assert S_opt > S_det + .005


def test_polychromatic_psf(setup):
    """Spectrally-weighted PSF over the system's three wavelengths on
    a common grid."""
    from rayopt_tpu.parallel.grad import bundles_from_system
    from rayopt_tpu.parallel.diffraction import psf_polychromatic
    s, g, tab, kw = setup
    bundles = bundles_from_system(s, fields=[0.], nrays=64,
                                  distribution="hexapolar")
    assert len(bundles) == 3  # three design wavelengths
    p, q, psf = psf_polychromatic(
        tab, bundles, ngrid=32, pad=2,
        radius=kw["radius"], scale=kw["scale"], finite=kw["finite"])
    psf = np.asarray(psf)
    nptest.assert_allclose(psf.sum(), 1., rtol=1e-6)
    assert np.isfinite(psf).all()
