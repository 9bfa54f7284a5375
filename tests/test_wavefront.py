"""Differentiable wavefront merit: the jnp OPD matches
GeometricTrace.opd ray-for-ray, and grads flow."""

import pytest
import numpy as np
from numpy import testing as nptest
import jax
import jax.numpy as jnp

import rayopt_tpu as ro
from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.parallel.grad import opd_rays, wavefront_rms


def _setup(field=0.):
    s = cooke_triplet()
    g = ro.GeometricTrace(s)
    g.rays_point((0, field), nrays=50, distribution="hexapolar",
                 filter=False)
    return s, g


@pytest.mark.slow
def test_opd_matches_host():
    s, g = _setup(0.)
    x, y, t_host = g.opd(resample=0)
    tab = s.table(g.l)
    radius = -s.image.pupil.distance
    t_jax = opd_rays(tab, jnp.asarray(g.y[0]), jnp.asarray(g.u[0]),
                     ref=g.ref, radius=radius, wavelength=g.l,
                     scale=s.scale, finite=s.object.finite)
    good = np.isfinite(t_host)
    nptest.assert_allclose(np.asarray(t_jax)[good], t_host[good],
                           rtol=1e-9, atol=1e-9)


def test_opd_matches_host_off_axis():
    s, g = _setup(.7)
    x, y, t_host = g.opd(resample=0)
    tab = s.table(g.l)
    radius = -s.image.pupil.distance
    t_jax = opd_rays(tab, jnp.asarray(g.y[0]), jnp.asarray(g.u[0]),
                     ref=g.ref, radius=radius, wavelength=g.l,
                     scale=s.scale, finite=s.object.finite)
    good = np.isfinite(t_host)
    nptest.assert_allclose(np.asarray(t_jax)[good], t_host[good],
                           rtol=1e-9, atol=1e-9)


def test_opd_matches_host_tilted_image():
    """opd_rays handles rotated end geometry exactly (previously it
    silently assumed a straight image frame)."""
    s, g = _setup(0.)
    s[-1].angles = (.05, .02, 0.)   # tilt the image surface
    s[-2].angles = (.03, 0., 0.)    # and the exit surface
    g = ro.GeometricTrace(s)
    g.rays_point((0, .5), nrays=40, distribution="hexapolar",
                 filter=False)
    x, y, t_host = g.opd(resample=0)
    tab = s.table(g.l)
    radius = -s.image.pupil.distance
    t_jax = opd_rays(tab, jnp.asarray(g.y[0]), jnp.asarray(g.u[0]),
                     ref=g.ref, radius=radius, wavelength=g.l,
                     scale=s.scale, finite=s.object.finite)
    good = np.isfinite(t_host)
    assert good.sum() > 10
    nptest.assert_allclose(np.asarray(t_jax)[good], t_host[good],
                           rtol=1e-9, atol=1e-9)


@pytest.mark.slow
def test_wavefront_grad():
    s, g = _setup(0.)
    tab = s.table(g.l)
    radius = -s.image.pupil.distance
    y0 = jnp.asarray(g.y[0])
    u0 = jnp.asarray(g.u[0])

    def merit(curv):
        return wavefront_rms(tab.replace(curvature=curv), y0, u0,
                             radius=radius, wavelength=g.l,
                             scale=s.scale, finite=s.object.finite)

    curv = jnp.asarray(tab.curvature)
    v = float(merit(curv))
    assert np.isfinite(v) and v < 10
    grad = jax.grad(merit)(curv)
    eps = 1e-8
    i = 1
    fd = (merit(curv.at[i].add(eps)) -
          merit(curv.at[i].add(-eps)))/(2*eps)
    nptest.assert_allclose(grad[i], fd, rtol=1e-4)


def test_opd_rays_extended_vocabulary():
    """The differentiable OPD path must see the DOE kick: the
    wavefront of a kinoform lens differs from its bare substrate."""
    import numpy as np
    import rayopt_tpu as ro
    from rayopt_tpu.parallel.grad import opd_rays
    lam = 550e-9
    a1 = -np.pi/((lam/1e-3)*100.)
    s = ro.System([
        dict(material="air"),
        dict(type="binary2", phase_coefficients=[a1], norm_radius=1.,
             distance=5., material="air", radius=10.),
        dict(distance=100., radius=10.),
    ], wavelengths=[lam], object=dict(
        angle_deg=0., pupil=dict(radius=3., update_radius=False)))
    s.update()
    tab = s.table()
    n = 16
    y0 = np.zeros((n, 3))
    y0[:, 1] = np.linspace(0., 2.5, n)
    u0 = np.zeros((n, 3))
    u0[:, 2] = 1.
    o_doe = np.asarray(opd_rays(tab, y0, u0, radius=-100.,
                                wavelength=lam, biconic=True))
    o_bare = np.asarray(opd_rays(tab, y0, u0, radius=-100.,
                                 wavelength=lam))
    # focused wavefront: small residual; bare plane: huge defocus OPD
    assert np.nanmax(np.abs(o_doe - o_doe[0])) < 2.
    assert np.nanmax(np.abs(o_bare - o_bare[0])) > 5.
