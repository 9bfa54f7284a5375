"""Golden-system integration tests on the Cooke triplet
(mirrors reference test_raytrace.py: known design values, aiming
accuracy, rim-ray clipping, quadrature invariance)."""

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu import (
    system_from_yaml, system_to_yaml, ParaxialTrace, GeometricTrace)

COOKE = """
description: 'oslo cooke triplet example 50mm f/4 20deg'
wavelengths: [587.56e-9, 656.27e-9, 486.13e-9]
object: {angle_deg: 20, pupil: {radius: 6.25, aim: True}}
image: {type: finite, pupil: {radius: 0, update_radius: True}}
elements:
- {material: air}
- {roc: 21.25, distance: 5.0, material: SCHOTT-SK|N-SK16, radius: 6.5}
- {roc: -158.65, distance: 2.0, material: air, radius: 6.5}
- {roc: -20.25, distance: 6.0, material: SCHOTT-F|N-F2, radius: 5.0}
- {roc: 19.6, distance: 1.0, material: air, radius: 5.0}
- {material: air, radius: 4.75}
- {roc: 141.25, distance: 6.0, material: SCHOTT-SK|N-SK16, radius: 6.5}
- {roc: -17.285, distance: 2.0, material: air, radius: 6.5}
- {distance: 42.95, radius: 0.364}
stop: 5
pickups:
- {get: [1, radius], set: [2, radius]}
- {get: [3, radius], set: [4, radius]}
- {get: [6, radius], set: [7, radius]}
validators:
- {get: [edge_y, 2], minimum: .5}
- {get: [2, distance], minimum: .5}
- {get: [edge_y, 4], minimum: .5}
- {get: [4, distance], minimum: .5}
- {get: [edge_y, 7], minimum: .5}
- {get: [7, distance], minimum: .5}
"""


@pytest.fixture(scope="module")
def cooke():
    s = system_from_yaml(COOKE)
    s.update()
    s.paraxial.refocus()
    s.update()
    return s


def test_structure(cooke):
    s = cooke
    assert not s.object.finite
    for i, el in enumerate(s):
        if i not in (0,):
            assert el.radius > 0
        if i not in (0, s.stop):
            assert el.distance > 0
        if i not in (0, s.stop, len(s) - 1):
            assert abs(el.curvature) > 0
        if i not in (len(s) - 1,):
            assert el.material is not None
    assert len(str(s).splitlines()) > 10
    assert s.aperture is s[s.stop]


def test_reverse(cooke):
    s = system_from_yaml(COOKE)
    s.update()
    s.reverse()
    s.reverse()
    s.update()
    assert not s.object.finite


def test_rescale():
    s = system_from_yaml(COOKE)
    s.update()
    dists = [el.distance for el in s]
    s.rescale(123)
    nptest.assert_allclose([el.distance/123 for el in s], dists)
    s.rescale()
    nptest.assert_allclose([el.distance for el in s], dists)


def test_funcs(cooke):
    s = cooke
    s.resize_convex()
    list(s.surfaces_cut(axis=1, points=11))
    list(s.paraxial_matrices(s.wavelengths[0], start=1, stop=None))
    s.paraxial_matrix(s.wavelengths[0], start=1, stop=None)
    s.track
    s.origins
    s.mirrored
    s.edge_y


def test_paraxial(cooke):
    s = cooke
    p = s.paraxial
    nptest.assert_allclose(p.u[0, 0], 0)
    nptest.assert_allclose(p.u[0, 1], p.n[0]*np.tan(s.object.angle))
    nptest.assert_allclose(p.y[s.stop, 0], s[s.stop].radius, rtol=1e-2)
    nptest.assert_allclose(p.y[s.stop, 1], 0, atol=1e-9)
    nptest.assert_allclose(p.working_f_number[1],
                           -s.image.pupil.fno, rtol=1e-2)
    nptest.assert_allclose(p.working_f_number[1], 4, rtol=1e-2)
    nptest.assert_allclose(p.focal_length[1], 50, rtol=5e-3)
    nptest.assert_allclose(p.magnification[0], 0, atol=1e-3)
    nptest.assert_allclose(p.numerical_aperture[1], .124, rtol=5e-3)
    p.update_conjugates()
    system_to_yaml(s)
    str(p)


def test_aim_clipping(cooke):
    s = cooke
    g = GeometricTrace(s)
    r = np.array([el.radius for el in s[1:-1]])
    g.rays_clipping((0, 1.))
    # rays from an infinite object share the direction
    nptest.assert_allclose(g.u[0, :, :], g.u[0, (0,)*g.u.shape[1], :])
    # the chief ray hits the stop center
    nptest.assert_allclose(g.y[s.stop, 0, 1], 0, atol=5e-3)
    # the rim rays touch the vignetting apertures
    nptest.assert_allclose(min(g.y[1:-1, 1, 1] + r), 0, atol=1e-3)
    nptest.assert_allclose(max(g.y[1:-1, 2, 1] - r), 0, atol=1e-3)


def test_aim_point(cooke):
    s = cooke
    g = GeometricTrace(s)
    i = s.stop
    g.rays_point((0, 1.), distribution="cross", nrays=5, filter=False)
    nptest.assert_allclose(g.u[0, :, :], g.u[0, (0,)*g.u.shape[1], :])
    nptest.assert_allclose(g.y[i, :3, 1]/s[i].radius, [-1, 0, 1],
                           atol=1e-3, rtol=3e-2)
    nptest.assert_allclose(g.y[i, :, 0]/s[i].radius,
                           [0, 0, 0, -1, 0, 1], atol=1e-1)
    g.rays_line((0, 1.))


def test_pupil_cache(cooke):
    s = cooke
    for y in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
              (.1, .1), (-.2, .5)]:
        z, p = s.pupil(y)
        assert np.isfinite(z)
        assert np.isfinite(p).all()


def test_quadrature_golden(cooke):
    """Radau-13 weighted RMS equals the golden 0.052 and matches a
    500-ray square grid within 5% (reference test_raytrace.py:189)."""
    s = cooke
    g = GeometricTrace(s)
    g.rays_point((0, 1.), nrays=13, distribution="radau", filter=False)
    a = g.rms()
    nptest.assert_allclose(a, .052, rtol=1e-2)
    g.rays_point((0, 1.), nrays=500, distribution="square",
                 clip=False, filter=True)
    b = g.rms()
    nptest.assert_allclose(a, b, rtol=5e-2)


def test_trace_final_matches_history(cooke):
    """trace_rays_final (throughput path) agrees with the full-history
    engine."""
    from rayopt_tpu.ops.geometric import trace_rays, trace_rays_final
    s = cooke
    tab = s.table()
    rng = np.random.RandomState(0)
    n = 64
    y = np.zeros((n, 3))
    y[:, 1] = rng.uniform(-1, 1, n)
    u = np.zeros((n, 3))
    u[:, 1] = rng.uniform(-.05, .05, n)
    u[:, 2] = np.sqrt(1 - u[:, 1]**2)
    ys, us, iis, ts = map(np.asarray, trace_rays(tab, y, u))
    yf, uf, tf = map(np.asarray, trace_rays_final(tab, y, u))
    nptest.assert_allclose(yf, ys[-1], atol=1e-12)
    nptest.assert_allclose(uf, us[-1], atol=1e-12)
    nptest.assert_allclose(tf, ts.sum(0), atol=1e-12)


def test_refocus(cooke):
    g = GeometricTrace(cooke)
    g.rays_point((0, 0.), nrays=13, distribution="radau",
                 clip=False, filter=False)
    before = g.rms()
    g.refocus()
    assert g.rms() <= before + 1e-9


def test_opd_psf(cooke):
    g = GeometricTrace(cooke)
    g.rays_point((0, 1.), nrays=200, distribution="hexapolar",
                 clip=True)
    x, y, o = g.opd()
    og = o[np.isfinite(o)]
    assert og.size
    assert np.fabs(og).max() < 50
    p, q, psf = g.psf()
    assert np.isfinite(psf).all()
    nptest.assert_allclose(psf.sum(), 1, rtol=.05)


def test_filtered_weights_stay_aligned(cooke):
    """Pupil filtering drops rays outside the vignetted aperture box;
    the quadrature weights and the reference index must be filtered
    alongside (the reference left them misaligned and rms() crashed
    for weighted distributions at vignetted fields)."""
    g = GeometricTrace(cooke)
    g.rays_point((0, 1.), nrays=13, distribution="radau")  # filter on
    assert g.w.shape[0] == g.nrays
    nptest.assert_allclose(g.w.sum(), 1.)
    assert 0 <= g.ref < g.nrays
    r = g.rms()
    assert np.isfinite(r) and 0 < r < 1


def test_rays_line_unaimed_fallback():
    """rays_line works on systems without pupil aiming (host path)."""
    from rayopt_tpu.models import doublet
    s = doublet()
    g = GeometricTrace(s)
    g.rays_line((0., 1.), nrays=5)
    assert g.y.shape[1] == 15
    assert np.isfinite(g.y[-1]).all()


def test_afocal_beam_expander():
    """Afocal (infinite image conjugate) support: the keplerian 2x
    expander solves to an exactly-zero exit marginal slope, doubles
    the beam, and reports its quality in angle space (reference
    TODO.rst afocal conjugates -- absent upstream)."""
    import rayopt_tpu as ro
    from rayopt_tpu.models import beam_expander
    s = beam_expander()
    # the separation solve drives the system exactly afocal
    assert abs(s.paraxial.u[-2, 0]) < 1e-12
    # 2x expander: angular magnification -1/2, beam diameter doubles
    nptest.assert_allclose(s.paraxial.magnification[1], -.5,
                           rtol=1e-6)
    nptest.assert_allclose(s.paraxial.y[-2, 0]/s.paraxial.y[0, 0],
                           -2., rtol=1e-2)
    g = ro.GeometricTrace(s)
    g.rays_point((0, 0.), nrays=13, distribution="radau",
                 filter=False)
    a = g.angular_rms()
    assert 0 < a < 1e-3  # singlet spherical, sub-mrad collimation
    # serialization round trip keeps the infinite image conjugate
    s2 = ro.system_from_yaml(ro.system_to_yaml(s))
    s2.update()
    assert not s2.image.finite
    nptest.assert_allclose(s2.paraxial.magnification[1], -.5,
                           rtol=1e-6)
