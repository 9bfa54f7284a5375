"""Anamorphic (biconic/cylindrical) surfaces: sag/normal oracles,
engine parity, cylinder-lens physics, per-axis paraxial power, and
the loud rejections in the symmetric-only engines."""

import numpy as np
from numpy import testing as nptest
import pytest

import jax.numpy as jnp

import rayopt_tpu as ro
from rayopt_tpu.ops import kernels as K
from rayopt_tpu.ops.tables import is_anamorphic


def _cyl_system(radius_y=25.84, cx=0., distance=47.):
    s = ro.System([
        dict(material="air"),
        dict(type="biconic", roc=radius_y, curvature_x=cx,
             distance=5., material="SCHOTT-BK|N-BK7", radius=10.),
        dict(type="biconic", distance=3., material="air", radius=10.),
        dict(distance=distance, radius=10.),
    ])
    s.object.pupil.radius = 4.
    s.object.pupil.update_radius = False
    s.update()
    return s


def test_biconic_sag_normal_oracle():
    """normal_biconic equals the numerical gradient of sag_biconic."""
    rng = np.random.default_rng(3)
    cx, kx, cy, ky = .021, -.6, -.034, .4
    asp = np.array([1e-5, -2e-8])
    pts = rng.uniform(-4, 4, (20, 2))
    eps = 1e-6
    for x, y in pts:
        gx, gy = (float(np.asarray(v)) for v in K.normal_biconic(
            x, y, cx, kx, cy, ky, asp))

        def sag(xx, yy):
            return float(np.asarray(K.sag_biconic(
                xx, yy, 0., cx, kx, cy, ky, asp)))

        fx = (sag(x + eps, y) - sag(x - eps, y))/(2*eps)
        fy = (sag(x, y + eps) - sag(x, y - eps))/(2*eps)
        nptest.assert_allclose(gx, fx, rtol=1e-6, atol=1e-9)
        nptest.assert_allclose(gy, fy, rtol=1e-6, atol=1e-9)


def test_biconic_reduces_to_conic():
    """cx == cy, kx == ky reproduces the symmetric kernels exactly."""
    c, k = .03, -.8
    asp = np.zeros(0)
    x = np.linspace(-5, 5, 11)
    y = np.linspace(-4, 4, 11)
    z = np.zeros(11)
    sym = np.asarray(K.sag(x, y, z, c, k, asp))
    bic = np.asarray(K.sag_biconic(x, y, z, c, k, c, k, asp))
    nptest.assert_allclose(bic, sym, rtol=0, atol=1e-14)
    e = np.asarray(K.normal_radial(x, y, c, k, asp))
    gx, gy = (np.asarray(v) for v in K.normal_biconic(
        x, y, c, k, c, k, asp))
    nptest.assert_allclose(gx, x*e, rtol=1e-12, atol=1e-14)
    nptest.assert_allclose(gy, y*e, rtol=1e-12, atol=1e-14)


def test_spheroid_biconic_trace_parity():
    """A Biconic with equal axes traces like the Spheroid system."""
    from rayopt_tpu.models import doublet
    s1 = doublet()
    s2 = doublet()
    for j in (1, 2, 3):
        el = s2[j]
        bic = ro.Biconic(
            curvature=el.curvature, conic=el.conic,
            curvature_x=el.curvature, conic_x=el.conic,
            distance=el.distance, material=el.material,
            radius=el.radius)
        s2[j] = bic
    s2.update()
    assert not is_anamorphic(s2.table())  # equal axes: symmetric
    g1, g2 = ro.GeometricTrace(s1), ro.GeometricTrace(s2)
    for g in (g1, g2):
        g.rays_point((0, 1.), nrays=13, distribution="radau",
                     filter=False)
    nptest.assert_allclose(g2.y[-1], g1.y[-1], rtol=1e-12, atol=1e-12)


def test_cylinder_lens_focuses_one_axis():
    """A y-cylinder focuses y and leaves x collimated; the engine and
    the thin-lens focal length agree."""
    s = _cyl_system()
    g = ro.GeometricTrace(s)
    m = 9
    y0 = np.zeros((m, 3))
    y0[:, 0] = np.tile([-3., 0., 3.], 3)
    y0[:, 1] = np.repeat([-3., 0., 3.], 3)
    u0 = np.tile([0., 0., 1.], (m, 1))
    g.rays_given(y0, u0)
    g.propagate()
    # x is untouched to machine precision
    nptest.assert_allclose(g.y[-1][:, 0], y0[:, 0], rtol=0, atol=1e-9)
    # y converges: residual blur far below the 3 mm aperture
    assert np.all(np.abs(g.y[-1][:, 1]) < .1)
    # paraxial: x block is pure free propagation, y block has power
    n, mat = s.paraxial_matrix(s.wavelengths[0])
    nptest.assert_allclose(mat[2, 0], 0., atol=1e-12)   # no x power
    assert mat[3, 1] < -.015                            # y power
    f_y = -1./mat[3, 1]
    nptest.assert_allclose(f_y, 50., rtol=.02)


def test_engine_parity_scan_vs_specs():
    """The dynamic-scan biconic path and the specialized unrolled
    path agree on an anamorphic system."""
    from rayopt_tpu.ops.geometric import trace_rays
    from rayopt_tpu.ops.kernels import specialize
    s = _cyl_system(cx=.01)
    tab = s.table()
    assert is_anamorphic(tab)
    rng = np.random.default_rng(5)
    y0 = np.zeros((16, 3))
    y0[:, :2] = rng.uniform(-3, 3, (16, 2))
    u0 = np.tile([0., 0., 1.], (16, 1))
    u0[:, :2] = rng.uniform(-.05, .05, (16, 2))
    u0 /= np.linalg.norm(u0, axis=1, keepdims=True)
    a = trace_rays(tab, y0, u0, biconic=True)
    b = trace_rays(tab, y0, u0, specs=specialize(tab), unroll=True)
    for va, vb in zip(a, b):
        nptest.assert_allclose(np.asarray(vb), np.asarray(va),
                               rtol=1e-10, atol=1e-10)


def test_gaussian_beam_goes_simple_astigmatic():
    """A stigmatic beam through a cylinder lens leaves with distinct
    x/y waists (simple astigmatism, no axis coupling)."""
    s = _cyl_system()
    t = ro.GaussianTrace(s)
    qi = np.diag(t.qi[-1])
    assert abs(t.qi[-1][0, 1]) < 1e-12
    assert abs(qi[0] - qi[1]) > 1e-4  # per-axis q split
    wr = t.waist_radius[-1]
    assert abs(wr[0] - wr[1]) > 1e-3


def test_biconic_yaml_round_trip():
    s = _cyl_system(cx=.004)
    s2 = ro.system_from_yaml(ro.system_to_yaml(s))
    s2.update()
    assert isinstance(s2[1], ro.Biconic)
    nptest.assert_allclose(s2[1].curvature_x, .004)
    t1, t2 = s.table(), s2.table()
    nptest.assert_allclose(np.asarray(t2.curvature_dx),
                           np.asarray(t1.curvature_dx))
    g1, g2 = ro.GeometricTrace(s), ro.GeometricTrace(s2)
    y0 = np.array([[0., 2., 0.], [1.5, -1., 0.]])
    u0 = np.tile([0., 0., 1.], (2, 1))
    for g in (g1, g2):
        g.rays_given(y0, u0)
        g.propagate()
    nptest.assert_allclose(g2.y[-1], g1.y[-1], rtol=1e-12)


def _df32_parity(tab, rim=3., slope=.02, n=256, atol=1e-10):
    """Eager df32 trace matches the f64 anamorphic engine (the
    parity-grade pin of the extended vocabulary)."""
    from rayopt_tpu.ops import df32
    from rayopt_tpu.ops.geometric import trace_rays_final
    rng = np.random.default_rng(7)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*rim
    u = np.zeros((n, 3))
    u[:, :2] = rng.uniform(-1, 1, (n, 2))*slope
    u[:, 2] = np.sqrt(1 - (u[:, :2]**2).sum(1))
    yf = np.asarray(trace_rays_final(tab, y, u,
                                     biconic=is_anamorphic(tab))[0])
    for fast in (False, True):
        steps = df32.plan(tab, fast=fast)
        out = df32.trace_df32_final(steps, df32.state_from_f64(y, u))
        xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
        good = np.isfinite(yf[:, 0])
        assert good.sum() > n//2
        nptest.assert_allclose(np.isnan(xd), ~good)
        nptest.assert_allclose(xd[good], yf[good, 0], atol=atol)
        nptest.assert_allclose(yd[good], yf[good, 1], atol=atol)


def test_df32_supports_cylinders_poly_still_rejects():
    """The df32 parity engine covers anamorphic rows (closed-form
    conic cylinders); the polynomial trace still rejects them."""
    s = _cyl_system()
    tab = s.table()
    _df32_parity(tab)
    from rayopt_tpu.ops.poly_jax import poly_trace_table
    with pytest.raises(NotImplementedError):
        poly_trace_table(tab, None, 3, 10.)
    with pytest.raises(NotImplementedError):
        ro.PolyTrace(s, 3)


def test_df32_supports_general_biconic():
    """Non-cylinder biconic rows (both axes curved, split conics) run
    the mixed-precision Newton path at full parity."""
    s = _cyl_system(cx=.013)
    for j in (1, 3):
        if hasattr(s[j], "conic_x"):
            s[j].conic = -.4
            s[j].conic_x = .25
    s.update()
    _df32_parity(s.table())


def test_pallas_f32_supports_anamorphic():
    """The Pallas f32 fast path dispatches anamorphic rows through
    the static specs instead of rejecting (interpret mode: f32-level
    agreement with the f64 engine)."""
    from rayopt_tpu.ops.pallas_trace import pallas_trace_final
    from rayopt_tpu.ops.geometric import trace_rays_final
    s = _cyl_system(cx=.013)
    tab = s.table()
    n = 256
    rng = np.random.default_rng(11)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*3.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u, biconic=True)[0])
    state = tuple(np.asarray(v) for v in
                  (y[:, 0], y[:, 1], y[:, 2],
                   u[:, 0], u[:, 1], u[:, 2]))
    out, t = pallas_trace_final(tab, state, tile=128,
                                interpret=True)
    nptest.assert_allclose(np.asarray(out[0]), yf[:, 0],
                           rtol=0, atol=1e-8)
    nptest.assert_allclose(np.asarray(out[1]), yf[:, 1],
                           rtol=0, atol=1e-8)


def test_element_oracle_methods():
    """Biconic's host oracle (surface_sag/normal/intercept/refract)
    is consistent: the intercept point lies on the surface and the
    refracted ray obeys Snell in the incidence plane."""
    el = ro.Biconic(curvature=.04, curvature_x=.01, conic=-.5,
                    conic_x=.2, material="SCHOTT-BK|N-BK7",
                    radius=10., distance=0.)
    y = np.array([[1., 2., -5.], [-3., .5, -5.]])
    u = np.tile([0., 0., 1.], (2, 1))
    t = el.intercept(y, u)
    pts = y + t[:, None]*u
    sag = el.surface_sag(pts)
    nptest.assert_allclose(sag, 0., atol=1e-9)
    nrm = el.surface_normal(pts)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    mu = 1/1.5
    u1 = el.refract(pts, u, mu)
    # Snell: sin(theta) ratio equals mu, coplanarity preserved
    for i in range(2):
        ci = abs(u[i] @ nrm[i])
        ct = abs(u1[i] @ nrm[i])
        si, st = np.sqrt(1 - ci*ci), np.sqrt(1 - ct*ct)
        nptest.assert_allclose(st, mu*si, rtol=1e-9)
        # vector Snell invariant: the tangential component scales
        # by mu -- n x u1 == mu * (n x u0)
        nptest.assert_allclose(np.cross(nrm[i], u1[i]),
                               mu*np.cross(nrm[i], u[i]),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_biconic_gradients_flow():
    """jax.grad of the spot RMS w.r.t. the anamorphic split matches
    central differences (the seeded-Newton intercept is
    differentiable)."""
    import jax
    from rayopt_tpu.parallel.grad import spot_rms
    s = _cyl_system(cx=.005)
    tab = s.table()
    rng = np.random.default_rng(11)
    y0 = np.zeros((16, 3))
    y0[:, :2] = rng.uniform(-3, 3, (16, 2))
    u0 = np.tile([0., 0., 1.], (16, 1))

    @jax.jit
    def merit(dx):
        return spot_rms(tab.replace(curvature_dx=dx),
                        jnp.asarray(y0), jnp.asarray(u0),
                        biconic=True)

    dx0 = jnp.asarray(tab.curvature_dx)
    g = np.asarray(jax.jit(jax.grad(merit))(dx0))
    eps = 1e-7
    for j in (1, 2):
        up = np.array(tab.curvature_dx)
        dn = up.copy()
        up[j] += eps
        dn[j] -= eps
        fd = (float(merit(jnp.asarray(up)))
              - float(merit(jnp.asarray(dn))))/(2*eps)
        nptest.assert_allclose(g[j], fd, rtol=1e-5, atol=1e-9)


def test_zmx_biconic_round_trip():
    """TYPE BICONICX (PARM 1 = X radius, PARM 2 = X conic) imports to
    a Biconic and survives the .zmx writer round trip."""
    from rayopt_tpu.io.zemax import zmx_to_system, system_to_zmx
    zmx = "\n".join([
        "VERS 1.0",
        "UNIT MM X W X",
        "WAVL 0.5875618",
        "SURF 0",
        "  TYPE STANDARD",
        "  DISZ INFINITY",
        "SURF 1",
        "  TYPE BICONICX",
        "  CURV 0.038699690402476",
        "  PARM 1 100.0",
        "  PARM 2 -1.5",
        "  DISZ 5.0",
        "  GLAS N-BK7 0 0 1.5168 64.17",
        "  DIAM 8",
        "SURF 2",
        "  TYPE STANDARD",
        "  STOP",
        "  DISZ 40.0",
        "  DIAM 8",
        "SURF 3",
        "  TYPE STANDARD",
        "  DISZ 0",
        "  DIAM 8",
    ])
    s = zmx_to_system(zmx)
    el = s[1]  # SURF 0 is the object row: SURF j -> [j]
    assert isinstance(el, ro.Biconic)
    nptest.assert_allclose(el.curvature, 0.038699690402476)
    nptest.assert_allclose(el.curvature_x, .01)
    nptest.assert_allclose(el.conic_x, -1.5)
    s2 = zmx_to_system(system_to_zmx(s))
    el2 = next(e for e in s2 if isinstance(e, ro.Biconic))
    assert isinstance(el2, ro.Biconic)
    nptest.assert_allclose(el2.curvature_x, el.curvature_x)
    nptest.assert_allclose(el2.conic_x, el.conic_x)
    nptest.assert_allclose(el2.curvature, el.curvature)


def test_oslo_cvx_imports_cylinder():
    """OSLO CVX (cylinder x-curvature, silently dropped by the
    reference at reference oslo.py:112) imports to a Biconic."""
    from rayopt_tpu.io.oslo import olc_to_system
    olc = ("LID 'cyl test'; RD 0.0; NXT; RD 0.0; CVX 0.02; "
           "TH 3.0; GLA BK7; NXT; RD 0.0; TH 40.0")
    s = olc_to_system(olc)
    el = s[1]
    assert isinstance(el, ro.Biconic)
    nptest.assert_allclose(el.curvature, 0.)    # flat in y
    nptest.assert_allclose(el.curvature_x, .02)  # cylinder in x
    from rayopt_tpu.ops.tables import is_anamorphic
    assert is_anamorphic(s.table())


# -- toroids -----------------------------------------------------------


def test_toroid_sag_normal_oracle():
    """normal_toroid equals the numerical gradient of sag_toroid."""
    rng = np.random.default_rng(9)
    cr, cy, ky = .012, -.028, .35
    asp = np.array([2e-5, -1e-8])
    eps = 1e-6
    for x, y in rng.uniform(-4, 4, (15, 2)):
        gx, gy = (float(np.asarray(v)) for v in K.normal_toroid(
            x, y, cr, cy, ky, asp))

        def sag(xx, yy):
            return float(np.asarray(K.sag_toroid(
                xx, yy, 0., cr, cy, ky, asp)))

        fx = (sag(x + eps, y) - sag(x - eps, y))/(2*eps)
        fy = (sag(x, y + eps) - sag(x, y - eps))/(2*eps)
        nptest.assert_allclose(gx, fx, rtol=1e-6, atol=1e-9)
        nptest.assert_allclose(gy, fy, rtol=1e-6, atol=1e-9)


def test_toroid_degenerate_limits():
    """cr == cy with a circular (k=0) curve is exactly a sphere;
    cr == 0 is exactly the y-cylinder; and a true toroid differs
    from the matched biconic at high order."""
    c = .04
    x = np.linspace(-4, 4, 9)
    y = np.linspace(-3, 3, 9)
    z = np.zeros(9)
    nosp = np.zeros(0)
    sphere = np.asarray(K.sag(x, y, z, c, 0., nosp))
    tor = np.asarray(K.sag_toroid(x, y, z, c, c, 0., nosp))
    nptest.assert_allclose(tor, sphere, rtol=1e-12, atol=1e-13)
    cyl_b = np.asarray(K.sag_biconic(x, y, z, 0., 0., c, 0., nosp))
    cyl_t = np.asarray(K.sag_toroid(x, y, z, 0., c, 0., nosp))
    nptest.assert_allclose(cyl_t, cyl_b, rtol=1e-12, atol=1e-14)
    # toroid vs biconic with the same vertex curvatures: differs
    # (6th-order cross term) away from the axes
    bic = np.asarray(K.sag_biconic(x, y, z, .02, 0., c, 0., nosp))
    trd = np.asarray(K.sag_toroid(x, y, z, .02, c, 0., nosp))
    off_axis = (np.abs(x) > 1) & (np.abs(y) > 1)
    assert np.abs(bic - trd)[off_axis].min() > 1e-8


def _toroid_system():
    s = ro.System([
        dict(material="air"),
        dict(type="toroid", roc=51.68, roc_rotation=200., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=10.),
        dict(type="toroid", distance=3., material="air", radius=10.),
        dict(distance=95., radius=20.),
    ])
    s.object.pupil.radius = 4.
    s.object.pupil.update_radius = False
    s.update()
    return s


def test_toroid_trace_and_paraxial():
    s = _toroid_system()
    tab = s.table()
    assert is_anamorphic(tab)
    assert np.asarray(tab.toroidal)[1] == 1.
    n, m = s.paraxial_matrix(s.wavelengths[0])
    # vertex powers: y from the generating curve, x from the
    # rotation radius (first surface only: 1/200 * (n-1))
    nptest.assert_allclose(-1/m[3, 1], 100., rtol=.02)
    assert 0 < -m[2, 0] < -m[3, 1]
    # engine parity: dynamic anamorphic scan vs specialized unroll
    from rayopt_tpu.ops.geometric import trace_rays
    from rayopt_tpu.ops.kernels import specialize
    rng = np.random.default_rng(13)
    y0 = np.zeros((16, 3))
    y0[:, :2] = rng.uniform(-3, 3, (16, 2))
    u0 = np.tile([0., 0., 1.], (16, 1))
    a = trace_rays(tab, y0, u0, biconic=True)
    b = trace_rays(tab, y0, u0, specs=specialize(tab), unroll=True)
    for va, vb in zip(a, b):
        nptest.assert_allclose(np.asarray(vb), np.asarray(va),
                               rtol=1e-10, atol=1e-10)
    # intercepts land on the exact swept surface
    g = ro.GeometricTrace(s)
    g.rays_given(y0, u0)
    g.propagate()
    el = s[1]
    res = el.surface_sag(g.y[1])
    nptest.assert_allclose(res, 0., atol=1e-9)


def test_toroid_yaml_round_trip_and_edit():
    s = _toroid_system()
    s2 = ro.system_from_yaml(ro.system_to_yaml(s))
    s2.update()
    from rayopt_tpu.elements import Toroid
    assert isinstance(s2[1], Toroid)
    nptest.assert_allclose(s2[1].curvature_rotation, 1/200.)
    s2.reverse()
    nptest.assert_allclose(s2[-2].curvature_rotation, -1/200.)
    s3 = _toroid_system()
    s3.rescale(2.)
    # rescale(k) scales lengths by k: curvatures divide (as the base
    # curvature does)
    nptest.assert_allclose(s3[1].curvature_rotation, 1/400.)
    nptest.assert_allclose(s3[1].curvature,
                           _toroid_system()[1].curvature/2.)


def test_toroid_df32_parity_poly_rejects():
    s = _toroid_system()
    tab = s.table()
    _df32_parity(tab)
    with pytest.raises(NotImplementedError):
        ro.PolyTrace(s, 3)


def test_zmx_toroidal_round_trip():
    """TYPE TOROIDAL (PARM 1 = radius of rotation) imports to a
    Toroid and survives the .zmx writer round trip."""
    from rayopt_tpu.io.zemax import zmx_to_system, system_to_zmx
    from rayopt_tpu.elements import Toroid
    zmx = "\n".join([
        "VERS 1.0",
        "UNIT MM X W X",
        "WAVL 0.5875618",
        "SURF 0", "  TYPE STANDARD", "  DISZ 20.0",
        "SURF 1",
        "  TYPE TOROIDAL",
        "  CURV 0.019349845201238",
        "  PARM 1 200.0",
        "  DISZ 5.0",
        "  GLAS N-BK7 0 0 1.5168 64.17",
        "  DIAM 8",
        "SURF 2", "  TYPE STANDARD", "  STOP", "  DISZ 40.0",
        "  DIAM 8",
    ])
    s = zmx_to_system(zmx)
    el = s[1]
    assert isinstance(el, Toroid)
    nptest.assert_allclose(el.curvature_rotation, 1/200.)
    nptest.assert_allclose(el.curvature, 0.019349845201238)
    s2 = zmx_to_system(system_to_zmx(s))
    el2 = next(e for e in s2 if isinstance(e, Toroid))
    nptest.assert_allclose(el2.curvature_rotation,
                           el.curvature_rotation)
    nptest.assert_allclose(el2.curvature, el.curvature)


def test_zmx_toroidal_polynomial_terms():
    """PARM 2 is the first polynomial term (y^2) of the generating
    curve, PARM 3 the y^4 term (the OpticStudio layout)."""
    from rayopt_tpu.io.zemax import zmx_to_system, system_to_zmx
    from rayopt_tpu.elements import Toroid
    zmx = "\n".join([
        "VERS 1.0", "UNIT MM X W X", "WAVL 0.5875618",
        "SURF 0", "  TYPE STANDARD", "  DISZ 20.0",
        "SURF 1",
        "  TYPE TOROIDAL",
        "  CURV 0.02",
        "  PARM 1 200.0",
        "  PARM 2 1e-05",
        "  PARM 3 2e-08",
        "  DISZ 5.0",
        "  GLAS N-BK7 0 0 1.5168 64.17",
        "  DIAM 8",
        "SURF 2", "  TYPE STANDARD", "  DISZ 40.0", "  DIAM 8",
    ])
    s = zmx_to_system(zmx)
    el = s[1]
    assert isinstance(el, Toroid)
    nptest.assert_allclose(el.aspherics, [1e-5, 2e-8])
    s2 = zmx_to_system(system_to_zmx(s))
    el2 = next(e for e in s2 if isinstance(e, Toroid))
    nptest.assert_allclose(el2.aspherics, el.aspherics)


def test_polarization_uses_anamorphic_normals():
    """The Jones chain at a cylinder uses the true (x-flat) normal:
    a meridional-offset ray sees zero incidence tilt in x."""
    from rayopt_tpu.polarization import trace_polarization
    s = _cyl_system()
    g = ro.GeometricTrace(s)
    # a ray offset in x only: on a y-cylinder its incidence stays
    # normal, so the interface must not polarize it at all
    y0 = np.array([[3., 0., 0.], [0., 3., 0.]])
    u0 = np.tile([0., 0., 1.], (2, 1))
    g.rays_given(y0, u0)
    g.propagate()
    out = trace_polarization(s.table(g.l), g.y, g.u, g.i)
    from rayopt_tpu.polarization import jones_diattenuation
    d = jones_diattenuation(np.asarray(out["jones"]))
    assert d[0] < 1e-12      # x-offset ray: normal incidence
    assert d[1] > 1e-4       # y-offset ray: oblique, polarizes


def test_ghosts_reject_anamorphic():
    from rayopt_tpu.ghosts import ghost_table
    s = _cyl_system()
    with pytest.raises(NotImplementedError):
        ghost_table(s)


def test_angular_rms_vignetting_normalization():
    """Vignetted rays drop from both the moments and the weight sum:
    killing half the bundle must not shrink the reported spread."""
    from rayopt_tpu.models import beam_expander
    s = beam_expander()
    g = ro.GeometricTrace(s)
    g.rays_point((0, 0.), nrays=13, distribution="radau",
                 filter=False)
    full = g.angular_rms()
    g.u[-1][::2] = np.nan  # vignette half the rays
    half = g.angular_rms()
    assert np.isfinite(half)
    assert half > full/2  # no silent shrink from the dropped weight


def test_paraxial_trace_both_axes():
    """ParaxialTrace(axis=0/1) gives per-axis first-order properties
    of anamorphic systems (the reference's 'paraxial trace to be both
    axes' TODO): a cylinder has f_y ~ 50 mm and no x power."""
    from rayopt_tpu.trace.paraxial import ParaxialTrace
    s = ro.System([
        dict(material="air"),
        dict(type="biconic", roc=25.84, curvature_x=0., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=10.),
        dict(type="biconic", distance=3., material="air", radius=10.),
        dict(distance=47., radius=10.),
    ], object=dict(type="infinite", angle_deg=2.,
                   pupil=dict(radius=4.)))
    s.update()
    f_y = ParaxialTrace(s, axis=1).focal_length[1]
    f_x = ParaxialTrace(s, axis=0).focal_length[1]
    nptest.assert_allclose(f_y, 50., rtol=.02)
    assert not np.isfinite(f_x) or abs(f_x) > 1e6


@pytest.mark.slow
def test_analysis_smoke_on_cylinder_system():
    """The full Analysis report renders for an anamorphic system
    (astigmatic foci, cylinder surfaces in every panel path)."""
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    s = ro.System([
        dict(material="air"),
        dict(type="biconic", roc=25.84, curvature_x=0., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=10.),
        dict(type="biconic", distance=3., material="air", radius=10.),
        dict(distance=47., radius=10.),
    ], object=dict(type="infinite", angle_deg=2.,
                   pupil=dict(radius=4.)))
    s.update()
    a = ro.Analysis(s, print=False, defocus=3)
    assert len(a.figures) == 5
    plt.close("all")


def test_cylinder_closed_form_specialization():
    """Pure conic-cylinder rows get the closed-form quadric intercept
    in the specialized engines (cyl_axis flag) instead of the seeded
    Newton, bit-matching the general anamorphic path -- including an
    x-cylinder with conic and a y-cylinder mirror."""
    from rayopt_tpu.ops.geometric import trace_rays
    from rayopt_tpu.ops.kernels import specialize
    from rayopt_tpu.formats import system_from_yaml
    s = system_from_yaml("""
object: {angle_deg: 0.5, pupil: {radius: 4.}}
elements:
- {material: air}
- {type: biconic, curvature: 0., curvature_x: 0.018, conic_x: -0.7,
   distance: 10., material: 1.5168, radius: 6.}
- {type: biconic, distance: 3., material: mirror, curvature: 0.01,
   curvature_x: 0., radius: 8.}
- {distance: -40., radius: 20.}
""")
    tab = s.table()
    specs = specialize(tab)
    assert [sp.cyl_axis for sp in specs] == [0, 2, 1, 0]
    rng = np.random.default_rng(5)
    n = 64
    y0 = np.zeros((n, 3))
    y0[:, :2] = rng.uniform(-3, 3, (n, 2))
    u0 = np.tile([0., 0., 1.], (n, 1))
    u0[:, :2] = rng.uniform(-.05, .05, (n, 2))
    u0 /= np.linalg.norm(u0, axis=1, keepdims=True)
    a = trace_rays(tab, y0, u0, biconic=True)
    b = trace_rays(tab, y0, u0, specs=specs, unroll=True)
    for va, vb in zip(a, b):
        nptest.assert_allclose(np.asarray(vb), np.asarray(va),
                               rtol=1e-10, atol=1e-10)
    # a figured cylinder must NOT take the closed form
    s2 = _cyl_system()
    s2[1].aspherics = [1e-6]
    s2.update()
    sp2 = specialize(s2.table())
    assert all(sp.cyl_axis == 0 for sp in sp2 if sp.aspheric)
