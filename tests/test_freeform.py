"""Freeform surfaces (XY-polynomial / Zernike sag): basis lowering,
kernel/oracle/engine parity, paraxial per-axis power, gradients
(XLA VJP, analytic-adjoint Pallas kernel), and the loud rejections in
the symmetric-only engines.

The strongest oracle is exactness: a freeform with only quadratic
terms IS a biconic paraboloid (conic k = -1 makes the biconic sag
exactly (cx x^2 + cy y^2)/2), so every engine must agree bit-for-bit
with the independently-implemented biconic path."""

import numpy as np
from numpy import testing as nptest
import pytest

import jax
import jax.numpy as jnp

import rayopt_tpu as ro
from rayopt_tpu.ops import kernels as K
from rayopt_tpu.ops import surfaces as O
from rayopt_tpu.ops import geometric as G
from rayopt_tpu.ops.tables import make_table, is_anamorphic
from rayopt_tpu.utils.zernike import (zernike, zernike_xy,
                                      zernike_xy_coefficients)

CX, CY = 1/80., 1/50.
QUAD = np.array([0., 0., CX/2., 0., CY/2.])  # x, y, x^2, xy, y^2


def _bundle(n=256, seed=1):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-5, 5, n)
    y = rng.uniform(-5, 5, n)
    z = np.full(n, -10.)
    u = rng.normal(0, 0.02, (n, 3))
    u[:, 2] = 1.
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    return x, y, z, u


def test_zernike_xy_exact():
    """The Cartesian monomial expansion reproduces the polar Zernike
    evaluation to rounding, through j = 28."""
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, 50)
    y = rng.uniform(-1, 1, 50)
    for j in range(1, 29):
        ref = zernike(j, x, y)
        got = sum(c*x**i*y**k for (i, k), c in zernike_xy(j).items())
        nptest.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_zernike_xy_coefficients_roundtrip():
    """Lowering a coefficient vector matches the summed Zernike
    evaluation minus the dropped piston, on the triangular ordering."""
    rng = np.random.RandomState(2)
    coeff = rng.normal(0, 1., 15)
    xy, const = zernike_xy_coefficients(coeff)
    deg = K.xy_degree(len(xy))
    terms = K._xy_terms(deg)
    x = rng.uniform(-1, 1, 40)
    y = rng.uniform(-1, 1, 40)
    ref = sum(c*zernike(j, x, y) for j, c in enumerate(coeff, 1))
    got = const + sum(c*x**i*y**k for c, (i, k) in zip(xy, terms))
    nptest.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_xy_degree_validation():
    assert K.xy_degree(2) == 1
    assert K.xy_degree(5) == 2
    assert K.xy_degree(9) == 3
    with pytest.raises(ValueError):
        K.xy_degree(4)


def test_dpoly_xy_is_gradient():
    """_dpoly_xy equals the numerical gradient of _poly_xy."""
    rng = np.random.RandomState(3)
    coeffs = jnp.asarray(rng.normal(0, 1e-2, 9))  # degree 3
    pts = rng.uniform(-2, 2, (10, 2))
    eps = 1e-6
    for x, y in pts:
        gx, gy = (float(np.asarray(v))
                  for v in K._dpoly_xy(jnp.asarray(x), jnp.asarray(y),
                                       coeffs))
        px = (float(K._poly_xy(jnp.asarray(x + eps), jnp.asarray(y),
                               coeffs))
              - float(K._poly_xy(jnp.asarray(x - eps), jnp.asarray(y),
                                 coeffs)))/(2*eps)
        py = (float(K._poly_xy(jnp.asarray(x), jnp.asarray(y + eps),
                               coeffs))
              - float(K._poly_xy(jnp.asarray(x), jnp.asarray(y - eps),
                                 coeffs)))/(2*eps)
        nptest.assert_allclose([gx, gy], [px, py], rtol=1e-6,
                               atol=1e-10)


def test_quadratic_freeform_equals_biconic_paraboloid():
    """Kernel-level: intercept + refract of the quadratic freeform
    match the biconic k = -1 paraboloid exactly."""
    x, y, z, u = _bundle()
    ux, uy, uz = u.T
    xy = jnp.asarray(QUAD)
    t_ff = np.asarray(K.intercept(x, y, z, ux, uy, uz, 0., 0.,
                                  jnp.zeros(0), 0., xy_poly=xy))
    t_bc = np.asarray(K.intercept_biconic(x, y, z, ux, uy, uz,
                                          CX, -1., CY, -1.,
                                          jnp.zeros(0), 0.))
    nptest.assert_allclose(t_ff, t_bc, rtol=0, atol=1e-13)
    x1, y1 = x + t_ff*ux, y + t_ff*uy
    r_ff = K.refract_freeform(x1, y1, ux, uy, uz, 1/1.5, 0., 0.,
                              jnp.zeros(0), jnp.zeros(0), xy)
    r_bc = K.refract_biconic(x1, y1, ux, uy, uz, 1/1.5, CX, -1.,
                             CY, -1., jnp.zeros(0))
    for a, b in zip(r_ff, r_bc):
        nptest.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                               atol=1e-14)


def test_oracle_component_parity():
    """The (..., 3) oracle and the component kernels agree on sag and
    normal of a general degree-3 freeform."""
    rng = np.random.RandomState(4)
    coeffs = rng.normal(0, 1e-2, 9)
    coeffs[0] = coeffs[1] = 1e-3  # include tilt terms
    xyj = jnp.asarray(coeffs)
    x, y, z, _ = _bundle(64)
    xyz = jnp.asarray(np.stack([x, y, z], -1))
    sag_o = np.asarray(O.surface_sag(xyz, .01, -.5, jnp.zeros(0),
                                     None, xyj))
    sag_k = np.asarray(K.sag(x, y, z, .01, -.5, jnp.zeros(0))
                       ) - np.asarray(K._poly_xy(jnp.asarray(x),
                                                 jnp.asarray(y), xyj))
    nptest.assert_allclose(sag_o, sag_k, rtol=0, atol=1e-14)
    n_o = np.asarray(O.surface_normal(xyz, .01, -.5, jnp.zeros(0),
                                      None, xyj))
    gx, gy = K.normal_freeform(x, y, .01, -.5, jnp.zeros(0),
                               jnp.zeros(0), xyj)
    nptest.assert_allclose(n_o[:, 0], np.asarray(gx), rtol=0,
                           atol=1e-14)
    nptest.assert_allclose(n_o[:, 1], np.asarray(gy), rtol=0,
                           atol=1e-14)


def _freeform_table():
    xy = np.zeros((4, 5))
    xy[1] = QUAD
    return make_table(
        curvature=[0., 0., 0., 0.],
        distance=[0., 10., 3., 40.],
        n_before=[1., 1., 1.5, 1.],
        n_after=[1., 1.5, 1., 1.],
        mu=[1., 1/1.5, 1.5, 1.],
        xy_poly=xy,
    )


def test_engine_parity_scan_unrolled_pallas():
    """scan == unrolled(specs) == Pallas(interpret) == biconic table
    on the quadratic freeform singlet."""
    tab = _freeform_table()
    assert is_anamorphic(tab)
    specs = K.specialize(tab)
    assert [sp.freeform for sp in specs] == [False, True, False, False]
    x, y, z, u = _bundle()
    y0 = np.stack([x, y, np.zeros_like(x)], -1)
    r_scan = G.trace_rays_final(tab, y0, u, biconic=True)
    r_unr = G.trace_rays_final(tab, y0, u, specs=specs, unroll=True)
    nptest.assert_allclose(np.asarray(r_scan[0]), np.asarray(r_unr[0]),
                           rtol=0, atol=1e-13)
    nptest.assert_allclose(np.asarray(r_scan[1]), np.asarray(r_unr[1]),
                           rtol=0, atol=1e-14)
    # the independently-built biconic paraboloid table
    tab_bc = make_table(
        curvature=[0., CY, 0., 0.], conic=[0., -1., 0., 0.],
        curvature_dx=[0., CX - CY, 0., 0.],
        distance=[0., 10., 3., 40.],
        n_before=[1., 1., 1.5, 1.], n_after=[1., 1.5, 1., 1.],
        mu=[1., 1/1.5, 1.5, 1.])
    r_bc = G.trace_rays_final(tab_bc, y0, u, biconic=True)
    nptest.assert_allclose(np.asarray(r_scan[0]), np.asarray(r_bc[0]),
                           rtol=0, atol=1e-13)
    # Pallas fused kernel, interpret mode
    from rayopt_tpu.ops.pallas_trace import pallas_trace_final
    state = tuple(np.ascontiguousarray(a)
                  for a in (y0[:, 0], y0[:, 1], y0[:, 2],
                            u[:, 0], u[:, 1], u[:, 2]))
    out, tp = pallas_trace_final(tab, state, tile=128, interpret=True)
    nptest.assert_allclose(np.asarray(K.join(*out[:3])),
                           np.asarray(r_unr[0]), rtol=0, atol=1e-13)


def _zernike_system():
    z = np.zeros(11)
    z[10] = 0.002  # Z11 primary spherical
    s = ro.System([
        dict(material="air"),
        dict(type="zernike", zernike_coefficients=list(z),
             norm_radius=10., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=10.),
        dict(distance=3., material="air", radius=10.),
        dict(roc=-100., distance=50., material="mirror", radius=12.),
        dict(distance=-48., radius=5.),
    ])
    s.object.pupil.radius = 8.
    s.object.pupil.update_radius = False
    s.update()
    return s, z


def test_zernike_sag_element():
    """ZernikeSag evaluates the orthonormal Noll sum (minus the
    re-referenced piston) and survives the YAML round trip."""
    s, z = _zernike_system()
    el = s[1]
    rng = np.random.RandomState(5)
    x = rng.uniform(-8, 8, 30)
    y = rng.uniform(-8, 8, 30)
    sag = -np.asarray(el.surface_sag(np.stack(
        [x, y, np.zeros_like(x)], -1)))
    ref = z[10]*zernike(11, x/10., y/10.) - el.piston
    nptest.assert_allclose(sag, ref, rtol=0, atol=1e-15)
    assert el.surface_sag(np.zeros((1, 3)))[0] == 0.  # vertex ref

    import rayopt_tpu.formats as F
    s2 = F.system_from_yaml(F.system_to_yaml(s))
    s2.update()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=32)
    t2 = ro.GeometricTrace(s2)
    t2.rays_point((0., 0.), nrays=32)
    nptest.assert_allclose(t2.y[-1], t.y[-1], rtol=0, atol=1e-13)


def test_zernike_system_host_device_parity():
    """Host per-element trace == scan == specialized unrolled on the
    Zernike-corrector system (mirror fold included)."""
    s, _ = _zernike_system()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=32)
    tab = s.table()
    specs = K.specialize(tab)
    assert specs[1].freeform
    y0 = np.asarray(t.y[0], float)
    u0 = np.asarray(t.u[0], float)
    yf, uf, _ = G.trace_rays_final(tab, y0, u0, specs=specs,
                                   unroll=True)
    nptest.assert_allclose(np.asarray(yf)[:, :2], t.y[-1][:, :2],
                           rtol=0, atol=1e-12)
    ys, us, _ = G.trace_rays_final(tab, y0, u0, biconic=True)
    nptest.assert_allclose(np.asarray(ys)[:, :2], t.y[-1][:, :2],
                           rtol=0, atol=1e-12)


def _xysystem():
    s = ro.System([
        dict(material="air"),
        dict(type="xypoly", xy_coefficients=[0, 0, .25, 0.02, .4],
             norm_radius=5., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=4.),
        dict(distance=3., material="air", radius=4.),
        dict(distance=40., radius=5.),
    ])
    s.object.pupil.radius = 2.
    s.object.pupil.update_radius = False
    s.update()
    return s


def test_paraxial_per_axis_power():
    """Per-axis first-order properties of the quadratic freeform match
    the equivalent biconic paraboloid, host AND device ABCD."""
    s1 = _xysystem()
    # strip the xy cross term for the paraxial comparison (it rotates
    # the principal sections; ignored at first order by convention)
    s1[1].xy_coefficients = [0, 0, .25, 0, .4]
    s1.update()
    cx = 2*.25/25.
    cy = 2*.4/25.
    s2 = ro.System([
        dict(material="air"),
        dict(type="biconic", curvature=cy, conic=-1., curvature_x=cx,
             conic_x=-1., distance=5., material="SCHOTT-BK|N-BK7",
             radius=4.),
        dict(type="biconic", distance=3., material="air", radius=4.),
        dict(distance=40., radius=5.),
    ])
    s2.object.pupil.radius = 2.
    s2.object.pupil.update_radius = False
    s2.update()
    p1, p2 = ro.ParaxialTrace(s1), ro.ParaxialTrace(s2)
    nptest.assert_allclose(p1.height, p2.height, rtol=0, atol=1e-12)
    from rayopt_tpu.ops import paraxial as OP
    m1 = np.asarray(OP.abcd_matrices(s1.table()))
    m2 = np.asarray(OP.abcd_matrices(s2.table()))
    nptest.assert_allclose(m1, m2, rtol=0, atol=1e-14)


def test_gradients_and_adjoint_kernel():
    """d(spot RMS)/d(xy_poly) through the unrolled engine checks
    against finite differences, and the analytic-adjoint Pallas merit
    kernel (interpret mode) reproduces value and gradient."""
    s = _xysystem()
    tab = s.table()
    specs = K.specialize(tab)
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=64, distribution="hexapolar",
                 clip=False)
    y0 = jnp.asarray(t.y[0])
    u0 = jnp.asarray(t.u[0])

    def rms(xy):
        tb = tab.replace(xy_poly=xy)
        y, u, _ = G.trace_rays_final(tb, y0, u0, specs=specs,
                                     unroll=True)
        x, yy = y[:, 0], y[:, 1]
        good = jnp.isfinite(x)
        n = good.sum()
        xg = jnp.where(good, x, 0.)
        yg = jnp.where(good, yy, 0.)
        return jnp.sqrt(((xg - xg.sum()/n)**2
                         + (yg - yg.sum()/n)**2).sum()/n)

    g = np.asarray(jax.grad(rms)(tab.xy_poly))
    for idx in (2, 3, 4):
        eps = 1e-7
        xp = np.asarray(tab.xy_poly).copy()
        xp[1, idx] += eps
        fd = (float(rms(jnp.asarray(xp)))
              - float(rms(tab.xy_poly)))/eps
        nptest.assert_allclose(fd, g[1, idx], rtol=1e-4)

    from rayopt_tpu.ops.pallas_grad import pallas_spot_rms
    n = int(y0.shape[0])
    pad = (-n) % 128
    y0p = jnp.asarray(np.concatenate(
        [np.asarray(y0), np.full((pad, 3), np.nan)], 0))
    u0p = jnp.asarray(np.concatenate(
        [np.asarray(u0), np.full((pad, 3), np.nan)], 0))

    def rms_adj(xy):
        tb = tab.replace(xy_poly=xy)
        return pallas_spot_rms(tb, y0p, u0p, specs=specs, tile=128,
                               interpret=True)

    nptest.assert_allclose(float(rms_adj(tab.xy_poly)),
                           float(rms(tab.xy_poly)), rtol=1e-12)
    ga = np.asarray(jax.grad(rms_adj)(tab.xy_poly))
    nptest.assert_allclose(ga[1, 2:], g[1, 2:], rtol=1e-6)


def test_reverse_rescale():
    s = _xysystem()
    el = s[1]
    sag0 = float(el.surface_sag(np.array([[1., 2., 0.]]))[0])
    el.reverse()
    assert float(el.surface_sag(np.array([[1., 2., 0.]]))[0]) == -sag0
    el.reverse()
    el.rescale(10.)
    # lengths scale linearly: sag at 10x the point is 10x the sag
    nptest.assert_allclose(
        float(el.surface_sag(np.array([[10., 20., 0.]]))[0]), 10*sag0,
        rtol=1e-13)


def test_loud_rejections():
    """The polynomial trace and anamorphic+freeform combinations
    reject with actionable errors (df32 covers freeform rows)."""
    s = _xysystem()
    tab = s.table()
    from rayopt_tpu.trace.poly import PolyTrace
    with pytest.raises(NotImplementedError, match="freeform"):
        PolyTrace(s, kmax=3)
    bad = tab.replace(curvature_dx=np.array([0., 1e-3, 0., 0.]))
    with pytest.raises(NotImplementedError, match="anamorphic"):
        K.specialize(bad)
    from rayopt_tpu.ops import df32
    with pytest.raises(NotImplementedError, match="anamorphic"):
        df32.plan(bad)


def test_df32_freeform_parity():
    """The df32 parity engine covers freeform rows: eager df32 trace
    of the Zernike-corrector system agrees with the f64 scan engine
    far inside the 1e-9 parity target."""
    from rayopt_tpu.ops import df32
    s, _ = _zernike_system()
    tab = s.table()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=32, distribution="hexapolar",
                 clip=False)
    y0 = np.asarray(t.y[0], float)
    u0 = np.asarray(t.u[0], float)
    yf, uf, _ = G.trace_rays_final(tab, y0, u0, biconic=True)
    for fast in (False, True):
        steps = df32.plan(tab, fast=fast)
        out = df32.trace_df32_final(steps, df32.state_from_f64(y0, u0))
        xd = df32.to_f64(out[0])
        yd = df32.to_f64(out[1])
        nptest.assert_allclose(xd, np.asarray(yf)[:, 0], rtol=0,
                               atol=2e-12)
        nptest.assert_allclose(yd, np.asarray(yf)[:, 1], rtol=0,
                               atol=2e-12)
        ud = df32.to_f64(out[3])
        nptest.assert_allclose(ud, np.asarray(uf)[:, 0], rtol=0,
                               atol=2e-12)


@pytest.mark.slow
def test_ad_expansion_freeform():
    """The AD aberration expansion covers freeform rows: third-order
    tensors of the quadratic freeform match the equivalent biconic
    paraboloid bit-for-bit."""
    from rayopt_tpu.expansion import TransverseExpansion

    def mk(kind):
        if kind == "xy":
            front = dict(type="xypoly",
                         xy_coefficients=[0, 0, .25, 0, .25],
                         norm_radius=5., distance=5.,
                         material="SCHOTT-BK|N-BK7", radius=4.)
        else:
            front = dict(curvature=2*.25/25., conic=-1., distance=5.,
                         material="SCHOTT-BK|N-BK7", radius=4.)
        s = ro.System([
            dict(material="air"), front,
            dict(distance=3., material="air", radius=4.),
            dict(distance=40., radius=5.),
        ])
        s.object.pupil.radius = 2.
        s.object.pupil.update_radius = False
        s.object.angle = .05
        s.update()
        return s

    e1 = TransverseExpansion(mk("xy"))
    e2 = TransverseExpansion(mk("parab"))
    nptest.assert_allclose(e1.j1, e2.j1, rtol=0, atol=1e-15)
    nptest.assert_allclose(e1.j3, e2.j3, rtol=0, atol=1e-12)


def test_thermal_freeform_parity():
    """heat_table's xy_poly scaling matches the host at_temperature
    element rescale (uniform homothety: coefficient of total degree d
    scales as g**(1-d))."""
    from rayopt_tpu import thermal as T
    s = _xysystem()
    t = 60.
    st = T.at_temperature(s, t)
    st.update()
    tab_host = st.table()
    model = T.thermal_model(s, t)
    tab_dev = T.heat_table(s.table(), t - 20., *model)
    nptest.assert_allclose(np.asarray(tab_dev.xy_poly),
                           np.asarray(tab_host.xy_poly),
                           rtol=1e-12, atol=0)


@pytest.mark.slow
def test_freeform_corrector_design():
    """End-to-end freeform design: a flat XY-polynomial plate in front
    of an f/2 spherical mirror (Schmidt-camera layout) optimized in
    the element's NORMALIZED coefficient space (the denormalized table
    monomials span ~R^4 in scale and condition adam badly).  The
    optimizer must cut the spot RMS several-fold and discover a
    rotationally-symmetric profile (x^2 == y^2, x^4 == y^4 within
    tolerance) -- nobody told it the aberration is symmetric.

    Note the 1e-10 coefficient seed: an exactly-zero freeform row is
    baked out of the static specialization and carries zero gradient
    BY DESIGN (same semantics as conic on an exactly-spherical row)."""
    import optax

    s = ro.System([
        dict(material="air"),
        dict(type="xypoly", xy_coefficients=[1e-10]*14,
             norm_radius=25., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=26.),
        dict(distance=4., material="air", radius=26.),
        dict(roc=-200., distance=100., material="mirror", radius=30.),
        dict(distance=-95., radius=5.),
    ])
    s.object.pupil.radius = 25.
    s.object.pupil.update_radius = False
    s.update()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=128, distribution="hexapolar",
                 clip=False)
    tab = s.table()
    specs = K.specialize(tab)
    assert specs[1].freeform
    y0 = jnp.asarray(t.y[0])
    u0 = jnp.asarray(t.u[0])
    w = jnp.ones(y0.shape[0])/y0.shape[0]
    from rayopt_tpu.parallel.grad import spot_rms
    scales = jnp.asarray([25.**(i + j) for i, j in K._xy_terms(4)])
    xy0 = jnp.asarray(tab.xy_poly)

    def merit(a):
        xy = xy0.at[1].set(a/scales)
        return spot_rms(tab.replace(xy_poly=xy), y0, u0, w=w,
                        specs=specs, unroll=True)

    opt = optax.adam(2e-4)
    a = jnp.zeros(14)
    st = opt.init(a)
    vg = jax.jit(jax.value_and_grad(merit))
    v0 = float(merit(a))
    for _ in range(600):
        _, g = vg(a)
        up, st = opt.update(g, st, a)
        a = optax.apply_updates(a, up)
    v1 = float(merit(a))
    assert v1 < v0/3.5, (v0, v1)
    an = np.asarray(a)
    terms = K._xy_terms(4)
    c = {t_: an[i] for i, t_ in enumerate(terms)}
    # rotational symmetry emerges from the on-axis merit
    nptest.assert_allclose(c[(2, 0)], c[(0, 2)], rtol=0.05)
    nptest.assert_allclose(c[(4, 0)], c[(0, 4)], rtol=0.05)


@pytest.mark.slow
def test_optimize_grad_xy_poly_scales():
    """optimize_grad(select=("xy_poly",), scales=freeform_scales)
    optimizes the freeform coefficients directly: the preconditioned
    parameterization makes raw adam work on the ~R^degree-spanned
    monomial columns, and the returned table carries the DENORMALIZED
    coefficients."""
    from rayopt_tpu.parallel.grad import (optimize_grad,
                                          freeform_scales)
    s = ro.System([
        dict(material="air"),
        dict(type="xypoly", xy_coefficients=[1e-10]*14,
             norm_radius=25., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=26.),
        dict(distance=4., material="air", radius=26.),
        dict(roc=-200., distance=100., material="mirror", radius=30.),
        dict(distance=-95., radius=5.),
    ])
    s.object.pupil.radius = 25.
    s.object.pupil.update_radius = False
    s.update()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=64, distribution="hexapolar",
                 clip=False)
    tab = s.table()
    w = np.ones(t.y[0].shape[0])/t.y[0].shape[0]
    bundles = [(jnp.asarray(t.y[0]), jnp.asarray(t.u[0]),
                jnp.asarray(w))]
    from rayopt_tpu.ops.kernels import specialize
    specs = specialize(tab)
    from rayopt_tpu.parallel.grad import spot_rms

    def merit(tb):
        return spot_rms(tb, *bundles[0][:2], w=bundles[0][2],
                        specs=specs, unroll=True)

    sc = freeform_scales(s)
    assert sc.shape == (5, 14) and sc[1, 2] == 25.**-2
    tab1, hist = optimize_grad(tab, bundles, select=("xy_poly",),
                               steps=600, lr=2e-4, merit=merit,
                               scales={"xy_poly": sc})
    assert hist[-1] < hist[0]/2, (hist[0], hist[-1])
    # returned table is denormalized: re-evaluating the merit on it
    # reproduces the final history value (hist[-1] is pre-final-update
    # so exact equality is not expected; a wrong denormalization would
    # be off by orders of magnitude)
    nptest.assert_allclose(float(merit(tab1)), hist[-1], rtol=1e-2)
    # guard against the degenerate all-rays-vignetted "optimum" (the
    # nan-safe merit silently drops dead rays): the optimized table
    # must keep (nearly) every ray alive and the denormalized
    # coefficients must stay physically small
    from rayopt_tpu.ops.geometric import trace_rays_final
    yf, uf, _ = trace_rays_final(tab1, *bundles[0][:2], specs=specs,
                                 unroll=True)
    alive = np.isfinite(np.asarray(yf)[:, :2]).all(1)
    assert alive.sum() >= 0.95*alive.size, alive.sum()
    assert np.abs(np.asarray(tab1.xy_poly)).max() < 1e-2


def test_zernike_sag_imprints_wavefront():
    """Closed loop through the analysis machinery: a thin ZernikeSag
    plate in collimated light ahead of an exactly stigmatic paraboloid
    mirror imprints OPD = (n-1) * sag, and GeometricTrace.zernike
    recovers the coefficient to the thin-plate approximation's
    accuracy (<0.1% for a half-micron figure)."""
    def build(z11):
        z = np.zeros(11)
        z[10] = z11
        s = ro.System([
            dict(material="air"),
            dict(type="zernike", zernike_coefficients=list(z),
                 norm_radius=8., distance=5.,
                 material="SCHOTT-BK|N-BK7", radius=9.),
            dict(distance=3., material="air", radius=9.),
            dict(roc=-400., conic=-1., distance=20.,
                 material="mirror", radius=12.),
            dict(distance=-200., radius=9.),
        ])
        s.object.pupil.radius = 8.
        s.object.pupil.update_radius = False
        s.update()
        t = ro.GeometricTrace(s)
        t.rays_point((0., 0.), nrays=128, distribution="hexapolar",
                     clip=False)
        coeff, _ = t.zernike(nterms=16)
        return np.asarray(coeff), s

    c0, _ = build(0.)
    assert np.abs(c0[1:]).max() < 1e-6  # stigmatic baseline
    c1, s = build(5e-4)
    d = c1 - c0
    lam = s.wavelengths[0]
    n = s[1].material.refractive_index(lam)
    expected = (n - 1)*5e-4/(lam/s.scale)
    nptest.assert_allclose(d[10], expected, rtol=1e-3)
    # nothing leaks into other non-piston/defocus modes
    other = np.delete(d, [0, 3, 10])
    assert np.abs(other).max() < 1e-3*expected


def test_sensitivity_xy_poly():
    """Tolerancing sensitivity covers the freeform coefficients:
    exact d(RMS)/d(xy_poly) plus the Hessian diagonal, routed through
    the statically specialized engine (the dynamic scan path's
    forward-over-reverse pass compiles pathologically on XLA:CPU for
    freeform rows)."""
    from rayopt_tpu.parallel.tolerancing import sensitivity
    s = _xysystem()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=32, distribution="hexapolar",
                 clip=False)
    tab = s.table()
    out = sensitivity(tab, np.asarray(t.y[0]), np.asarray(t.u[0]),
                      fields=("curvature", "xy_poly"))
    g = np.asarray(out["xy_poly"]["grad"])[1]
    h = np.asarray(out["xy_poly"]["hess"])[1]
    assert np.all(np.isfinite(g)) and np.all(np.isfinite(h))
    assert np.any(g[2:] != 0)
    # cross-check against the plain jax.grad of the same merit
    import jax
    from rayopt_tpu.parallel.grad import spot_rms
    specs = K.specialize(tab)
    y0 = jnp.asarray(t.y[0])
    u0 = jnp.asarray(t.u[0])
    gref = np.asarray(jax.grad(lambda xy: spot_rms(
        tab.replace(xy_poly=xy), y0, u0, specs=specs, unroll=True,
        nan_safe=False))(tab.xy_poly))[1]
    nptest.assert_allclose(g, gref, rtol=1e-9, atol=1e-12)
