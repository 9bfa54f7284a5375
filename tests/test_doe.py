"""Radial diffractive surfaces (kinoform / Zemax Binary 2).

No reference counterpart (quartiq/rayopt has no diffractive
surfaces); pinned against closed-form physics instead: the thin-DOE
focal law f = -pi R^2/(m lambda A_1) and its 1/lambda chromatic
scaling, the exact single-kick ray model on a plane, the local
linear-grating equivalence of the radial kick, unit emergent
directions, and hybrid refractive-diffractive achromatization.
Cross-engine: scan == specialized-unrolled == Pallas(interpret) ==
df32 parity.
"""

import numpy as np
import numpy.testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.ops.tables import make_table, is_anamorphic
from rayopt_tpu.ops.geometric import trace_rays_final
from rayopt_tpu.ops import df32

F0 = 100.
LAM0 = 550e-9
A1 = -np.pi/((LAM0/1e-3)*F0)  # phi = A1 rho^2 -> f = F0 at LAM0, R = 1


def kinoform(a1=A1, extra=(), angle=0.5):
    s = ro.System([
        dict(material="air"),
        dict(type="binary2", phase_coefficients=[a1] + list(extra),
             norm_radius=1., distance=5., material="air", radius=10.),
        dict(distance=F0, radius=10.),
    ], wavelengths=[LAM0], object=dict(
        angle_deg=angle, pupil=dict(radius=3., update_radius=False)))
    s.update()
    return s


def bundle(n=256, r=3., seed=0):
    rng = np.random.RandomState(seed)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*r
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    return y, u


def test_kinoform_focal_law():
    s = kinoform()
    f = s.paraxial.focal_length
    nptest.assert_allclose(abs(f), F0, rtol=1e-3)
    # strong DOE dispersion: f(lambda) = F0 LAM0/lambda exactly
    from rayopt_tpu.ops.paraxial import abcd_product
    for lam in (480e-9, 660e-9):
        m = np.asarray(abcd_product(s.table(lam), 1, 2))
        nptest.assert_allclose(-1./m[3, 1], F0*LAM0/lam, rtol=1e-12)


def test_kinoform_exact_ray_model():
    # plane + pure r^2 phase IN VACUUM (air's n = 1.000277 would fold
    # into the kick): the emergent ray is exactly
    # u' = (0, -y/f, sqrt(1 - (y/f)^2)) -- pin the traced image height
    s = ro.System([
        dict(material="vacuum"),
        dict(type="binary2", phase_coefficients=[A1], norm_radius=1.,
             distance=5., material="vacuum", radius=10.),
        dict(distance=F0, radius=10.),
    ], wavelengths=[LAM0])
    s.update()
    tab = s.table()
    n = 16
    y = np.zeros((n, 3))
    y[:, 1] = np.linspace(-5, 5, n)
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf, uf, _ = trace_rays_final(tab, y, u, biconic=True)
    sy = -y[:, 1]/F0
    expect = y[:, 1] + sy/np.sqrt(1 - sy**2)*F0
    nptest.assert_allclose(np.asarray(yf[:, 1]), expect, atol=1e-12)
    # emergent directions stay exactly unit
    nptest.assert_allclose(np.square(np.asarray(uf)).sum(-1), 1.,
                           atol=1e-12)


def test_zero_phase_and_order_are_snell():
    y, u = bundle()
    s = kinoform()
    tab = s.table()
    ref, _, _ = trace_rays_final(tab.replace(
        doe=np.zeros_like(np.asarray(tab.doe))), y, u, biconic=True)
    s0 = kinoform()
    s0[1].diffraction_order = 0
    nptest.assert_allclose(
        np.asarray(trace_rays_final(s0.table(), y, u)[0]),
        np.asarray(ref), atol=1e-14)


def test_local_linear_grating_equivalence():
    # at a point (0, y0) the radial kick IS a linear grating with
    # T = dpsi/dr: the two kernels must agree exactly
    import jax.numpy as jnp
    from rayopt_tpu.ops.kernels import refract_grating, _dpoly_even
    dd = jnp.asarray([A1*(550e-9/1e-3)/(2*np.pi), 3e-5])
    y1 = jnp.asarray([3.7])
    x1 = jnp.asarray([0.])
    ux, uy = jnp.asarray([0.05]), jnp.asarray([-.02])
    uz = jnp.sqrt(1 - ux**2 - uy**2)
    mu = jnp.asarray(1/1.5)
    e = _dpoly_even(y1*y1, dd)
    a = refract_grating(x1, y1, ux, uy, uz, mu, 0.,
                        jnp.zeros(1), jnp.zeros(1), doe=dd)
    b = refract_grating(x1, y1, ux, uy, uz, mu, e*y1,
                        jnp.zeros(1), jnp.zeros(1))
    for i in range(3):
        nptest.assert_allclose(np.asarray(a[i]), np.asarray(b[i]),
                               atol=1e-15)


@pytest.fixture(scope="module")
def hybrid():
    # curved glass substrate + higher-order phase + tilt-free stack:
    # exercises substrate normals under the kick
    s = ro.System([
        dict(material="air"),
        dict(type="binary2", roc=120., phase_coefficients=[A1, 1e-4],
             norm_radius=1., distance=5., material="glass/N-BK7",
             radius=10.),
        dict(roc=-150., distance=3., material="air", radius=10.),
        dict(distance=60., radius=10.),
    ], wavelengths=[LAM0])
    s.update()
    return s


def test_cross_engine_parity(hybrid):
    import jax.numpy as jnp
    from rayopt_tpu.ops.kernels import specialize
    from rayopt_tpu.ops.pallas_trace import pallas_trace_final
    tab = hybrid.table()
    assert is_anamorphic(tab)
    specs = specialize(tab)
    assert specs[1].doe and not specs[2].doe
    y, u = bundle()
    ys, _, _ = trace_rays_final(tab, y, u, biconic=True)
    yu, _, _ = trace_rays_final(tab, y, u, specs=specs, unroll=True)
    nptest.assert_allclose(np.asarray(yu), np.asarray(ys), atol=1e-12)
    n = y.shape[0]
    state = tuple(jnp.asarray(v) for v in
                  (y[:, 0], y[:, 1], y[:, 2],
                   u[:, 0], u[:, 1], u[:, 2]))
    out, _ = pallas_trace_final(tab, state, specs=specs, tile=128,
                                interpret=True)
    nptest.assert_allclose(np.asarray(out[0]), np.asarray(ys[:, 0]),
                           atol=1e-12)


def test_df32_parity(hybrid):
    tab = hybrid.table()
    y, u = bundle()
    yf = np.asarray(trace_rays_final(tab, y, u, biconic=True)[0])
    for fast in (False, True):
        steps = df32.plan(tab, fast=fast)
        out = df32.trace_df32_final(steps, df32.state_from_f64(y, u))
        err = np.nanmax(np.abs(df32.to_f64(out[0]) - yf[:, 0]))
        assert err < 1e-9, (fast, err)


def test_hybrid_achromat():
    # the classic single-element achromat: a weak kinoform (negative
    # Abbe ~ -3.45) cancels the BK7 singlet's axial color
    from rayopt_tpu.ops.paraxial import abcd_product

    def bfl(sys, lam):
        m = np.asarray(abcd_product(sys.table(lam), 1, len(sys) - 1))
        return -m[1, 1]/m[3, 1]

    def build(doe_f):
        pc = ([-np.pi/((LAM0/1e-3)*doe_f)] if doe_f else [])
        s = ro.System([
            dict(material="air"),
            dict(roc=54.4 if doe_f else 51.68, distance=4.,
                 material="glass/N-BK7", radius=10.),
            dict(type="binary2", distance=3., material="air",
                 radius=10., phase_coefficients=pc, norm_radius=1.),
            dict(distance=95., radius=10.),
        ], wavelengths=[LAM0])
        s.update()
        return s

    color = bfl(build(0), 480e-9) - bfl(build(0), 644e-9)
    hyb = build(1950.)
    color_h = bfl(hyb, 480e-9) - bfl(hyb, 644e-9)
    assert abs(color) > 1.         # mm of primary color in the singlet
    assert abs(color_h) < abs(color)/20.


def test_evanescent_kick_is_nan():
    # an absurdly strong phase gradient drives the tangential
    # frequency past the propagation circle: NaN, like TIR
    s = kinoform(a1=A1*3000.)
    y, u = bundle(n=64)
    yf, _, _ = trace_rays_final(s.table(), y, u, biconic=True)
    assert np.isnan(np.asarray(yf[:, 0])).any()


def test_yaml_round_trip():
    import rayopt_tpu.formats as fmt
    s = kinoform(extra=[2e-4])
    s[1].diffraction_order = 2
    y = fmt.system_to_yaml(s)
    assert "binary2" in y
    s2 = fmt.system_from_yaml(y)
    s2.update()
    assert s2[1].diffraction_order == 2
    nptest.assert_allclose(s2[1].phase_coefficients,
                           s[1].phase_coefficients)
    yb, ub = bundle(n=64)
    nptest.assert_allclose(
        np.asarray(trace_rays_final(s2.table(), yb, ub,
                                    biconic=True)[0]),
        np.asarray(trace_rays_final(s.table(), yb, ub,
                                    biconic=True)[0]), atol=1e-14)


def test_zmx_round_trip():
    from rayopt_tpu.io.zemax import system_to_zmx, zmx_to_system
    s = ro.System([
        dict(material="air"),
        dict(type="binary2", roc=120., distance=5.,
             material="1.51680/64.17", radius=10.,
             phase_coefficients=[A1, 5e-5], norm_radius=2.,
             aspherics=[0., 1e-6]),
        dict(roc=-150., distance=3., material="air", radius=10.),
        dict(distance=60., radius=10.),
    ], wavelengths=[LAM0])
    s.update()
    z = system_to_zmx(s)
    assert "TYPE BINARY_2" in z and "XDAT 2 2" in z
    s2 = zmx_to_system(z)
    s2.wavelengths = s.wavelengths
    s2.update()
    # SURF 0 maps onto the object row: s2[j] <-> s[j]
    e = s2[1]
    nptest.assert_allclose(e.phase_coefficients, [A1, 5e-5],
                           rtol=1e-12)
    nptest.assert_allclose(e.norm_radius, 2., rtol=1e-12)
    nptest.assert_allclose(e.aspherics, [0., 1e-6], rtol=1e-12)
    # whole-stack paraxial power round-trips (kick + substrate)
    from rayopt_tpu.ops.paraxial import abcd_product
    m1 = np.asarray(abcd_product(s.table(LAM0), 1, len(s) - 1))
    m2 = np.asarray(abcd_product(s2.table(LAM0), 1, len(s2) - 1))
    nptest.assert_allclose(m2[3, 1], m1[3, 1], rtol=1e-9)


def test_zmx_import_snippet():
    # a hand-written OpticStudio-style BINARY_2 surface block
    from rayopt_tpu.io.zemax import zmx_to_system
    z = """
UNIT MM X W X L X
ENPD 6
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE BINARY_2
  CURV 0.0
  PARM 2 1e-06
  XDAT 1 2
  XDAT 2 1.0
  XDAT 3 %.17g
  DISZ 100
SURF 2
  TYPE STANDARD
  DISZ 0
""" % A1
    s = zmx_to_system(z)
    s.wavelengths = [LAM0]
    s.update()
    e = s[1]  # SURF 0 is the object row
    nptest.assert_allclose(e.phase_coefficients[0], A1, rtol=1e-12)
    nptest.assert_allclose(e.aspherics[1], 1e-06, rtol=1e-12)
    from rayopt_tpu.ops.paraxial import abcd_product
    m = np.asarray(abcd_product(s.table(LAM0), 1, 2))
    nptest.assert_allclose(-1./m[3, 1], F0, rtol=1e-6)


def test_host_paraxial_matches_table_twin():
    s = kinoform(extra=[1e-4])
    from rayopt_tpu.ops.paraxial import abcd_matrices
    m_tab = np.asarray(abcd_matrices(s.table()))[1]
    n0 = s.refractive_index(LAM0, 0)
    n, m_el = s[1].paraxial_matrix(n0, LAM0)
    nptest.assert_allclose(m_el, m_tab, atol=1e-12)


@pytest.mark.slow
def test_ad_expansion_covers_doe():
    s = kinoform(angle=1.)
    e = ro.transverse_expansion(s)
    t = e.seidel_like()
    # an ideal-phase f/16 kinoform still has real-ray spherical
    # aberration (the r^2 phase is not an ideal lens at finite NA)
    assert np.isfinite(t["spherical"]) and abs(t["spherical"]) > 0


def test_hybrid_achromat_model():
    # the zoo model: golden EFL and the achromatization pin
    from rayopt_tpu.models import hybrid_achromat
    from rayopt_tpu.ops.paraxial import abcd_product
    s = hybrid_achromat()
    nptest.assert_allclose(abs(s.paraxial.focal_length[1]), 99.73,
                           rtol=1e-3)

    def bfl(lam):
        m = np.asarray(abcd_product(s.table(lam), 1, len(s) - 1))
        return -m[1, 1]/m[3, 1]

    assert abs(bfl(480e-9) - bfl(644e-9)) < 0.05


def test_rescale_and_reverse():
    s = kinoform()
    e = s[1]
    e.rescale(10.)
    nptest.assert_allclose(e.norm_radius, 10.)
    # phase coefficients are dimensionless in rho: power scales as
    # 1/R^2, i.e. focal length scales with the geometry
    s.scale = 1e-4
    s.update()
    f = s.paraxial.focal_length
    nptest.assert_allclose(abs(f), 10.*F0, rtol=1e-3)


def test_poly_rejects_doe():
    """The aberration-polynomial trace must reject (not silently
    substrate-trace) diffractive rows; the AD expansion is the
    documented alternative."""
    from rayopt_tpu.trace.poly import PolyTrace
    s = kinoform()
    with pytest.raises(NotImplementedError, match="binary2"):
        PolyTrace(s)


def test_reflective_zone_plate():
    """A flat mirror with a zone-plate phase focuses like a concave
    mirror of focal F0: real rays, the differentiable ABCD twin, and
    the host paraxial trace all agree on the first order."""
    from rayopt_tpu.ops.paraxial import abcd_matrices
    s = ro.System([
        dict(material="vacuum"),
        dict(type="binary2", phase_coefficients=[A1], norm_radius=1.,
             distance=50., material="mirror", radius=20.),
        dict(distance=-F0, radius=20.),
    ], wavelengths=[LAM0], object=dict(
        angle_deg=0.2, pupil=dict(radius=5., update_radius=False)))
    s.update()
    # real rays focus at the image plane
    y = np.zeros((8, 3))
    y[:, 1] = np.linspace(0.5, 5., 8)
    u = np.zeros((8, 3))
    u[:, 2] = 1.
    yf, _, _ = trace_rays_final(s.table(), y, u, biconic=True)
    assert np.abs(np.asarray(yf[:, 1])).max() < 1e-2  # aberration only
    # the table twin: marginal ray through gap/mirror/gap lands at 0
    m = np.asarray(abcd_matrices(s.table()))
    yn = np.array([1., 1., 0., 0.])
    for j in (1, 2):
        yn = m[j] @ yn
    nptest.assert_allclose(yn[1], 0., atol=1e-9)
    # host paraxial trace agrees (finite EFL magnitude F0)
    nptest.assert_allclose(np.abs(s.paraxial.focal_length), F0,
                           rtol=1e-6)


def test_doe_phase_enters_optical_path():
    """Fermat across the kinoform: the imprinted phase is optical
    path, so the focused wavefront is flat to the aberration residual
    (milliwaves) instead of carrying tens of waves of sphere."""
    from rayopt_tpu.parallel.grad import opd_rays
    s = kinoform(angle=0.)
    tab = s.table()
    n = 8
    y0 = np.zeros((n, 3))
    y0[:, 1] = np.linspace(0., 2.5, n)
    u0 = np.zeros((n, 3))
    u0[:, 2] = 1.
    o = np.asarray(opd_rays(tab, y0, u0, radius=-F0,
                            wavelength=LAM0, biconic=True))
    assert np.nanmax(np.abs(o - o[0])) < 0.02
    # and the df32 engine carries the identical optical path
    _, _, t64 = (np.asarray(a) for a in trace_rays_final(
        tab, y0, u0, biconic=True))
    _, tacc = df32.trace_df32_final(
        df32.plan(tab), df32.state_from_f64(y0, u0), with_path=True)
    nptest.assert_allclose(df32.to_f64(tacc), t64, atol=1e-10)
