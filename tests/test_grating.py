"""Diffraction gratings: the vector grating equation, order-zero
Snell equivalence, dispersion, and engine parity."""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.ops import kernels as K
from rayopt_tpu.ops.tables import is_anamorphic


def _grating_system(freq=600., order=1, mirror=False, curvature=0.):
    grating = dict(type="grating", grating_frequency=freq,
                   grating_order=order, distance=20.,
                   material=("mirror" if mirror else "air"),
                   radius=30.)
    if curvature:
        grating["curvature"] = curvature
    rows = [dict(material="air"), grating,
            dict(distance=(-50. if mirror else 50.), radius=100.)]
    s = ro.System(rows, wavelengths=[500e-9])
    s.object.pupil.radius = 5.
    s.object.pupil.update_radius = False
    s.update()
    return s


def test_plane_grating_equation():
    """Transmission grating at normal incidence: sin(theta_m) =
    m lambda G for several orders."""
    lam_mm = 500e-9/1e-3
    G = 600.
    for m in (0, 1, -1, 2):
        s = _grating_system(order=m)
        g = ro.GeometricTrace(s)
        y0 = np.zeros((1, 3))
        u0 = np.array([[0., 0., 1.]])
        g.rays_given(y0, u0)
        g.propagate()
        u = g.u[1][0]
        n2 = abs(float(np.asarray(s.table(500e-9).n_after)[1]))
        nptest.assert_allclose(u[1], m*lam_mm*G/n2, rtol=1e-12,
                               atol=1e-15)
        nptest.assert_allclose(np.linalg.norm(u), 1., rtol=1e-12)
        nptest.assert_allclose(u[0], 0., atol=1e-15)


def test_grating_equation_oblique_and_mirror():
    """General invariant at a hit point P with unit normal n:
    (n2 u' - n1 u - m lambda G q) is parallel to n, with q the unit
    groove-dispersion vector; holds for skew incidence and for a
    reflection grating on a curved substrate."""
    lam_mm = 500e-9/1e-3
    G, m = 600., 1
    for mirror, curv in ((False, 0.), (True, 0.), (True, -.002)):
        s = _grating_system(freq=G, order=m, mirror=mirror,
                            curvature=curv)
        rng = np.random.default_rng(4)
        y0 = np.zeros((6, 3))
        y0[:, :2] = rng.uniform(-4, 4, (6, 2))
        u0 = np.tile([0., 0., 1.], (6, 1))
        u0[:, :2] = rng.uniform(-.1, .1, (6, 2))
        u0 /= np.linalg.norm(u0, axis=1, keepdims=True)
        g = ro.GeometricTrace(s)
        g.rays_given(y0, u0)
        g.propagate()
        el = s[1]
        pts = g.y[1]
        nrm = np.array(el.surface_normal(pts))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        tab = s.table(500e-9)
        n1 = abs(float(np.asarray(tab.n_before)[1]))
        n2 = abs(float(np.asarray(tab.n_after)[1]))
        for i in range(6):
            n = nrm[i]
            q = np.array([0., 1., 0.]) - n[1]*n
            q /= np.linalg.norm(q)
            resid = (n2*g.u[1][i] - n1*g.i[1][i] - m*lam_mm*G*q)
            # parallel to n: zero cross product
            nptest.assert_allclose(np.cross(resid, n), 0., atol=1e-10)
            nptest.assert_allclose(np.linalg.norm(g.u[1][i]), 1.,
                                   rtol=1e-12)


def test_zero_order_is_snell():
    """Order 0 on a refractive substrate equals the plain Spheroid."""
    s0 = ro.System([
        dict(material="air"),
        dict(roc=80., distance=20., material="SCHOTT-BK|N-BK7",
             radius=30.),
        dict(distance=5., material="air", radius=30.),
        dict(distance=50., radius=100.)], wavelengths=[500e-9])
    s1 = ro.System([
        dict(material="air"),
        dict(type="grating", grating_frequency=600.,
             grating_order=0, roc=80., distance=20.,
             material="SCHOTT-BK|N-BK7", radius=30.),
        dict(distance=5., material="air", radius=30.),
        dict(distance=50., radius=100.)], wavelengths=[500e-9])
    for s in (s0, s1):
        s.object.pupil.radius = 5.
        s.object.pupil.update_radius = False
        s.update()
    rng = np.random.default_rng(8)
    y0 = np.zeros((8, 3))
    y0[:, :2] = rng.uniform(-4, 4, (8, 2))
    u0 = np.tile([0., 0., 1.], (8, 1))
    g0, g1 = ro.GeometricTrace(s0), ro.GeometricTrace(s1)
    for g, s in ((g0, s0), (g1, s1)):
        g.rays_given(y0, u0)
        g.propagate()
    nptest.assert_allclose(g1.y[-1], g0.y[-1], rtol=1e-12, atol=1e-12)


def test_grating_disperses_wavelengths():
    """The per-wavelength tables carry their own grating term: red
    diffracts farther than blue."""
    s = _grating_system()
    s.wavelengths = [450e-9, 650e-9]
    s.update()
    heights = []
    for lam in s.wavelengths:
        ys, us, iis, ts = s.trace_table(
            np.zeros((1, 3)), np.array([[0., 0., 1.]]), lam)
        heights.append(ys[-1, 0, 1])
    assert heights[1] > heights[0] > 0


def test_grating_engine_parity_and_rejections():
    s = _grating_system(curvature=-.001, mirror=True)
    tab = s.table()
    assert is_anamorphic(tab)  # extended-vocabulary flag
    from rayopt_tpu.ops.geometric import trace_rays
    from rayopt_tpu.ops.kernels import specialize
    rng = np.random.default_rng(2)
    y0 = np.zeros((8, 3))
    y0[:, :2] = rng.uniform(-3, 3, (8, 2))
    u0 = np.tile([0., 0., 1.], (8, 1))
    a = trace_rays(tab, y0, u0, biconic=True)
    b = trace_rays(tab, y0, u0, specs=specialize(tab), unroll=True)
    for va, vb in zip(a, b):
        nptest.assert_allclose(np.asarray(vb), np.asarray(va),
                               rtol=1e-10, atol=1e-10)
    # df32 parity-grade engine covers grating rows (concave mirror
    # grating: conic substrate normal + grating solve in df32)
    from rayopt_tpu.ops import df32
    from rayopt_tpu.ops.geometric import trace_rays_final
    n = 256
    y = np.zeros((n, 3))
    y[:, :2] = np.random.default_rng(3).uniform(-1, 1, (n, 2))*3.
    u = np.tile([0., 0., 1.], (n, 1))
    yf = np.asarray(trace_rays_final(tab, y, u, biconic=True)[0])
    steps = df32.plan(tab)
    out = df32.trace_df32_final(steps, df32.state_from_f64(y, u))
    good = np.isfinite(yf[:, 0])
    assert good.sum() > n//2
    nptest.assert_allclose(df32.to_f64(out[0])[good], yf[good, 0],
                           atol=1e-9)
    nptest.assert_allclose(df32.to_f64(out[1])[good], yf[good, 1],
                           atol=1e-9)
    # a refractive grating system with a real ghost pair refuses to
    # unfold the grating row
    sg = ro.System([
        dict(material="air"),
        dict(type="grating", grating_frequency=600., roc=80.,
             distance=20., material="SCHOTT-BK|N-BK7", radius=30.),
        dict(distance=5., material="air", radius=30.),
        dict(distance=50., radius=100.)], wavelengths=[500e-9])
    sg.object.pupil.radius = 5.
    sg.object.pupil.update_radius = False
    sg.update()
    from rayopt_tpu.ghosts import ghost_table
    with pytest.raises(NotImplementedError):
        ghost_table(sg)


def test_grating_yaml_round_trip():
    s = _grating_system(freq=1200., order=-1)
    s2 = ro.system_from_yaml(ro.system_to_yaml(s))
    s2.update()
    from rayopt_tpu.elements import Grating
    el = s2[1]
    assert isinstance(el, Grating)
    nptest.assert_allclose(el.grating_frequency, 1200.)
    assert el.grating_order == -1
    nptest.assert_allclose(np.asarray(s2.table().grating_dy),
                           np.asarray(s.table().grating_dy))


def test_evanescent_order_vignettes():
    """An order beyond the grating horizon produces NaN rays."""
    s = _grating_system(freq=600., order=4)  # 4*0.5um*600/mm = 1.2
    g = ro.GeometricTrace(s)
    g.rays_given(np.zeros((1, 3)), np.array([[0., 0., 1.]]))
    g.propagate()
    assert np.isnan(g.u[1][0]).all()


def test_zmx_dgrating_round_trip():
    """TYPE DGRATING (PARM 1 = lines/um, PARM 2 = order) imports to
    a Grating and survives the .zmx writer round trip."""
    from rayopt_tpu.io.zemax import zmx_to_system, system_to_zmx
    from rayopt_tpu.elements import Grating
    zmx = "\n".join([
        "VERS 1.0", "UNIT MM X W X", "WAVL 0.55",
        "SURF 0", "  TYPE STANDARD", "  DISZ 20.0",
        "SURF 1",
        "  TYPE DGRATING",
        "  CURV 0.0025",
        "  PARM 1 0.6",
        "  PARM 2 -1",
        "  DISZ 50.0",
        "  GLAS MIRROR",
        "  DIAM 30",
        "SURF 2", "  TYPE STANDARD", "  DISZ -100.0", "  DIAM 60",
    ])
    s = zmx_to_system(zmx)
    el = s[1]
    assert isinstance(el, Grating)
    # 0.6 lines/um on a mm-scaled system = 600 lines/mm
    nptest.assert_allclose(el.grating_frequency, 600.)
    assert el.grating_order == -1
    s2 = zmx_to_system(system_to_zmx(s))
    el2 = next(e for e in s2 if isinstance(e, Grating))
    nptest.assert_allclose(el2.grating_frequency,
                           el.grating_frequency)
    assert el2.grating_order == el.grating_order


def test_poly_trace_rejects_gratings():
    s = _grating_system()
    with pytest.raises(NotImplementedError):
        ro.PolyTrace(s, 3)
    from rayopt_tpu.ops.poly_jax import poly_trace_table
    with pytest.raises(NotImplementedError):
        poly_trace_table(s.table(), None, 3, 10.)

@pytest.mark.slow
def test_blaze_efficiency_scalar_model():
    """The scalar blaze model: unit efficiency at the blaze order,
    exact energy conservation over all orders, and the Littrow blaze
    wavelength lambda_B = 2 d sin(theta_B)/m at normal playback."""
    from rayopt_tpu.gratings import blaze_efficiency, blaze_order
    freq, blaze = 600., 8.6  # lines/mm, degrees
    d = 1./freq              # mm
    m = 1
    # Littrow playback (incidence = blaze angle):
    # m lambda_B = 2 d sin(theta_B)
    lam_b = 2*d*np.sin(np.deg2rad(blaze))/m*1e-3  # -> meters
    # peak of order 1 sits at the blaze wavelength with eta = 1
    nptest.assert_allclose(
        blaze_order(lam_b, freq, blaze, incidence_deg=blaze), 1.,
        rtol=1e-12)
    nptest.assert_allclose(
        blaze_efficiency(1, lam_b, freq, blaze, incidence_deg=blaze),
        1., rtol=1e-12)
    # scan wavelengths: argmax of eta_1 is at lam_b
    lams = np.linspace(.7, 1.3, 601)*lam_b
    eta1 = blaze_efficiency(1, lams, freq, blaze,
                            incidence_deg=blaze)
    assert abs(lams[np.argmax(eta1)] - lam_b) < .002*lam_b
    # energy conservation: sum_m sinc^2(m - x) == 1 over all integer
    # orders (the truncated tail decays as 2/(pi^2 K))
    orders = np.arange(-4000, 4001)
    tot = blaze_efficiency(orders[:, None], lams[None, :], freq,
                           blaze, incidence_deg=blaze).sum(0)
    nptest.assert_allclose(tot, 1., rtol=1e-4)
    # zero order is strongly suppressed at blaze
    assert blaze_efficiency(0, lam_b, freq, blaze,
                            incidence_deg=blaze) < 1e-25
    # off-blaze: order 1 loses to the shoulders, eta still <= 1
    assert np.all(eta1 <= 1.)
    assert eta1[0] < .9


def test_grating_element_efficiency_and_yaml():
    """Grating.blaze_deg drives the element's efficiency and survives
    serialization; unblazed gratings report unit efficiency."""
    import rayopt_tpu.formats as formats
    from rayopt_tpu.elements import Grating
    s = _grating_system()
    g = next(e for e in s if isinstance(e, Grating))
    nptest.assert_allclose(g.efficiency(500e-9), 1.)
    g.blaze_deg = 9.
    e1 = g.efficiency(np.sin(np.deg2rad(18.))/600.*1e-3)
    nptest.assert_allclose(e1, 1., rtol=1e-12)
    s2 = formats.system_from_yaml(formats.system_to_yaml(s))
    g2 = next(e for e in s2 if isinstance(e, Grating))
    nptest.assert_allclose(g2.blaze_deg, 9.)


def test_simulate_image_orders_weights():
    """The per-order spectrograph image: a blazed grating weights the
    orders by the scalar efficiency (order 1 dominant at blaze), and
    the total flux matches the sum of the per-order simulations."""
    from rayopt_tpu.models import spectrograph
    from rayopt_tpu.imaging import simulate_image_orders, simulate_image
    from rayopt_tpu.gratings import order_weights
    from rayopt_tpu.elements import Grating
    s = spectrograph()
    g = next(e for e in s if isinstance(e, Grating))
    # blaze for order 1 at 550 nm at normal incidence:
    # lambda_B = d sin(2 theta_B)
    g.blaze_deg = float(np.rad2deg(np.arcsin(550e-9*600./1e-3))/2)
    lam = (550e-9,)
    eta = order_weights(g, lam, (0, 1, 2), scale=s.scale)
    assert eta[1, 0] > .99 and eta[0, 0] < 1e-6
    H = W = 48
    scene = np.zeros((H, W))
    scene[H//2, W//2] = 1.
    img = simulate_image_orders(s, scene, 20., orders=(0, 1, 2),
                                wavelengths=lam, npatches=1,
                                nrays=200, psf_size=32)
    assert img.shape == (H, W)
    # the blazed order-1 image alone reproduces it (others cut off)
    img1 = simulate_image(s, scene, 20., wavelength=lam[0],
                          npatches=1, nrays=200, psf_size=32)
    nptest.assert_allclose(img, eta[1, 0]*img1, rtol=1e-6, atol=1e-9)
    # the element's traced order is restored
    assert g.grating_order == 1
