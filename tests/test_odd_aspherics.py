"""Odd-aspheric surfaces (Zemax ODDASPHE): sag/normal consistency,
intercepts, engine parity, importer routing, serialization.

The odd figure sum_j o_j * r**(2j+1) is beyond the reference
(quartiq/rayopt supports even aspherics only, reference
elements.py:440-501); conventions follow the Zemax odd-asphere sag
z = conic + sum_i beta_i rho**i with even powers routed to the
existing even array.
"""

import io
import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.ops import surfaces as S
from rayopt_tpu.ops import kernels as K
from rayopt_tpu.elements import Spheroid
from rayopt_tpu.system import System
from rayopt_tpu.materials import air


C, KAPPA = 1/40., -.5
ODD = np.array([0., 2e-4, -3e-7])   # r^1 (off: cusp), r^3, r^5
EVEN = np.array([0., 1e-6])


def _rays(n=128, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randn(n, 3)*3
    y[:, 2] = -10.
    u = np.zeros((n, 3))
    u[:, :2] = rng.uniform(-.08, .08, (n, 2))
    u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
    return y, u


def test_sag_matches_direct_sum():
    r = np.linspace(.1, 8., 17)
    xyz = np.stack([r, np.zeros_like(r), np.zeros_like(r)], -1)
    got = -np.asarray(S.surface_sag(xyz, C, KAPPA, EVEN, ODD))
    want = C*r**2/(1 + np.sqrt(1 - (1 + KAPPA)*C**2*r**2))
    want += EVEN[0]*r**2 + EVEN[1]*r**4
    want += ODD[0]*r + ODD[1]*r**3 + ODD[2]*r**5
    nptest.assert_allclose(got, want, rtol=1e-12)


def test_normal_is_sag_gradient():
    """The (x*e, y*e, 1) normal must be the gradient of the sag
    function (finite-difference check, off-axis points)."""
    rng = np.random.RandomState(3)
    pts = rng.uniform(-6, 6, (32, 3))
    eps = 1e-6

    def sag(p):
        return np.asarray(S.surface_sag(p, C, KAPPA, EVEN, ODD))

    n = np.asarray(S.surface_normal(pts, C, KAPPA, EVEN, ODD))
    for axis in range(3):
        d = np.zeros(3)
        d[axis] = eps
        fd = (sag(pts + d) - sag(pts - d))/(2*eps)
        nptest.assert_allclose(n[:, axis], fd, rtol=1e-5, atol=1e-7)


def test_intercept_lands_on_surface():
    y, u = _rays()
    t = np.asarray(S.intercept(y, u, C, KAPPA, EVEN,
                               aspherics_odd=ODD))
    assert np.isfinite(t).all()
    p = y + t[:, None]*u
    res = np.asarray(S.surface_sag(p, C, KAPPA, EVEN, ODD))
    nptest.assert_allclose(res, 0., atol=1e-9)


def test_component_kernels_match_oracle():
    y, u = _rays(seed=1)
    t_o = np.asarray(S.intercept(y, u, C, KAPPA, EVEN,
                                 aspherics_odd=ODD))
    t_k = np.asarray(K.intercept(y[:, 0], y[:, 1], y[:, 2],
                                 u[:, 0], u[:, 1], u[:, 2],
                                 C, KAPPA, EVEN, 0.,
                                 aspherics_odd=ODD))
    nptest.assert_allclose(t_k, t_o, atol=1e-11)
    p = y + t_o[:, None]*u
    mu = 1/1.52
    u_o = np.asarray(S.refract(p, u, mu, C, KAPPA, EVEN, ODD))
    ux, uy, uz = K.refract(p[:, 0], p[:, 1], u[:, 0], u[:, 1],
                           u[:, 2], mu, C, KAPPA, EVEN,
                           aspherics_odd=ODD)
    got = np.stack([np.asarray(c) for c in (ux, uy, uz)], -1)
    nptest.assert_allclose(got, u_o, atol=1e-12)


def _odd_singlet():
    s = System(description="odd-asphere singlet")
    s.append(Spheroid(material=air, radius=8.))
    s.append(Spheroid(distance=10., curvature=C, conic=KAPPA,
                      aspherics=list(EVEN), aspherics_odd=list(ODD),
                      material="schott-sk|n-sk16", radius=8.))
    s.append(Spheroid(distance=4., curvature=-C/2, material=air,
                      radius=8.))
    s.append(Spheroid(distance=60., material=None, radius=8.))
    s.wavelengths = [587.56e-9]
    return s


def test_engine_parity_odd_singlet():
    """scan engine == unrolled+specs engine == per-element host path
    on an odd-aspheric singlet."""
    from rayopt_tpu.ops.geometric import trace_rays
    from rayopt_tpu.ops.kernels import specialize
    s = _odd_singlet()
    tab = s.table()
    rng = np.random.RandomState(7)
    n = 64
    y0 = np.zeros((n, 3))
    y0[:, :2] = rng.uniform(-4, 4, (n, 2))
    u0 = np.zeros((n, 3))
    u0[:, :2] = rng.uniform(-.05, .05, (n, 2))
    u0[:, 2] = np.sqrt(1 - np.square(u0[:, :2]).sum(1))
    ys, us, _, ts = (np.asarray(a) for a in
                     trace_rays(tab, y0, u0))
    ys2, us2, _, _ = (np.asarray(a) for a in
                      trace_rays(tab, y0, u0,
                                 specs=specialize(tab), unroll=True))
    nptest.assert_allclose(ys2, ys, atol=1e-10)
    nptest.assert_allclose(us2, us, atol=1e-10)
    # host per-element oracle: straight system, so each step is
    # offset-subtract then the element's local propagate
    y, u = y0.copy(), u0.copy()
    n0 = s.refractive_index(s.wavelengths[0], 0)
    for j, e in enumerate(s[1:], 1):
        y, u, n0, _ = e.propagate(y - e.offset, u, n0,
                                  s.wavelengths[0], clip=False)
        nptest.assert_allclose(y, ys[j], atol=1e-9)
        nptest.assert_allclose(u, us[j], atol=1e-9)


def test_fast_trace_parity_with_odd():
    """trace_rays_final_fast parity path on odd-aspheric tables: the
    df32 engine covers odd figures on TPU; on the CPU backend (this
    test) it falls back to the f64 engine -- either way the result
    matches trace_rays_final."""
    from rayopt_tpu.ops.geometric import (trace_rays_final,
                                          trace_rays_final_fast)
    s = _odd_singlet()
    tab = s.table()
    y0 = np.zeros((128, 3))
    y0[:, 0] = np.linspace(-4, 4, 128)
    u0 = np.zeros((128, 3))
    u0[:, 2] = 1.
    yf, uf, tf = trace_rays_final_fast(tab, y0, u0,
                                       precision="parity")
    yr, ur, tr = trace_rays_final(tab, y0, u0)
    nptest.assert_allclose(np.asarray(yf), np.asarray(yr), atol=1e-12)
    nptest.assert_allclose(np.asarray(tf), np.asarray(tr), atol=1e-12)


def test_df32_supports_odd():
    """Odd-aspheric figures run in the df32 parity engine (Newton
    polish against the full sag, vertex cusp floored)."""
    from rayopt_tpu.ops import df32
    from rayopt_tpu.ops.geometric import trace_rays_final
    s = _odd_singlet()
    s.update()
    tab = s.table()
    n = 256
    rng = np.random.default_rng(9)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*3.
    u = np.tile([0., 0., 1.], (n, 1))
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    for fast in (False, True):
        steps = df32.plan(tab, fast=fast)
        out = df32.trace_df32_final(steps, df32.state_from_f64(y, u))
        good = np.isfinite(yf[:, 0])
        assert good.sum() > n//2
        nptest.assert_allclose(df32.to_f64(out[0])[good], yf[good, 0],
                               atol=1e-10)
        nptest.assert_allclose(df32.to_f64(out[1])[good], yf[good, 1],
                               atol=1e-10)


def test_poly_rejects_odd():
    from rayopt_tpu.trace.poly import PolyTrace
    s = _odd_singlet()
    s.update()
    with pytest.raises(NotImplementedError):
        PolyTrace(s, kmax=3)


def test_zmx_oddasphe_routing():
    from rayopt_tpu.io.zemax import zmx_to_system
    zmx = "\n".join([
        "UNIT MM",
        "SURF 0",
        "SURF 1",
        "  TYPE ODDASPHE",
        "  CURV 0.025",
        "  PARM 1 0.0",
        "  PARM 2 1E-05",
        "  PARM 3 2E-06",
        "  PARM 4 3E-08",
        "  PARM 5 4E-09",
        "  DISZ 5",
        "SURF 2",
        "  TYPE EVENASPH",
        "  PARM 2 7E-06",
        "  DISZ 50",
    ])
    s = zmx_to_system(zmx)
    e1 = s[1]   # SURF 0 maps onto the object row
    # odd powers r^3, r^5 -> aspherics_odd[1], [2]
    nptest.assert_allclose(e1.aspherics_odd, [0., 2e-6, 4e-9])
    # even powers r^2, r^4 -> aspherics[0], [1]
    nptest.assert_allclose(e1.aspherics, [1e-5, 3e-8])
    # plain even asphere: PARM i -> r^(2i)
    nptest.assert_allclose(s[2].aspherics, [0., 7e-6])


def test_yaml_roundtrip_odd():
    from rayopt_tpu.formats import system_to_yaml, system_from_yaml
    s = _odd_singlet()
    s2 = system_from_yaml(system_to_yaml(s))
    nptest.assert_allclose(s2[1].aspherics_odd, ODD)
    nptest.assert_allclose(s2[1].aspherics, EVEN)
    t1, t2 = s.table(), s2.table()
    nptest.assert_allclose(np.asarray(t2.aspherics_odd),
                           np.asarray(t1.aspherics_odd))


def test_rescale_reverse_consistency():
    e = Spheroid(curvature=C, conic=KAPPA, aspherics=list(EVEN),
                 aspherics_odd=list(ODD), material=1.5, radius=8.,
                 distance=3.)
    r = np.array([0., 2.5, 0.])
    scale = 2.
    sag0 = e.surface_sag(r)
    e.rescale(scale)
    sag1 = e.surface_sag(r*scale)
    # lengths scale linearly: sag(scale*r) = scale*sag(r/1)
    nptest.assert_allclose(sag1, scale*sag0, rtol=1e-12)
    e2 = Spheroid(curvature=C, aspherics_odd=list(ODD), material=1.5)
    e2.reverse()
    e2.reverse()
    nptest.assert_allclose(e2.aspherics_odd, ODD)
