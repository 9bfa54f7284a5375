"""Direct parity of the component-form kernels (ops.kernels) against
the (..., 3) oracle implementations (ops.surfaces)."""

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.ops import surfaces as S
from rayopt_tpu.ops import kernels as K


@pytest.fixture(params=[
    # curvature, conic, aspherics
    (0., 0., ()),
    (1/30., 0., ()),
    (1/25., -.7, ()),
    (-1/40., 2., ()),
    (1/50., -1., (1e-5, 1e-8)),
])
def surf(request):
    c, k, asp = request.param
    return c, k, np.asarray(asp, float).reshape(-1)


@pytest.fixture
def rays():
    rng = np.random.RandomState(0)
    n = 64
    y = rng.randn(n, 3)*2
    y[:, 2] = -8.
    u = np.zeros((n, 3))
    u[:, :2] = rng.uniform(-.1, .1, (n, 2))
    u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
    return y, u


def test_sag_normal(surf, rays):
    c, k, asp = surf
    y, u = rays
    sag_o = np.asarray(S.surface_sag(y, c, k, asp))
    sag_k = np.asarray(K.sag(y[:, 0], y[:, 1], y[:, 2], c, k, asp))
    nptest.assert_allclose(sag_k, sag_o, atol=1e-13)
    nrm_o = np.asarray(S.surface_normal(y, c, k, asp))
    e = np.asarray(K.normal_radial(y[:, 0], y[:, 1], c, k, asp))
    nptest.assert_allclose(y[:, 0]*e, nrm_o[:, 0], atol=1e-13)
    nptest.assert_allclose(y[:, 1]*e, nrm_o[:, 1], atol=1e-13)
    nptest.assert_allclose(nrm_o[:, 2], 1., atol=1e-13)


def test_intercept(surf, rays):
    c, k, asp = surf
    y, u = rays
    t_o = np.asarray(S.intercept(y, u, c, k, asp))
    t_k = np.asarray(K.intercept(y[:, 0], y[:, 1], y[:, 2],
                                 u[:, 0], u[:, 1], u[:, 2],
                                 c, k, asp, 0.))
    nptest.assert_allclose(t_k, t_o, atol=1e-11, equal_nan=True)


@pytest.mark.parametrize("mu", [1., 1/1.5, 1.5, -1.])
def test_refract(surf, rays, mu):
    c, k, asp = surf
    y, u = rays
    t = np.asarray(S.intercept(y, u, c, k, asp))
    p = y + t[:, None]*u
    u_o = np.asarray(S.refract(p, u, mu, c, k, asp))
    ux, uy, uz = K.refract(p[:, 0], p[:, 1], u[:, 0], u[:, 1],
                           u[:, 2], mu, c, k, asp)
    got = np.stack([np.asarray(ux), np.asarray(uy),
                    np.asarray(uz)], -1)
    nptest.assert_allclose(got, u_o, atol=1e-12, equal_nan=True)


def test_spec_step_matches_generic(surf, rays):
    """surface_step_spec on a synthesized spec row matches
    surface_step for each surface geometry."""
    import jax.tree_util as jtu
    from rayopt_tpu.ops.tables import make_table
    from rayopt_tpu.ops.kernels import specialize
    c, k, asp = surf
    y, u = rays
    kmax = max(1, asp.shape[0])
    tab = make_table(curvature=np.array([0., c]),
                     conic=np.array([0., k]),
                     aspherics=np.array(
                         [np.zeros(kmax),
                          np.pad(asp, (0, kmax - asp.shape[0]))]),
                     distance=np.array([0., 3.]),
                     mu=np.array([1., 1/1.5]),
                     n_before=np.array([1., 1.]),
                     n_after=np.array([1., 1.5]),
                     radius=np.array([np.inf, 4.]))
    row = jtu.tree_map(lambda a: a[1], tab)
    spec = specialize(tab)[1]
    state = (y[:, 0], y[:, 1], y[:, 2], u[:, 0], u[:, 1], u[:, 2])
    for clip in (False, True):
        sg, og = K.surface_step(state, row, clip)
        ss, os_ = K.surface_step_spec(state, row, spec, clip)
        for a, b in zip(jtu.tree_leaves((sg, og[:2], og[3])),
                        jtu.tree_leaves((ss, os_[:2], os_[3]))):
            nptest.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-11, equal_nan=True)


def test_intercept_conic_stable_near_flat():
    """The closed-form conic intercept must stay exact as c -> 0 (the
    stable-root selection): an optimizer nudging a flat row's
    curvature by 1e-12 used to blow the f32 double-Gauss spot RMS
    from 0.022 to 6.4 mm through -(d+g)/e cancellation."""
    import jax
    import jax.numpy as jnp
    from rayopt_tpu.models import double_gauss
    from rayopt_tpu.parallel.grad import spot_rms
    s = double_gauss()
    tab64 = s.table()
    tab32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tab64)
    n = 64
    rng = np.random.RandomState(0)
    y0 = np.zeros((n, 3), np.float32)
    y0[:, :2] = rng.uniform(-1, 1, (n, 2)).astype(np.float32)*11.
    u0 = np.zeros((n, 3), np.float32)
    u0[:, 2] = 1.
    w = np.ones(n, np.float32)/n
    base = float(spot_rms(tab32, y0, u0, w))
    for d in (1e-12, 1e-10, 1e-9):
        t2 = tab32.replace(curvature=tab32.curvature + np.float32(d))
        v = float(spot_rms(t2, y0, u0, w))
        assert abs(v - base) < 1e-3*max(base, 1e-6), (d, v, base)
    # per-ray oracle, f64, extreme near-flat curvature
    from rayopt_tpu.ops.surfaces import intercept_conic
    y = jnp.asarray([[0.3, -4., -5.]])
    u = jnp.asarray([[0.01, 0.02, np.sqrt(1 - .01**2 - .02**2)]])
    s_flat = float(intercept_conic(y, u, 0., 0., 0.)[0])
    for c in (1e-15, 1e-12, 1e-9):
        s_c = float(intercept_conic(y, u, c, 0., 0.)[0])
        np.testing.assert_allclose(s_c, s_flat, rtol=1e-7)
