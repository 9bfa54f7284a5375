"""Double-single (df32) arithmetic and the extended-precision trace.

The error-free transforms require the compiler to emit rounded f32
mul/add exactly as written.  XLA's fusion contracts products feeding
the renormalization sums into exact fused multiply-adds (on CPU and
TPU), silently degrading the lo words -- so these tests run the
arithmetic eagerly and the trace through the Pallas kernel
(interpret mode on CPU), which is the load-bearing configuration on
the real TPU too.  Real-TPU parity is additionally verified inside
bench.py on every benchmark run.
"""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu  # noqa: F401
from rayopt_tpu.ops import df32
from rayopt_tpu.ops.geometric import trace_rays_final
from rayopt_tpu.models import double_gauss, cooke_triplet


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _err(got, truth):
    return np.abs((df32.to_f64(got) - truth) /
                  np.maximum(np.abs(truth), 1e-300)).max()


def test_representation_roundtrip(rng):
    x = rng.uniform(-1e6, 1e6, 1000)
    a = df32.from_f64(x)
    # hi+lo recovers float64 to ~2^-48 relative
    assert np.abs((df32.to_f64(a) - x)/x).max() < 2**-46


def test_arithmetic_accuracy(rng):
    a64 = rng.uniform(1e-2, 100, 2000)*rng.choice([-1, 1], 2000)
    b64 = rng.uniform(.01, 100, 2000)
    A, B = df32.from_f64(a64), df32.from_f64(b64)
    # additive results are accurate relative to the operand scale
    scale = np.maximum(np.abs(a64), np.abs(b64))
    for got, truth in ((df32.add(A, B), a64 + b64),
                       (df32.sub(A, B), a64 - b64)):
        assert (np.abs(df32.to_f64(got) - truth)/scale).max() < 1e-13
    assert _err(df32.mul(A, B), a64*b64) < 1e-13
    assert _err(df32.sqr(A), a64*a64) < 1e-13
    assert _err(df32.div(A, B), a64/b64) < 1e-13
    assert _err(df32.sqrt(B), np.sqrt(b64)) < 1e-13


def test_cancellation(rng):
    """(a + small) - a recovers small to the df32 precision of the
    LARGE operand (abs error ~ a * 2^-48)."""
    a64 = rng.uniform(1, 2, 1000)
    s64 = rng.uniform(-1e-6, 1e-6, 1000)
    A, S = df32.from_f64(a64), df32.from_f64(s64)
    got = df32.to_f64(df32.sub(df32.add(A, S), A))
    nptest.assert_allclose(got, s64, atol=1e-13)


def test_sqrt_nan_deliberate():
    a = df32.from_f64(np.array([-1., 4.]))
    hi, lo = df32.sqrt(a)
    assert np.isnan(np.asarray(hi)[0])
    assert np.asarray(hi)[1] == 2.


def test_trace_parity_tilted_decentered(rng):
    """General tilts (full df32 3x3 rotation) and decenters match the
    f64 engine."""
    s = cooke_triplet()
    s[2].angles = (.05, -.02, 0.)
    s[4].direction = (.01, 0., 1.)
    tab = s.table()
    n = 512
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*4.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    out = df32.trace_df32_final(df32.plan(tab),
                                df32.state_from_f64(y, u))
    xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
    good = np.isfinite(yf[:, 0])
    assert good.sum() > n//2
    nptest.assert_allclose(xd[good], yf[good, 0], atol=1e-9)
    nptest.assert_allclose(yd[good], yf[good, 1], atol=1e-9)


def test_trace_clip(rng):
    """plan(clip=True) NaNs rays outside each aperture like the f64
    engine (edge membership decided at f32)."""
    s = cooke_triplet()
    tab = s.table()
    n = 512
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*7.   # overfills the stop
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u, clip=True)[0])
    good64 = np.isfinite(yf[:, 0])
    assert 0 < good64.sum() < n
    out = df32.trace_df32_final(df32.plan(tab, clip=True),
                                df32.state_from_f64(y, u))
    xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
    gooddf = np.isfinite(xd)
    # membership may differ only for rays within f32 eps of an edge
    assert (good64 != gooddf).mean() < .01
    both = good64 & gooddf
    nptest.assert_allclose(xd[both], yf[both, 0], atol=1e-9)
    nptest.assert_allclose(yd[both], yf[both, 1], atol=1e-9)


def test_trace_parity_conic_aspheric(rng):
    """Conic + even-aspheric surfaces (Newton-polished intercept in
    df32) match the f64 engine."""
    s = double_gauss()
    s[2].conic = -.7
    s[5].conic = .4
    s[7].aspherics = [0., 1.2e-7, -3e-11]
    s.update()
    tab = s.table()
    n = 512
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*8.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    out = df32.trace_df32_final(df32.plan(tab),
                                df32.state_from_f64(y, u))
    xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
    good = np.isfinite(yf[:, 0])
    assert good.sum() > n//2
    nptest.assert_allclose(xd[good], yf[good, 0], atol=1e-9)
    nptest.assert_allclose(yd[good], yf[good, 1], atol=1e-9)


def test_trace_parity_mirror(rng):
    """Axial mirror systems (parabolic primary) trace in df32."""
    from rayopt_tpu.models import parabolic_mirror
    s = parabolic_mirror()
    tab = s.table()
    n = 256
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*40.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    out = df32.trace_df32_final(df32.plan(tab),
                                df32.state_from_f64(y, u))
    xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
    good = np.isfinite(yf[:, 0])
    assert good.sum() > n//2
    nptest.assert_allclose(xd[good], yf[good, 0], atol=1e-9)
    nptest.assert_allclose(yd[good], yf[good, 1], atol=1e-9)


@pytest.mark.parametrize("model", [double_gauss, cooke_triplet])
def test_trace_parity_vs_f64(model, rng):
    """The eager df32 trace agrees with the f64 engine to ~1e-12 per
    ray and far beyond the 1e-9 spot-RMS parity target.

    Eager (not jitted, not interpret-mode Pallas) because on the CPU
    backend XLA fusion contracts the error-free transforms (see module
    docstring); the real-TPU Pallas kernel is exercised by bench.py."""
    s = model()
    tab = s.table()
    n = 1024
    rim = 11.6 if model is double_gauss else 5.
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*rim*.85
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    steps = df32.plan(tab)
    out = df32.trace_df32_final(steps, df32.state_from_f64(y, u))
    xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
    good = np.isfinite(yf[:, 0])
    assert good.sum() > n//2
    nptest.assert_allclose(xd[good], yf[good, 0], atol=1e-10)
    nptest.assert_allclose(yd[good], yf[good, 1], atol=1e-10)

    def rms(px, py):
        return np.sqrt(((px - px.mean())**2 + (py - py.mean())**2).mean())

    r64 = rms(yf[good, 0], yf[good, 1])
    rdf = rms(xd[good], yd[good])
    assert abs(rdf - r64)/r64 < 1e-11


def test_path_accumulation(rng):
    """with_path returns the optical path at df32 precision."""
    s = double_gauss()
    tab = s.table()
    n = 256
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*8.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    _, _, t64 = (np.asarray(a) for a in trace_rays_final(tab, y, u))
    steps = df32.plan(tab)
    state, tacc = df32.trace_df32_final(
        steps, df32.state_from_f64(y, u), with_path=True)
    nptest.assert_allclose(df32.to_f64(tacc), t64, rtol=1e-12)


def test_fast_dispatcher_precision_kinds(rng):
    """trace_rays_final_fast(precision=...) falls back sensibly on
    CPU (parity -> native f64) and rejects nothing."""
    from rayopt_tpu.ops.geometric import trace_rays_final_fast
    s = double_gauss()
    tab = s.table()
    n = 128
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*8.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    y64, u64, t64 = (np.asarray(a) for a in trace_rays_final(tab, y, u))
    for precision in ("fast", "parity"):
        yf, uf, tf = (np.asarray(a) for a in trace_rays_final_fast(
            tab, y, u, precision=precision))
        nptest.assert_allclose(yf, y64, atol=1e-9)
        nptest.assert_allclose(tf, t64, atol=1e-9)


@pytest.mark.slow
def test_multi_plan_matches_single(rng):
    """The polychromatic df32 trace equals per-plan single traces
    (eager) and the multi-output Pallas kernel wires its outputs to
    the right wavelengths (interpret mode, f32-level check)."""
    s = double_gauss()
    plans = [df32.plan(s.table(l)) for l in s.wavelengths]
    n = 256
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*8.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    state = df32.state_from_f64(y, u)
    multi = df32.trace_df32_final_multi(plans, state, with_path=True)
    assert len(multi) == len(plans)
    for p, (got, tacc) in zip(plans, multi):
        want, twant = df32.trace_df32_final(p, state, with_path=True)
        for a, b in zip(got, want):
            nptest.assert_allclose(df32.to_f64(a), df32.to_f64(b),
                                   rtol=0, atol=0)
        nptest.assert_allclose(df32.to_f64(tacc), df32.to_f64(twant),
                               rtol=0, atol=0)
    # wavelengths actually differ (chromatic spread at the image)
    y0 = df32.to_f64(multi[0][0][1])
    y1 = df32.to_f64(multi[1][0][1])
    assert np.nanmax(np.abs(y0 - y1)) > 1e-6
    # kernel wiring (interpret mode scales with unrolled op count:
    # pin it on the Cooke at 2 wavelengths instead of the 12-row
    # double Gauss x3; EFT precision is checked on-chip by bench.py)
    sd = cooke_triplet()
    sd.wavelengths = sd.wavelengths[:2]
    plans_d = [df32.plan(sd.table(l)) for l in sd.wavelengths]
    yd = np.zeros((128, 3))
    yd[:, :2] = rng.uniform(-1, 1, (128, 2))*4.
    ud = np.zeros((128, 3))
    ud[:, 2] = 1.
    state_d = df32.state_from_f64(yd, ud)
    multi_d = df32.trace_df32_final_multi(plans_d, state_d)
    pk = df32.pallas_trace_df32_multi(plans_d, state_d, tile=128,
                                      interpret=True)
    for got_e, got_k in zip(multi_d, pk):
        for a, b in zip(got_e[:6], got_k):
            nptest.assert_allclose(df32.to_f64(b), df32.to_f64(a),
                                   atol=1e-5)


def test_fast_mode_accuracy(rng):
    """plan(fast=True) (one-round div/sqrt) must stay orders of
    magnitude inside the 1e-9 parity target (eager path; the on-chip
    kernel parity for both modes is measured by bench.py)."""
    s = double_gauss()
    tab = s.table()
    n = 512
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*11.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    y64 = np.asarray(trace_rays_final(tab, y, u)[0])
    state = df32.state_from_f64(y, u)
    out = df32.trace_df32_final(df32.plan(tab, fast=True), state)
    for k in range(2):
        err = np.abs(df32.to_f64(out[k]) - y64[:, k])
        assert np.nanmax(err) < 1e-10, np.nanmax(err)
    # div1/sqrt1 unit accuracy
    a = df32.from_f64(np.abs(rng.standard_normal(256)) + .1)
    b = df32.from_f64(np.abs(rng.standard_normal(256)) + .1)
    q = df32.div1(a, b)
    nptest.assert_allclose(df32.to_f64(q),
                           df32.to_f64(a)/df32.to_f64(b), rtol=1e-11)
    r = df32.sqrt1(a)
    nptest.assert_allclose(df32.to_f64(r),
                           np.sqrt(df32.to_f64(a)), rtol=1e-11)


def test_parabolic_cylinder_degenerate_ray():
    """e_q == 0 guard: a ray travelling parallel to the curved axis of
    a parabolic (conic = -1) cylinder has a vanishing quadratic
    coefficient; the closed-form df32 intercept must take the
    conjugate-root branch like kernels.intercept_cyl instead of
    dividing by zero and falsely vignetting the ray."""
    from rayopt_tpu.ops.tables import make_table
    tab = make_table(curvature=[0., .02, 0.], conic=[0., -1., 0.],
                     curvature_dx=[0., -.02, 0.],  # x-flat: y-cylinder
                     distance=[0., 5., 40.], mu=[1., 1/1.5, 1.5])
    n = 8
    y = np.zeros((n, 3))
    y[:, 0] = np.linspace(-3., 3., n)   # offset along the flat axis
    y[:, 1] = 1.5                       # fixed height on the curve
    u = np.zeros((n, 3))
    u[:, 2] = 1.                        # uy == 0: e_q == 0 exactly
    truth = np.asarray(trace_rays_final(tab, y, u, biconic=True)[0])
    assert np.isfinite(truth).all()
    out = df32.trace_df32_final(df32.plan(tab),
                                df32.state_from_f64(y, u))
    got = df32.to_f64(out[1])
    assert np.isfinite(got).all()
    nptest.assert_allclose(got, truth[:, 1], atol=1e-12)
