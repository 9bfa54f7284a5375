"""Cross-engine fuzz: random (valid) spherical/conic systems traced
through three independent implementations — the component-form jnp
engine (scan and specialized-unrolled), and the reference-style NumPy
baseline — must agree bit-tight in float64."""

import os
import sys

import numpy as np
from numpy import testing as nptest
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rayopt_tpu.ops.tables import make_table
from rayopt_tpu.ops.geometric import trace_rays_final
from rayopt_tpu.ops.kernels import specialize
from benchmarks.numpy_baseline import trace_numpy


def random_system(rng, nsurf=8):
    curv = rng.uniform(-1/30., 1/30., nsurf)
    curv[0] = 0.
    conic = np.where(rng.rand(nsurf) < .5, 0.,
                     rng.uniform(-2., .5, nsurf))
    conic[curv == 0] = 0.
    dist = np.r_[0., rng.uniform(1., 8., nsurf - 1)]
    n = np.ones(nsurf)
    mu = np.ones(nsurf)
    cur = 1.
    for j in range(1, nsurf - 1):
        new = rng.choice([1., 1.5, 1.62, 1.7]) if cur == 1. else 1.
        mu[j] = cur/new
        cur = new
        n[j] = cur
    n[-1] = cur
    return make_table(curvature=curv, conic=conic, distance=dist,
                      mu=mu,
                      n_before=np.r_[1., n[:-1]], n_after=n)


@pytest.mark.parametrize("seed", range(6))
def test_engines_agree(seed):
    rng = np.random.RandomState(seed)
    tab = random_system(rng)
    nrays = 200
    y = np.zeros((nrays, 3))
    y[:, :2] = rng.uniform(-3, 3, (nrays, 2))
    u = np.zeros((nrays, 3))
    u[:, :2] = rng.uniform(-.1, .1, (nrays, 2))
    u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))

    y1, u1, t1 = map(np.asarray, trace_rays_final(tab, y, u))
    specs = specialize(tab)
    y2, u2, t2 = map(np.asarray,
                     trace_rays_final(tab, y, u, specs=specs,
                                      unroll=True))
    y3, u3, t3 = trace_numpy(tab, y, u)

    for a, b, what in ((y1, y2, "y scan/unroll"),
                       (u1, u2, "u scan/unroll"),
                       (t1, t2, "t scan/unroll"),
                       (y1, y3, "y scan/numpy"),
                       (u1, u3, "u scan/numpy"),
                       (t1, t3, "t scan/numpy")):
        nptest.assert_allclose(a, b, atol=1e-10, rtol=1e-10,
                               equal_nan=True, err_msg=what)
    # most rays make it through a sane random system
    frac = np.isfinite(y1[:, 0]).mean()
    assert frac > .5, frac


@pytest.mark.parametrize("seed", range(4))
def test_df32_engine_agrees(seed):
    """The eager df32 trace matches the f64 engine at ~1e-10 on random
    spherical/conic systems (the fourth independent implementation)."""
    from rayopt_tpu.ops import df32
    rng = np.random.RandomState(100 + seed)
    tab = random_system(rng)
    nrays = 128
    y = np.zeros((nrays, 3))
    y[:, :2] = rng.uniform(-3, 3, (nrays, 2))
    u = np.zeros((nrays, 3))
    u[:, :2] = rng.uniform(-.1, .1, (nrays, 2))
    u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
    y1 = np.asarray(trace_rays_final(tab, y, u)[0])
    out = df32.trace_df32_final(df32.plan(tab),
                                df32.state_from_f64(y, u))
    xd, yd = df32.to_f64(out[0]), df32.to_f64(out[1])
    good = np.isfinite(y1[:, 0])
    assert good.sum() > nrays//2
    nptest.assert_allclose(xd[good], y1[good, 0], atol=1e-9)
    nptest.assert_allclose(yd[good], y1[good, 1], atol=1e-9)
    # NaN pattern (missed rays) agrees too
    nptest.assert_array_equal(np.isfinite(xd), good)


@pytest.mark.slow
def test_fuzz_extended_vocabulary_parity():
    """Random systems mixing symmetric, biconic, cylinder, toroid,
    odd-aspheric, grating, and diffractive (DOE) rows: the dynamic
    anamorphic scan, the specialized unrolled engine (incl. the
    closed-form cyl_axis path), and the eager df32 parity engine
    agree ray for ray."""
    import numpy as np
    from numpy import testing as nptest
    from rayopt_tpu.ops.tables import make_table, is_anamorphic
    from rayopt_tpu.ops.geometric import trace_rays, trace_rays_final
    from rayopt_tpu.ops.kernels import specialize
    from rayopt_tpu.ops import df32

    rng = np.random.default_rng(21)
    for trial in range(8):
        S = 5
        curv = rng.uniform(-.02, .02, S)
        curv[0] = 0.
        conic = np.where(rng.random(S) < .5,
                         rng.uniform(-1., .5, S), 0.)
        cdx = np.zeros(S)
        kdx = np.zeros(S)
        tor = np.zeros(S)
        grat = np.zeros(S)
        odd = np.zeros((S, 2))
        doe = np.zeros((S, 2))
        for j in range(1, S - 1):
            kind = rng.integers(0, 7)
            if kind == 1:      # biconic
                cdx[j] = rng.uniform(-.01, .01)
                kdx[j] = rng.uniform(-.5, .5)
            elif kind == 2:    # toroid
                tor[j] = 1.
                cdx[j] = rng.uniform(-.01, .01)
                conic[j] = 0. if curv[j] == 0 else conic[j]
            elif kind == 3:    # grating on the base figure
                grat[j] = rng.uniform(-.2, .2)
            elif kind == 4 and curv[j] != 0.:
                cdx[j] = -curv[j]  # pure y-cylinder (cyl_axis path)
                kdx[j] = -conic[j]
            elif kind == 5:    # odd-aspheric figure
                odd[j] = rng.uniform(-1e-5, 1e-5, 2)
            elif kind == 6:    # radial diffractive kick
                doe[j] = (rng.uniform(-3e-3, 3e-3),
                          rng.uniform(-1e-5, 1e-5))
        mu = np.ones(S)
        mu[1:-1] = rng.uniform(.6, .9, S - 2)
        n_before = np.ones(S)
        n_after = np.ones(S)
        tab = make_table(
            curvature=curv, conic=conic, distance=np.full(S, 8.),
            mu=mu, n_before=n_before, n_after=n_after,
            curvature_dx=cdx, conic_dx=kdx, toroidal=tor,
            grating_dy=grat, aspherics_odd=odd, doe=doe)
        assert is_anamorphic(tab) or not (
            cdx.any() or tor.any() or grat.any() or doe.any())
        y0 = np.zeros((16, 3))
        y0[:, :2] = rng.uniform(-2, 2, (16, 2))
        u0 = np.tile([0., 0., 1.], (16, 1))
        u0[:, :2] = rng.uniform(-.05, .05, (16, 2))
        u0 /= np.linalg.norm(u0, axis=1, keepdims=True)
        a = trace_rays(tab, y0, u0, biconic=True)
        b = trace_rays(tab, y0, u0, specs=specialize(tab),
                       unroll=True)
        for va, vb in zip(a, b):
            va, vb = np.asarray(va), np.asarray(vb)
            both = np.isfinite(va) & np.isfinite(vb)
            nptest.assert_allclose(vb[both], va[both],
                                   rtol=1e-10, atol=1e-10,
                                   err_msg="trial %d" % trial)
            nptest.assert_array_equal(np.isnan(va), np.isnan(vb),
                                      err_msg="trial %d" % trial)
        # third engine: eager df32 (double-single) final state
        yf, uf, tf = (np.asarray(v) for v in trace_rays_final(
            tab, y0, u0, biconic=True))
        out, tacc = df32.trace_df32_final(
            df32.plan(tab), df32.state_from_f64(y0, u0),
            with_path=True)
        good = np.isfinite(yf[:, 0])
        nptest.assert_array_equal(
            np.isnan(df32.to_f64(out[0])), ~good,
            err_msg="df32 nan mask, trial %d" % trial)
        for c in range(2):
            nptest.assert_allclose(
                df32.to_f64(out[c])[good], yf[good, c], atol=1e-9,
                err_msg="df32 y%d, trial %d" % (c, trial))
        nptest.assert_allclose(df32.to_f64(tacc)[good], tf[good],
                               rtol=1e-10,
                               err_msg="df32 path, trial %d" % trial)
