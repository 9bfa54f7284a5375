"""Pallas fused trace kernel: parity with the XLA scan engine
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.models import cooke_triplet, double_gauss
from rayopt_tpu.ops.geometric import trace_rays_final
from rayopt_tpu.ops.pallas_trace import pallas_trace_final
from rayopt_tpu.ops.kernels import specialize, split


@pytest.mark.parametrize("build", [
    cooke_triplet,
    pytest.param(double_gauss, marks=pytest.mark.slow),
])
def test_pallas_matches_xla(build):
    s = build()
    tab = s.table()
    specs = specialize(tab)
    n = 256
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*3
    u = np.zeros((n, 3))
    u[:, :2] = rng.uniform(-.03, .03, (n, 2))
    u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
    state = (*[np.ascontiguousarray(c) for c in split(y)],
             *[np.ascontiguousarray(c) for c in split(u)])
    out, t = pallas_trace_final(tab, state, specs=specs, tile=128,
                                interpret=True)
    yf, uf, tf = trace_rays_final(tab, y, u)
    got_y = np.stack([np.asarray(c) for c in out[:3]], -1)
    got_u = np.stack([np.asarray(c) for c in out[3:]], -1)
    nptest.assert_allclose(got_y, np.asarray(yf), atol=1e-12,
                           equal_nan=True)
    nptest.assert_allclose(got_u, np.asarray(uf), atol=1e-12,
                           equal_nan=True)
    nptest.assert_allclose(np.asarray(t), np.asarray(tf), atol=1e-12,
                           equal_nan=True)


def test_pallas_clip(build=cooke_triplet):
    s = build()
    tab = s.table()
    specs = specialize(tab)
    n = 128
    y = np.zeros((n, 3))
    y[:, 1] = np.linspace(0, 10, n)
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    state = (*[np.ascontiguousarray(c) for c in split(y)],
             *[np.ascontiguousarray(c) for c in split(u)])
    out, t = pallas_trace_final(tab, state, specs=specs, clip=True,
                                tile=128, interpret=True)
    yf, uf, tf = trace_rays_final(tab, y, u, clip=True)
    got_u = np.stack([np.asarray(c) for c in out[3:]], -1)
    nptest.assert_allclose(got_u, np.asarray(uf), atol=1e-12,
                           equal_nan=True)
    # some rays must actually be vignetted for this to test anything
    assert np.isnan(got_u).any()


@pytest.mark.slow
def test_pallas_odd_aspherics():
    """The fused kernel traces odd-aspheric (ODDASPHE-style) surfaces
    identically to the XLA engine."""
    from rayopt_tpu.elements import Spheroid
    from rayopt_tpu.system import System
    from rayopt_tpu.materials import air
    s = System()
    s.append(Spheroid(material=air, radius=9.))
    s.append(Spheroid(distance=8., curvature=1/45., conic=-.3,
                      aspherics=[0., 2e-7],
                      aspherics_odd=[0., 1e-5, -2e-8],
                      material=1.6, radius=9.))
    s.append(Spheroid(distance=5., curvature=-1/80., material=air,
                      radius=9.))
    s.append(Spheroid(distance=70., material=None, radius=9.))
    s.wavelengths = [587.56e-9]
    tab = s.table()
    specs = specialize(tab)
    n = 128
    y = np.zeros((n, 3))
    y[:, 1] = np.linspace(-8, 8, n)
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    state = (*[np.ascontiguousarray(c) for c in split(y)],
             *[np.ascontiguousarray(c) for c in split(u)])
    out, t = pallas_trace_final(tab, state, specs=specs, tile=128,
                                interpret=True)
    yf, uf, tf = trace_rays_final(tab, y, u)
    got_y = np.stack([np.asarray(c) for c in out[:3]], -1)
    got_u = np.stack([np.asarray(c) for c in out[3:]], -1)
    nptest.assert_allclose(got_y, np.asarray(yf), atol=1e-12,
                           equal_nan=True)
    nptest.assert_allclose(got_u, np.asarray(uf), atol=1e-12,
                           equal_nan=True)


@pytest.mark.tpu
def test_pallas_real_tpu_smoke():
    """Real-chip smoke: the Pallas fused kernel and the df32 kernel
    compile and agree with the XLA engine on an actual TPU.  Skipped
    on CPU-only runs; bench.py exercises this on every benchmark."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU")
    from rayopt_tpu.ops import df32
    s = double_gauss()
    tab = s.table()
    n = 8192
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*9
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    state = tuple(np.ascontiguousarray(c)
                  for c in (*split(y), *split(u)))
    import jax.numpy as jnp
    tab32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                   tab)
    out, t = pallas_trace_final(
        tab32, tuple(c.astype(np.float32) for c in state),
        specs=specialize(tab))
    nptest.assert_allclose(np.asarray(out[0]), yf[:, 0], atol=1e-3)
    out_df = df32.pallas_trace_df32(df32.plan(tab),
                                    df32.state_from_f64(y, u))
    nptest.assert_allclose(df32.to_f64(out_df[0]), yf[:, 0], atol=1e-9)


def test_pallas_merit_matches_trace():
    """The fused trace+moments kernel reproduces the spot RMS of the
    plain trace (interpret mode; vignetting NaNs masked)."""
    from rayopt_tpu.ops.pallas_trace import (pallas_trace_merit,
                                             spot_rms_from_moments)
    s = cooke_triplet()
    tab = s.table()
    specs = specialize(tab)
    n = 512
    rng = np.random.RandomState(2)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*8.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    state = tuple(np.ascontiguousarray(c)
                  for c in (*split(y), *split(u)))
    cnt, sx, sy, sxx, syy = pallas_trace_merit(
        tab, state, specs=specs, clip=True, tile=128, interpret=True)
    rms = float(spot_rms_from_moments(cnt, sx, sy, sxx, syy))
    yf, uf, tf = trace_rays_final(tab, y, u, clip=True)
    pts = np.asarray(yf)[:, :2]
    good = np.isfinite(pts).all(1) & np.isfinite(np.asarray(uf)[:, 2])
    assert good.sum() == float(cnt)
    pts = pts[good]
    want = np.sqrt(((pts - pts.mean(0))**2).sum(1).mean())
    nptest.assert_allclose(rms, want, rtol=1e-9)
    assert good.sum() < n  # clip actually vignetted something


@pytest.mark.slow
def test_pallas_multi_wavelength_parity():
    """The polychromatic kernel (one ray tile traced through every
    wavelength table while VMEM-resident) matches the vmapped XLA
    multi-trace exactly, and its fused merit variant reproduces the
    per-wavelength spot RMS."""
    import jax
    import jax.numpy as jnp
    from rayopt_tpu.ops.geometric import trace_rays_final_multi
    from rayopt_tpu.ops.pallas_trace import (pallas_trace_multi,
                                             spot_rms_from_moments)
    from rayopt_tpu.models import doublet
    s = doublet()
    s.wavelengths = [480e-9, 550e-9, 644e-9]
    tabs = jax.tree_util.tree_map(jnp.asarray, s.tables())
    n = 256
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    # the doublet is sub-mm scale (roc ~ 0.6)
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*0.25
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    nlam = 3
    ref = np.asarray(trace_rays_final_multi(
        tabs, np.broadcast_to(y, (nlam, n, 3)),
        np.broadcast_to(u, (nlam, n, 3)))[0])
    state = tuple(jnp.asarray(v) for v in
                  (y[:, 0], y[:, 1], y[:, 2],
                   u[:, 0], u[:, 1], u[:, 2]))
    outs = pallas_trace_multi(tabs, state, tile=128, interpret=True)
    for li in range(nlam):
        nptest.assert_allclose(np.asarray(outs[li][0][0]),
                               ref[li][:, 0], atol=1e-13)
        nptest.assert_allclose(np.asarray(outs[li][0][1]),
                               ref[li][:, 1], atol=1e-13)
    mom = pallas_trace_multi(tabs, state, tile=128, interpret=True,
                             merit=True)
    for li in range(nlam):
        x, yv = ref[li][:, 0], ref[li][:, 1]
        good = np.isfinite(x)
        rr = np.sqrt(((x[good] - x[good].mean())**2
                      + (yv[good] - yv[good].mean())**2).mean())
        nptest.assert_allclose(float(spot_rms_from_moments(*mom[li])),
                               rr, rtol=1e-12)


def test_pallas_multi_extended_vocabulary():
    """Polychromatic kernel on a dispersive extended-vocabulary
    system (grating spectrograph): per-wavelength tables carry
    different grating terms, orders land at different detector
    positions, parity vs the vmapped engine."""
    import jax
    import jax.numpy as jnp
    from rayopt_tpu.models import spectrograph
    from rayopt_tpu.ops.geometric import trace_rays_final_multi
    from rayopt_tpu.ops.pallas_trace import pallas_trace_multi
    s = spectrograph()
    tabs = jax.tree_util.tree_map(jnp.asarray, s.tables())
    nlam = int(np.asarray(tabs.curvature).shape[0])
    n = 128
    rng = np.random.RandomState(1)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*5.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    ref = np.asarray(trace_rays_final_multi(
        tabs, np.broadcast_to(y, (nlam, n, 3)),
        np.broadcast_to(u, (nlam, n, 3)), biconic=True)[0])
    state = tuple(jnp.asarray(v) for v in
                  (y[:, 0], y[:, 1], y[:, 2],
                   u[:, 0], u[:, 1], u[:, 2]))
    outs = pallas_trace_multi(tabs, state, tile=128, interpret=True)
    cents = []
    for li in range(nlam):
        nptest.assert_allclose(np.asarray(outs[li][0][1]),
                               ref[li][:, 1], atol=1e-12)
        cents.append(np.nanmean(np.asarray(outs[li][0][1])))
    # the orders disperse: distinct line centroids per wavelength
    assert np.ptp(cents) > 1.
