"""Polychromatic batched tracing and misc observability helpers."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.ops.geometric import (
    trace_rays_final, trace_rays_final_multi)
from rayopt_tpu.ops.kernels import specialize


def test_multi_matches_per_wavelength():
    s = cooke_triplet()
    tabs = s.tables()
    specs = specialize(s.table())
    b = len(s.wavelengths)
    n = 64
    rng = np.random.RandomState(0)
    y = np.zeros((b, n, 3))
    y[..., 1] = rng.uniform(-1, 1, (b, n))
    u = np.zeros((b, n, 3))
    u[..., 2] = 1.
    ys, us, ts = trace_rays_final_multi(tabs, y, u, specs=specs)
    for i, l in enumerate(s.wavelengths):
        tab = s.table(l)
        yf, uf, tf = trace_rays_final(tab, y[i], u[i])
        nptest.assert_allclose(np.asarray(ys)[i], np.asarray(yf),
                               atol=1e-13)
        nptest.assert_allclose(np.asarray(ts)[i], np.asarray(tf),
                               atol=1e-13)
    # chromatic: the three wavelengths land at different heights
    spread = np.asarray(ys)[:, :, 1].std(0).max()
    assert spread > 1e-6


def test_timer_and_dump(tmp_path):
    import jax.numpy as jnp
    from rayopt_tpu.utils.profiling import Timer, trace_dump
    from rayopt_tpu import GeometricTrace
    t = Timer()
    with t("op") as box:
        box["result"] = jnp.arange(10)**2
    assert t.summary()["op"]["n"] == 1
    s = cooke_triplet()
    g = GeometricTrace(s)
    g.rays_paraxial()
    p = trace_dump(g, tmp_path/"trace.json")
    import json
    d = json.load(open(p))
    assert d["nrays"] == 2
    assert len(d["y"]) == len(s)
