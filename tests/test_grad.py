"""Differentiability: jax.grad through the trace matches finite
differences, and gradient optimization reduces the merit."""

import numpy as np
from numpy import testing as nptest
import jax
import jax.numpy as jnp
import pytest

from rayopt_tpu.models import doublet, cooke_triplet
from rayopt_tpu.parallel.grad import spot_rms, optimize_grad
from rayopt_tpu.utils.distributions import pupil_distribution


@pytest.fixture(scope="module")
def bundle():
    s = doublet()
    tab = s.table()
    ref, xy, w = pupil_distribution("radau", 64)
    n = xy.shape[0]
    y0 = np.zeros((n, 3))
    u0 = np.zeros((n, 3))
    u0[:, :2] = xy*s.object.pupil.slope
    u0[:, 2] = np.sqrt(1 - np.square(u0[:, :2]).sum(1))
    return s, tab, (y0, u0, w)


def test_grad_matches_fd(bundle):
    s, tab, (y0, u0, w) = bundle

    def merit(curv):
        return spot_rms(tab.replace(curvature=curv), y0, u0, w)

    curv = jnp.asarray(tab.curvature)
    g = jax.grad(merit)(curv)
    eps = 1e-7
    for i in (1, 2, 3):
        c1 = curv.at[i].add(eps)
        c2 = curv.at[i].add(-eps)
        fd = (merit(c1) - merit(c2))/(2*eps)
        nptest.assert_allclose(g[i], fd, rtol=1e-5, atol=1e-12)


def test_grad_wrt_distance(bundle):
    s, tab, (y0, u0, w) = bundle

    def merit(dist):
        off = jnp.zeros((dist.shape[0], 3)).at[:, 2].set(dist)
        return spot_rms(tab.replace(distance=dist, offset=off),
                        y0, u0, w)

    dist = jnp.asarray(tab.distance)
    g = jax.grad(merit)(dist)
    eps = 1e-7
    i = 4
    fd = (merit(dist.at[i].add(eps)) -
          merit(dist.at[i].add(-eps)))/(2*eps)
    nptest.assert_allclose(g[i], fd, rtol=1e-5, atol=1e-12)


def test_optimize_grad_improves(bundle):
    s, tab, (y0, u0, w) = bundle
    pert = np.asarray(tab.curvature).copy()
    pert[1] *= 1.04
    tab_p = tab.replace(curvature=pert)
    r0 = float(spot_rms(tab_p, y0, u0, w))
    tab_o, hist = optimize_grad(tab_p, [(y0, u0, w)],
                                select=("curvature",), steps=50,
                                lr=2e-3)
    assert hist[-1] < r0/5


def test_grad_with_nan_rays():
    """Vignetted (NaN) rays must not poison the gradient."""
    s = cooke_triplet()
    tab = s.table()
    n = 32
    rng = np.random.RandomState(0)
    y0 = np.zeros((n, 3))
    y0[:, 1] = np.linspace(0, 20, n)  # some rays miss/clip
    u0 = np.zeros((n, 3))
    u0[:, 2] = 1.
    w = np.ones(n)/n

    def merit(curv):
        return spot_rms(tab.replace(curvature=curv), y0, u0, w,
                        clip=True)

    g = jax.grad(merit)(jnp.asarray(tab.curvature))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_first_order_constrained_optimization():
    """Differentiable first-order operands: spot RMS drops while a
    quadratic EFL penalty holds the focal length (the operand-style
    merit of classical optimizers, via jax.grad)."""
    import functools
    import jax.numpy as jnp
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel.grad import (
        optimize_grad, bundles_from_system, paraxial_seed,
        first_order_penalty, composite_merit, trace_rms_merit)
    from rayopt_tpu.ops.paraxial import first_order

    s = cooke_triplet()
    tab = s.table()
    seed = paraxial_seed(s)
    bundles = bundles_from_system(s, nrays=16)
    efl0 = float(s.paraxial.focal_length[1])
    merit = composite_merit(
        functools.partial(trace_rms_merit, bundles=bundles),
        functools.partial(first_order_penalty, seed=seed,
                          targets={"focal_length": (1, efl0)},
                          weights={"focal_length": 10.}))
    tab1, hist = optimize_grad(tab, bundles, merit=merit, steps=25,
                               lr=3e-6)
    assert hist[-1] < hist[0]
    f1 = float(first_order(tab1, jnp.asarray(seed[0]),
                           jnp.asarray(seed[1]))["focal_length"][1])
    assert abs(f1 - efl0) < .05


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """optimize_grad(checkpoint_dir=...) resumes exactly: killing a
    run at step 6 and restarting reproduces the uninterrupted
    10-step trajectory."""
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel.grad import optimize_grad
    s = cooke_triplet()
    tab = s.table()
    n = 64
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    bundles = [(y, u, np.ones(n)/n)]
    t_full, h_full = optimize_grad(tab, bundles, steps=10, lr=1e-5)

    ckdir = str(tmp_path/"ck")
    # "crash" after 6 steps (checkpoint_every=3 -> checkpoint at 6)
    optimize_grad(tab, bundles, steps=6, lr=1e-5,
                  checkpoint_dir=ckdir, checkpoint_every=3)
    # resume to 10
    t_res, h_res = optimize_grad(tab, bundles, steps=10, lr=1e-5,
                                 checkpoint_dir=ckdir,
                                 checkpoint_every=3)
    np.testing.assert_allclose(h_res, h_full, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(t_res.curvature),
                               np.asarray(t_full.curvature),
                               rtol=1e-12)


def test_jit_steps_matches_host_loop():
    """Fused lax.scan optimization chunks (jit_steps) must reproduce
    the host step loop's trajectory (same merit history, same final
    parameters) -- the dispatch-amortization path for the tunneled
    TPU."""
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel import optimize_grad
    s = cooke_triplet()
    tab = s.table()
    rng = np.random.RandomState(0)
    n = 256
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*5.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    w = np.ones(n)/n
    tab_a, hist_a = optimize_grad(tab, [(y, u, w)], steps=7, lr=1e-5)
    tab_b, hist_b = optimize_grad(tab, [(y, u, w)], steps=7, lr=1e-5,
                                  jit_steps=3)
    nptest.assert_allclose(hist_b, hist_a, rtol=1e-12)
    nptest.assert_allclose(np.asarray(tab_b.curvature),
                           np.asarray(tab_a.curvature), rtol=1e-12)


@pytest.mark.slow
def test_jit_steps_checkpoint_boundaries(tmp_path):
    """jit_steps chunks must land on checkpoint boundaries so resume
    semantics stay step-exact."""
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel import optimize_grad
    s = cooke_triplet()
    tab = s.table()
    rng = np.random.RandomState(1)
    n = 256
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*5.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    w = np.ones(n)/n
    d = str(tmp_path/"ck")
    tab_a, hist_a = optimize_grad(tab, [(y, u, w)], steps=10,
                                  lr=1e-5, jit_steps=4,
                                  checkpoint_dir=d,
                                  checkpoint_every=5)
    # resume from the persisted state: same final history
    tab_b, hist_b = optimize_grad(tab, [(y, u, w)], steps=10,
                                  lr=1e-5, jit_steps=4,
                                  checkpoint_dir=d,
                                  checkpoint_every=5)
    assert len(hist_a) == 10 and len(hist_b) == 10
    nptest.assert_allclose(hist_b[-1], hist_a[-1], rtol=1e-12)


def test_optimize_multi_start():
    """Population multi-start descent in one vmapped dispatch: start
    0 is the nominal (so the winner is never worse than plain local
    descent), every start runs the full adam loop, and the winner
    beats the nominal merit."""
    from rayopt_tpu.parallel.grad import (bundles_from_system,
                                          optimize_multi_start,
                                          trace_rms_merit)
    s = doublet()
    tab = s.table()
    bundles = bundles_from_system(s, nrays=16)
    tab1, info = optimize_multi_start(
        tab, bundles, select=("curvature",),
        sigmas={"curvature": 1e-3}, n_starts=6, steps=12, lr=3e-5,
        seed=1)
    m0 = float(trace_rms_merit(tab, bundles))
    assert info["merits"].shape == (6,)
    assert info["history"].shape == (12,)
    assert info["merits"][info["best"]] <= info["merits"][0] + 1e-12
    assert info["merits"][info["best"]] < m0
    # missing sigma for a selected field is an error (not a silent
    # degenerate population)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        optimize_multi_start(tab, bundles,
                             select=("curvature", "distance"),
                             sigmas={"curvature": 1e-3}, n_starts=4)


@pytest.mark.slow
def test_optimize_multi_start_sharded_matches():
    """The mesh-sharded population (shard_map over the starts axis)
    matches the single-device vmap to fusion-level rounding."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from rayopt_tpu.parallel.grad import (bundles_from_system,
                                          optimize_multi_start)
    s = doublet()
    tab = s.table()
    bundles = bundles_from_system(s, nrays=16)
    kw = dict(select=("curvature",), sigmas={"curvature": 1e-3},
              n_starts=8, steps=10, lr=3e-5, seed=1)
    tab1, info1 = optimize_multi_start(tab, bundles, **kw)
    mesh = Mesh(np.asarray(jax.devices()), ("starts",))
    tab2, info2 = optimize_multi_start(tab, bundles, mesh=mesh, **kw)
    np.testing.assert_allclose(info2["merits"], info1["merits"],
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(tab2.curvature),
                               np.asarray(tab1.curvature),
                               rtol=0, atol=1e-12)
