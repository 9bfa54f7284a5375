"""Multi-chip sharding on the virtual 8-device CPU mesh: sharded
traces and reductions must match single-device results exactly."""

import numpy as np
from numpy import testing as nptest
import jax
import pytest

from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.ops.geometric import trace_rays_final
from rayopt_tpu.parallel import ray_mesh, shard_rays, sharded_trace, \
    sharded_rms


@pytest.fixture(scope="module")
def setup():
    s = cooke_triplet()
    tab = s.table()
    n = 1024
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))
    u = np.zeros((n, 3))
    u[:, :2] = rng.uniform(-.02, .02, (n, 2))
    u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
    w = np.ones(n)/n
    return tab, y, u, w


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_sharded_trace_matches(setup):
    tab, y, u, w = setup
    mesh = ray_mesh()
    ys, us, ts = sharded_trace(tab, y, u, mesh)
    yf, uf, tf = trace_rays_final(tab, y, u)
    nptest.assert_allclose(np.asarray(ys), np.asarray(yf), atol=1e-13)
    nptest.assert_allclose(np.asarray(us), np.asarray(uf), atol=1e-13)
    nptest.assert_allclose(np.asarray(ts), np.asarray(tf), atol=1e-13)


def test_sharded_rms_matches(setup):
    tab, y, u, w = setup
    mesh = ray_mesh()
    r = float(sharded_rms(tab, y, u, w, mesh))
    yf, uf, tf = trace_rays_final(tab, y, u)
    pt = np.asarray(yf)[:, :2]
    mean = pt.mean(0)
    r0 = float(np.sqrt(((pt - mean)**2).sum(1).mean()))
    nptest.assert_allclose(r, r0, rtol=1e-13)


def test_shard_rays_placement(setup):
    tab, y, u, w = setup
    mesh = ray_mesh()
    ys, us = shard_rays(y, u, mesh)
    assert len(ys.sharding.device_set) == 8


def test_sharded_spot_rms_grad_matches(setup):
    """The sharded differentiable merit agrees with the single-device
    spot_rms in value AND gradient (psum'd table cotangents)."""
    import jax.numpy as jnp
    from rayopt_tpu.parallel import sharded_spot_rms
    from rayopt_tpu.parallel.grad import spot_rms
    tab, y, u, w = setup
    mesh = ray_mesh()

    def merit_single(curv):
        return spot_rms(tab.replace(curvature=curv), y, u, w)

    def merit_sharded(curv):
        return sharded_spot_rms(tab.replace(curvature=curv),
                                jnp.asarray(y), jnp.asarray(u),
                                jnp.asarray(w), mesh)

    curv = np.asarray(tab.curvature)
    v0, g0 = jax.value_and_grad(merit_single)(curv)
    v1, g1 = jax.jit(jax.value_and_grad(merit_sharded))(curv)
    nptest.assert_allclose(float(v1), float(v0), rtol=1e-13)
    nptest.assert_allclose(np.asarray(g1), np.asarray(g0),
                           rtol=1e-10, atol=1e-14)


def test_sharded_spot_rms_nan_safe(setup):
    """Vignetting (clipped rays -> NaN) must not poison the sharded
    gradient."""
    import jax.numpy as jnp
    from rayopt_tpu.parallel import sharded_spot_rms
    tab, y, u, w = setup
    # shrink an aperture so a fraction of rays is clipped away
    radius = np.asarray(tab.radius).copy()
    radius[3] = radius[3]*.05
    tab = tab.replace(radius=radius)
    mesh = ray_mesh()

    def merit(curv):
        return sharded_spot_rms(tab.replace(curvature=curv),
                                jnp.asarray(y), jnp.asarray(u),
                                jnp.asarray(w), mesh, clip=True)

    v, g = jax.jit(jax.value_and_grad(merit))(np.asarray(tab.curvature))
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()


def test_optimize_grad_mesh_parity(setup):
    """One full optimization (5 adam steps) sharded over the 8-device
    mesh reproduces the single-device trajectory."""
    from rayopt_tpu.parallel import optimize_grad
    tab, y, u, w = setup
    bundles = [(y, u, w)]
    t0, h0 = optimize_grad(tab, bundles, steps=5, lr=1e-5)
    mesh = ray_mesh()
    t1, h1 = optimize_grad(tab, bundles, steps=5, lr=1e-5, mesh=mesh)
    nptest.assert_allclose(h1, h0, rtol=1e-12)
    nptest.assert_allclose(np.asarray(t1.curvature),
                           np.asarray(t0.curvature), rtol=1e-12,
                           atol=1e-15)


@pytest.mark.slow
def test_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[3]))


@pytest.mark.slow
def test_sharded_pallas_trace_matches(setup):
    # the flagship fused kernel under shard_map (interpret mode on the
    # CPU mesh; the same composition compiles on a TPU mesh)
    from rayopt_tpu.ops.kernels import split, specialize
    from rayopt_tpu.parallel import shard_components, \
        sharded_pallas_trace
    tab, y, u, w = setup
    mesh = ray_mesh()
    state = tuple(np.ascontiguousarray(c)
                  for part in (y, u) for c in split(part))
    st = shard_components(state, mesh)
    out, t = sharded_pallas_trace(tab, st, mesh,
                                  specs=specialize(tab),
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


def test_sharded_pallas_moments_match(setup):
    # trace + in-kernel moment reduction per shard, psum over the mesh
    from rayopt_tpu.ops.kernels import split, specialize
    from rayopt_tpu.ops.pallas_trace import spot_rms_from_moments
    from rayopt_tpu.parallel import shard_components, \
        sharded_pallas_moments
    tab, y, u, w = setup
    mesh = ray_mesh()
    state = tuple(np.ascontiguousarray(c)
                  for part in (y, u) for c in split(part))
    st = shard_components(state, mesh)
    mom = sharded_pallas_moments(tab, st, mesh, specs=specialize(tab),
                                 interpret=True)
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    good = np.isfinite(yf[:, :2]).all(1)
    pt = yf[good, :2]
    assert int(mom[0]) == int(good.sum())
    r_ref = np.sqrt(((pt - pt.mean(0))**2).sum(1).mean())
    nptest.assert_allclose(float(spot_rms_from_moments(*mom)), r_ref,
                           rtol=1e-12)


@pytest.mark.slow
def test_sharded_df32_trace_matches(setup):
    # the parity-grade engine under shard_map: must equal the eager
    # single-device df32 trace word-for-word (same plan, same rays)
    from rayopt_tpu.ops import df32
    from rayopt_tpu.parallel import shard_components, \
        sharded_df32_trace
    tab, y, u, w = setup
    steps = df32.plan(tab)
    mesh = ray_mesh()
    st = shard_components(df32.state_from_f64(y, u), mesh)
    out = sharded_df32_trace(steps, st, mesh, interpret=True)
    ref = df32.pallas_trace_df32(steps, df32.state_from_f64(y, u),
                                 tile=128, interpret=True)
    for comp, comp_ref in zip(out, ref):
        for word, word_ref in zip(comp, comp_ref):
            nptest.assert_allclose(np.asarray(word),
                                   np.asarray(word_ref),
                                   atol=0, rtol=0, equal_nan=True)


@pytest.mark.slow
def test_sharded_df32_moments_match(setup):
    # df32 merit under the mesh vs the eager single-device reference
    # (CPU interpret mode loses the error-free transforms to XLA FMA
    # contraction -- module caution -- so the wiring tolerance here is
    # f32-grade; bench.py measures real parity on the TPU kernel)
    from rayopt_tpu.ops import df32
    from rayopt_tpu.ops.pallas_trace import spot_rms_from_moments
    from rayopt_tpu.parallel import shard_components, \
        sharded_df32_moments
    tab, y, u, w = setup
    steps = df32.plan(tab)
    mesh = ray_mesh()
    st = shard_components(df32.state_from_f64(y, u), mesh)
    mom = sharded_df32_moments(steps, st, mesh, interpret=True)
    mom_ref = df32.trace_df32_merit(steps, df32.state_from_f64(y, u))
    assert int(mom[0]) == int(mom_ref[0])
    nptest.assert_allclose(float(spot_rms_from_moments(*mom)),
                           float(spot_rms_from_moments(*mom_ref)),
                           rtol=1e-5)


def test_df32_merit_eager_parity(setup):
    # the eager df32 merit reduction keeps parity grade on CPU
    from rayopt_tpu.ops import df32
    from rayopt_tpu.ops.pallas_trace import spot_rms_from_moments
    tab, y, u, w = setup
    steps = df32.plan(tab)
    mom = df32.trace_df32_merit(steps, df32.state_from_f64(y, u))
    yf = np.asarray(trace_rays_final(tab, y, u)[0])
    pt = yf[np.isfinite(yf[:, :2]).all(1), :2]
    r_ref = np.sqrt(((pt - pt.mean(0))**2).sum(1).mean())
    nptest.assert_allclose(float(spot_rms_from_moments(*mom)), r_ref,
                           rtol=1e-12)


@pytest.mark.slow
def test_sharded_adjoint_merit_grad(setup):
    """The analytic-adjoint Pallas merit under the 8-device mesh:
    value and table gradient match the single-device custom-VJP
    kernel (moments psum forward, cotangents psum in transpose)."""
    import jax.numpy as jnp
    from rayopt_tpu.ops.kernels import specialize
    from rayopt_tpu.ops.pallas_grad import pallas_spot_rms
    from rayopt_tpu.parallel import sharded_pallas_spot_rms
    tab, y, u, w = setup
    specs = specialize(tab)
    mesh = ray_mesh()

    def merit_single(curv):
        return pallas_spot_rms(tab.replace(curvature=curv), y, u, w,
                               specs=specs, tile=128, interpret=True)

    def merit_sharded(curv):
        return sharded_pallas_spot_rms(
            tab.replace(curvature=curv), jnp.asarray(y),
            jnp.asarray(u), jnp.asarray(w), mesh, specs=specs,
            interpret=True)

    curv = np.asarray(tab.curvature)
    v0, g0 = jax.value_and_grad(merit_single)(curv)
    v1, g1 = jax.jit(jax.value_and_grad(merit_sharded))(curv)
    nptest.assert_allclose(float(v1), float(v0), rtol=1e-12)
    nptest.assert_allclose(np.asarray(g1), np.asarray(g0),
                           rtol=1e-10, atol=1e-14)


@pytest.mark.slow
def test_sharded_adjoint_pose_grad(setup):
    """Pose (tilt) gradients through the sharded adjoint merit: the
    Rodrigues lowering runs inside the shard_map body, the kernels
    read rot as Mat3 scalars, and the rot cotangents psum in the
    transpose -- parity with the single-device adjoint kernel."""
    import jax.numpy as jnp
    from rayopt_tpu.ops.kernels import specialize, with_pose
    from rayopt_tpu.ops.pallas_grad import pallas_spot_rms
    from rayopt_tpu.parallel import sharded_pallas_spot_rms
    tab, y, u, w = setup
    specs = with_pose(specialize(tab))
    mesh = ray_mesh()
    t0 = jnp.zeros((np.asarray(tab.curvature).shape[0], 3))

    g1 = jax.grad(lambda t: pallas_spot_rms(
        tab.replace(tilt=t), y, u, w, specs=specs, tile=128,
        interpret=True))(t0)
    g8 = jax.jit(jax.grad(lambda t: sharded_pallas_spot_rms(
        tab.replace(tilt=t), jnp.asarray(y), jnp.asarray(u),
        jnp.asarray(w), mesh, specs=specs, interpret=True)))(t0)
    assert np.any(np.asarray(g1) != 0)
    nptest.assert_allclose(np.asarray(g8), np.asarray(g1),
                           rtol=1e-10, atol=1e-14)
