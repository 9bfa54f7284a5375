"""Multi-chip ray sharding over a jax.sharding.Mesh.

The trace is embarrassingly parallel over rays: the SurfaceTable is
replicated, the ray axis is sharded over ICI, and the only collectives
are `psum` reductions of spot/merit moments (see SURVEY.md section 2:
this is the TPU-native analog of the reference's single-process NumPy
vectorization).  Works identically on a real TPU slice and on the
XLA_FLAGS=--xla_force_host_platform_device_count=N CPU mesh used in
the tests.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..ops.geometric import trace_rays_final


def ray_mesh(devices=None, axis="rays"):
    """A 1-D device mesh over which ray bundles are sharded."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_rays(y, u, mesh, axis="rays"):
    """Place ray arrays (N, 3) with N sharded over the mesh axis."""
    sh = NamedSharding(mesh, P(axis, None))
    return jax.device_put(y, sh), jax.device_put(u, sh)


@functools.lru_cache(maxsize=128)
def _sharded_trace_fn(mesh, clip, axis, biconic):
    # jit + shard_map construction is cached per configuration:
    # rebuilding it per call costs a full retrace every step (round-4
    # bench measured ~1 s/call of pure tracing overhead on a kernel
    # that executes in ~70 ms)
    fn = shard_map(
        functools.partial(trace_rays_final, clip=clip,
                          biconic=biconic),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
    )
    return jax.jit(fn)


def sharded_trace(table, y, u, mesh, clip=False, axis="rays",
                  biconic=False):
    """Trace with rays sharded over the mesh (table replicated).

    Pure SPMD: no cross-ray communication is needed, XLA keeps every
    shard local to its chip.
    """
    return _sharded_trace_fn(mesh, clip, axis, biconic)(table, y, u)


def _substitute_dead(table, y, u, w, clip, axis, biconic=False):
    """Replace vignetted/missed rays by a surviving ray at zero weight.

    Reverse-mode AD turns any NaN primal into NaN cotangents even at
    zero weight, so the dead rays must not trace at all.  The stand-in
    ray is found globally: each shard nominates its first survivor and
    the first nominating shard wins (a few floats over ICI).
    """
    tab0 = jax.tree_util.tree_map(jax.lax.stop_gradient, table)
    yp, up, _ = trace_rays_final(tab0, y, u, clip=clip,
                                 biconic=biconic)
    # final u included: an image-surface clip NaNs u after y is set
    alive = (jnp.all(jnp.isfinite(yp[:, :2]), axis=1)
             & jnp.all(jnp.isfinite(up), axis=1))
    pick = jnp.argmax(alive)
    flags = jax.lax.all_gather(alive[pick], axis)
    cand_y = jax.lax.all_gather(y[pick], axis)
    cand_u = jax.lax.all_gather(u[pick], axis)
    winner = jnp.argmax(flags)
    y = jnp.where(alive[:, None], y, cand_y[winner])
    u = jnp.where(alive[:, None], u, cand_u[winner])
    return y, u, jnp.where(alive, w, 0.)


def _rms_local(table, y, u, w, clip, axis, nan_safe=False,
               biconic=False):
    if nan_safe:
        y, u, w = _substitute_dead(table, y, u, w, clip, axis,
                                   biconic=biconic)
    yf, uf, t = trace_rays_final(table, y, u, clip=clip,
                                 biconic=biconic)
    pt = yf[:, :2]
    good = jnp.all(jnp.isfinite(pt), axis=1)
    wg = jnp.where(good, w, 0.)
    pt = jnp.where(good[:, None], pt, 0.)
    # distributed moments ride ICI as psums
    wsum = jax.lax.psum(wg.sum(), axis)
    mean = jax.lax.psum((wg[:, None]*pt).sum(0), axis)/wsum
    r2 = jax.lax.psum(
        (wg*jnp.square(pt - mean).sum(1)).sum(), axis)/wsum
    return jnp.sqrt(r2 + 1e-30)


@functools.lru_cache(maxsize=128)
def _sharded_rms_fn(mesh, clip, axis):
    fn = shard_map(
        functools.partial(_rms_local, clip=clip, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis)),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_rms(table, y, u, w, mesh, clip=False, axis="rays"):
    """Weighted spot RMS of a sharded bundle: local moment sums plus
    `psum` over the mesh (the only collective in the hot path)."""
    return _sharded_rms_fn(mesh, clip, axis)(table, y, u, w)


def sharded_spot_rms(table, y, u, w, mesh, clip=False, axis="rays",
                     nan_safe=True, biconic=False):
    """Differentiable sharded spot RMS: the mesh twin of
    parallel.grad.spot_rms.  Traceable (no jit inside) so it can sit
    under jax.grad/jit in an optimization step; rays are sharded over
    `axis`, the table is replicated, gradients of the table psum over
    ICI automatically."""
    return shard_map(
        functools.partial(_rms_local, clip=clip, axis=axis,
                          nan_safe=nan_safe, biconic=biconic),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis)),
        out_specs=P(),
    )(table, y, u, w)


def shard_components(state, mesh, axis="rays"):
    """Place component-layout ray state (a pytree of (N,) arrays --
    the 6-tuple of the f32 engines or the 6x(hi, lo) df32 state) with
    N sharded over the mesh axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sh), state)


@functools.lru_cache(maxsize=128)
def _sharded_pallas_trace_fn(mesh, clip, specs, tile, interpret, axis):
    from ..ops.pallas_trace import pallas_trace_final

    def local(tab, *st):
        return pallas_trace_final(tab, st, clip=clip, specs=specs,
                                  tile=tile, interpret=interpret)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(),) + (P(axis),)*6,
                   out_specs=((P(axis),)*6, P(axis)),
                   check_vma=False)
    return jax.jit(fn)


def sharded_pallas_trace(table, state, mesh, clip=False, specs=None,
                         tile=None, interpret=False, axis="rays"):
    """The flagship fused Pallas kernel under shard_map: each chip
    runs the single-HBM-pass kernel on its resident ray shard; the
    surface table replicates and no collectives are needed
    (SURVEY.md's batched-kernel-under-shard_map parallelism row,
    demonstrated rather than asserted).

    state: 6-tuple of (N,) components, N divisible by
    n_devices*tile.  tile defaults to the per-shard ray count (one
    grid step per chip) when that is small enough, else the kernel
    default.  Returns ((x, y, z, ux, uy, uz), t) sharded over rays.
    """
    from ..ops.pallas_trace import DEFAULT_TILE, _resolve_specs
    specs = _resolve_specs(table, specs)
    if tile is None:
        per_shard = state[0].shape[0] // int(mesh.shape[axis])
        tile = min(per_shard, DEFAULT_TILE)
    return _sharded_pallas_trace_fn(
        mesh, clip, specs, tile, interpret, axis)(table, *state)


@functools.lru_cache(maxsize=128)
def _sharded_pallas_moments_fn(mesh, clip, specs, tile, interpret,
                               axis):
    from ..ops.pallas_trace import pallas_trace_merit

    def local(tab, *st):
        mom = pallas_trace_merit(tab, st, clip=clip, specs=specs,
                                 tile=tile, interpret=interpret)
        return tuple(jax.lax.psum(m, axis) for m in mom)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(),) + (P(axis),)*6,
                   out_specs=(P(),)*5, check_vma=False)
    return jax.jit(fn)


def sharded_pallas_moments(table, state, mesh, clip=False, specs=None,
                           tile=None, interpret=False, axis="rays"):
    """Fused Pallas trace + in-kernel spot-moment reduction per chip,
    with the five moment totals psum'd over ICI -- the multi-chip
    merit path of the headline engine (no per-ray writeback anywhere,
    a handful of scalars on the wire).  Returns (count, sum x, sum y,
    sum x^2, sum y^2); feed ops.pallas_trace.spot_rms_from_moments."""
    from ..ops.pallas_trace import DEFAULT_TILE, _resolve_specs
    specs = _resolve_specs(table, specs)
    if tile is None:
        per_shard = state[0].shape[0] // int(mesh.shape[axis])
        tile = min(per_shard, DEFAULT_TILE)
    return _sharded_pallas_moments_fn(
        mesh, clip, specs, tile, interpret, axis)(table, *state)


def sharded_pallas_spot_rms(table, y, u, w, mesh, specs=None,
                            clip=False, tile=None, interpret=False,
                            axis="rays", diff_pose=None):
    """Differentiable multi-chip merit on the analytic-adjoint Pallas
    kernel (ops.pallas_grad): each chip traces its resident shard
    with the fused merit kernel, the five weighted moments psum over
    ICI, and under jax.grad the in-kernel adjoint runs per chip with
    the table cotangents psum'd by shard_map's transpose -- the
    production multi-chip optimization step with NO per-ray residuals
    anywhere (the sharded_spot_rms XLA path stores ~56 arrays per
    surface per chip).

    Traceable (no jit inside) so it composes under jit/value_and_grad;
    specs must be passed when the table is traced, as with every
    specialized engine.  Traced pose deltas (tilt/decenter)
    differentiate through the per-chip adjoint with the rot/offset
    cotangents psum'd by the transpose (see
    ops.pallas_grad.pallas_spot_moments, diff_pose)."""
    from ..ops.pallas_grad import _resolve_pose_specs, \
        pallas_spot_moments
    from ..ops.pallas_trace import DEFAULT_TILE, spot_rms_from_moments
    from ..ops.kernels import split
    specs = _resolve_pose_specs(table, specs, diff_pose,
                                "sharded_pallas_spot_rms")
    if tile is None:
        per_shard = y.shape[0] // int(mesh.shape[axis])
        tile = min(per_shard, DEFAULT_TILE)

    def local(tab, y, u, w):
        state = (*split(y), *split(u))
        mom = pallas_spot_moments(tab, state, w, specs=specs,
                                  clip=clip, tile=tile,
                                  interpret=interpret)
        mom = tuple(jax.lax.psum(m, axis) for m in mom)
        return spot_rms_from_moments(*mom)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(), P(axis, None), P(axis, None),
                               P(axis)),
                     out_specs=P(), check_vma=False)(table, y, u, w)


#: (id(steps), mesh, tile, interpret, axis, merit) -> (steps, fn);
#: holding `steps` pins its id (a plan is a pytree of arrays --
#: unhashable, so lru_cache cannot key on it directly)
_df32_fn_cache = {}


def _sharded_df32_fn(steps, mesh, tile, interpret, axis, merit):
    key = (id(steps), mesh, tile, interpret, axis, merit)
    hit = _df32_fn_cache.get(key)
    if hit is not None:
        return hit[1]
    from ..ops import df32

    if merit:
        def local(st):
            mom = df32.pallas_trace_df32_merit(steps, st, tile=tile,
                                               interpret=interpret)
            return tuple(jax.lax.psum(m, axis) for m in mom)
        fn = shard_map(local, mesh=mesh, in_specs=(P(axis),),
                       out_specs=(P(),)*5, check_vma=False)
    else:
        def local(st):
            return df32.pallas_trace_df32(steps, st, tile=tile,
                                          interpret=interpret)
        fn = shard_map(local, mesh=mesh, in_specs=(P(axis),),
                       out_specs=P(axis), check_vma=False)
    fn = jax.jit(fn)
    if len(_df32_fn_cache) > 128:
        _df32_fn_cache.clear()
    _df32_fn_cache[key] = (steps, fn)
    return fn


def sharded_df32_trace(steps, state, mesh, tile=None,
                       interpret=False, axis="rays"):
    """The parity-grade df32 Pallas kernel under shard_map: the
    planned surface chain closes over the local kernel, rays shard
    over the mesh, no collectives.  state: 6-tuple of (hi, lo) pairs;
    returns the final state in the same (sharded) layout."""
    if tile is None:
        per_shard = state[0][0].shape[0] // int(mesh.shape[axis])
        tile = min(per_shard, 8*1024)
    return _sharded_df32_fn(steps, mesh, tile, interpret, axis,
                            merit=False)(state)


def sharded_df32_moments(steps, state, mesh, tile=None,
                         interpret=False, axis="rays"):
    """df32 merit under the mesh: each chip's fused
    pallas_trace_df32_merit reduces its shard to exact f64 moment
    totals, psum'd over ICI.  Parity-grade multi-chip optimization
    merit with zero per-ray writeback."""
    if tile is None:
        per_shard = state[0][0].shape[0] // int(mesh.shape[axis])
        tile = min(per_shard, 8*1024)
    return _sharded_df32_fn(steps, mesh, tile, interpret, axis,
                            merit=True)(state)


def shard_bundles(bundles, mesh, axis="rays"):
    """Place the ray arrays of (y, u, w[, chroma]) merit bundles onto
    the mesh (chroma overrides stay replicated)."""
    ray_sh = NamedSharding(mesh, P(axis, None))
    w_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    nd = int(mesh.shape[axis])
    out = []
    for bundle in bundles:
        y, u, w = (np.asarray(bundle[0]), np.asarray(bundle[1]),
                   np.asarray(bundle[2]))
        pad = (-y.shape[0]) % nd
        if pad:
            # quadrature sizes (e.g. radau-21) rarely divide the mesh;
            # pad with zero-weight copies of the first ray -- they
            # trace finitely and contribute nothing to any moment
            y = np.concatenate([y, np.repeat(y[:1], pad, axis=0)])
            u = np.concatenate([u, np.repeat(u[:1], pad, axis=0)])
            w = np.concatenate([w, np.zeros(pad, w.dtype)])
        y, u, w = (jax.device_put(y, ray_sh),
                   jax.device_put(u, ray_sh),
                   jax.device_put(w, w_sh))
        rest = []
        for extra in bundle[3:]:
            # chroma override dicts replicate on the mesh (mixing them
            # into a mesh-committed table must not pull in the default
            # device); non-array metadata (e.g. the wavelength float)
            # passes through
            rest.append({k: (jax.device_put(v, repl)
                             if isinstance(v, (np.ndarray, jax.Array))
                             else v)
                         for k, v in extra.items()}
                        if isinstance(extra, dict) else extra)
        out.append((y, u, w) + tuple(rest))
    return out
