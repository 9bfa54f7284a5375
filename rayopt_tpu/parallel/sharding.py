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


def sharded_trace(table, y, u, mesh, clip=False, axis="rays"):
    """Trace with rays sharded over the mesh (table replicated).

    Pure SPMD: no cross-ray communication is needed, XLA keeps every
    shard local to its chip.
    """
    fn = shard_map(
        functools.partial(trace_rays_final, clip=clip),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
    )
    return jax.jit(fn)(table, y, u)


def _rms_local(table, y, u, w, clip, axis):
    yf, uf, t = trace_rays_final(table, y, u, clip=clip)
    pt = yf[:, :2]
    good = jnp.all(jnp.isfinite(pt), axis=1)
    wg = jnp.where(good, w, 0.)
    pt = jnp.where(good[:, None], pt, 0.)
    # distributed moments ride ICI as psums
    wsum = jax.lax.psum(wg.sum(), axis)
    mean = jax.lax.psum((wg[:, None]*pt).sum(0), axis)/wsum
    r2 = jax.lax.psum(
        (wg*jnp.square(pt - mean).sum(1)).sum(), axis)/wsum
    return jnp.sqrt(r2)


def sharded_rms(table, y, u, w, mesh, clip=False, axis="rays"):
    """Weighted spot RMS of a sharded bundle: local moment sums plus
    `psum` over the mesh (the only collective in the hot path)."""
    fn = shard_map(
        functools.partial(_rms_local, clip=clip, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis)),
        out_specs=P(),
    )
    return jax.jit(fn)(table, y, u, w)
