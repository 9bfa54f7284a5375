"""The geometric trace engine: one `lax.scan` over the surface table.

This replaces the reference's per-surface Python loop
(reference system.py:459-464, geometric_trace.py:72-80) with a single
jitted scan whose body is the fused transfer-intercept-refract step;
the ray bundle (rays x wavelengths x fields flattened to N) stays
batched on the TPU vector unit the whole way through.

Two entry points:

* trace_rays      -- full history (S, N, 3) per quantity, the analog of
                     GeometricTrace's y/u/i/t arrays.
* trace_rays_final -- carry-only variant (returns the rays after the
                     last surface plus accumulated optical path); this
                     is the throughput path used for spot/merit/bench
                     work, with O(N) instead of O(S*N) HBM traffic.
"""

import functools

import jax
import jax.numpy as jnp

from . import surfaces as S


def _step(clip, carry, surf):
    y, u = carry
    rot = surf.rot
    # to_normal: row-vector convention y @ R.T (reference elements.py:156-175)
    yl = (y - surf.offset) @ rot.T
    il = u @ rot.T
    y1, u1, t = S.propagate_surface(yl, il, surf, clip=clip)
    out = (y1, u1, il, t*surf.n_before)
    # from_normal for the next surface's frame
    carry = (y1 @ rot, u1 @ rot)
    return carry, out


def _rows(table, start=1, stop=None):
    return jax.tree_util.tree_map(lambda a: a[start:stop], table)


@functools.partial(jax.jit, static_argnames=("clip",))
def trace_rays(table, y0, u0, clip=False):
    """Trace rays y0, u0 (N, 3; element-0 local frame) through all
    surfaces.  Returns (y, u, i, t): (S, N, 3) x3 and (S, N), surface 0
    holding the seed (t[0] = 0), matching GeometricTrace's layout
    (reference geometric_trace.py:37-47).
    """
    rot0 = table.rot[0]
    carry = (y0 @ rot0, u0 @ rot0)
    carry, (y, u, i, t) = jax.lax.scan(
        functools.partial(_step, clip), carry, _rows(table))
    cat = lambda a, b: jnp.concatenate([a[None], b], axis=0)
    return (cat(y0, y), cat(u0, u), cat(u0, i),
            cat(jnp.zeros(y0.shape[:-1], y0.dtype), t))


@functools.partial(jax.jit, static_argnames=("clip",))
def trace_rays_final(table, y0, u0, clip=False):
    """Carry-only trace: returns (y, u, i, t_total) after the last
    surface (local frame), with t_total the accumulated optical path.
    """
    rot0 = table.rot[0]
    # derive the accumulator from y0 (not a fresh zeros) so it carries
    # y0's sharding/varying-axis annotation under shard_map
    zero = jnp.zeros_like(y0[..., 0])
    carry = (y0 @ rot0, u0 @ rot0, y0, u0, zero)

    def step(carry, surf):
        y, u, _, _, tacc = carry
        (yn, un), (y1, u1, il, topt) = _step(clip, (y, u), surf)
        return (yn, un, y1, u1, tacc + topt), None

    (_, _, y, u, t), _ = jax.lax.scan(step, carry, _rows(table))
    return y, u, t
