"""Jittable, batched pupil aiming.

The reference aims one field point at a time with host-side
scipy.newton/brentq (reference system.py:507-583).  Here the chief-ray
solve becomes a fixed-trip-count Newton whose derivative comes from
jax.grad *through the trace itself*, vmapped over all field points at
once — SURVEY.md §7's "paraxial-seeded fixed-iteration solver".  The
host PolarCacheND path remains for API parity and as the oracle.

Currently covers the common case: infinite conjugate, rectilinear
projection, meridional+sagittal field components.
"""

import functools

import jax
import jax.numpy as jnp

from . import kernels as K
from .geometric import trace_components_final


def _chief_seed(table, hx, hy, z):
    """Origin/direction of the chief-ray candidate aimed at axial
    point z for field tangents (hx, hy) (reference
    conjugates.py:236-255, rectilinear)."""
    one = jnp.ones_like(hx)
    nrm = jax.lax.rsqrt(hx*hx + hy*hy + 1.)
    ux, uy, uz = hx*nrm, hy*nrm, one*nrm
    x = -z*ux
    y = -z*uy
    zz = z - z*uz
    return (x, y, zz, ux, uy, uz)


def _stop_height(table, specs, stop, hx, hy, z):
    """Signed fractional chief-ray height at the stop along the field
    direction (the aim_chief merit, reference system.py:519-524)."""
    sub = jax.tree_util.tree_map(lambda a: a[:stop + 1], table)
    state = _chief_seed(sub, hx, hy, z)
    out, t = trace_components_final(
        sub, state, specs=specs[:stop + 1] if specs else None)
    rad = table.radius[stop]
    return (hx*out[0] + hy*out[1])/rad


@functools.partial(jax.jit, static_argnames=("stop", "specs", "iters"))
def aim_chief_batched(table, field_tangents, z0, stop, specs=None,
                      iters=12):
    """Solve the chief-ray pupil distance for a whole batch of field
    points in one jitted Newton (derivative by jax.grad through the
    trace).

    field_tangents: (F, 2) tan(field angle) components; z0: scalar
    initial pupil distance.  Returns (F,) solved distances.
    """
    hx = field_tangents[:, 0]
    hy = field_tangents[:, 1]

    def merit_one(z, hx1, hy1):
        return _stop_height(table, specs, stop, hx1[None], hy1[None],
                            z[None])[0]

    g = jax.grad(merit_one)

    def newton(z, hx1, hy1):
        def body(_, z):
            f = merit_one(z, hx1, hy1)
            df = g(z, hx1, hy1)
            df = jnp.where(jnp.abs(df) < 1e-30, 1., df)
            step = f/df
            # guard NaN (ray missed): keep the current iterate
            step = jnp.where(jnp.isfinite(step), step, 0.)
            return z - step

        return jax.lax.fori_loop(0, iters, body, z)

    z0v = jnp.broadcast_to(jnp.asarray(z0, hx.dtype), hx.shape)
    return jax.vmap(newton)(z0v, hx, hy)
