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


def _marginal_seed(table, hx, hy, z, px, py, scale):
    """Marginal-ray candidate: chief direction for (hx, hy), origin
    offset by scale*(px, py) in the pupil plane's ray-local frame
    (reference conjugates.py:236-255)."""
    one = jnp.ones_like(hx)
    nrm = jax.lax.rsqrt(hx*hx + hy*hy + 1.)
    ux, uy, uz = hx*nrm, hy*nrm, one*nrm
    # sagittal/meridional frame of u against the +z axis
    # s = u x z / |.|, m = u x s / |.|
    sx, sy = uy, -ux
    sn = jnp.sqrt(sx*sx + sy*sy)
    axial = sn < 1e-12
    sx = jnp.where(axial, 1., sx/jnp.where(axial, 1., sn))
    sy = jnp.where(axial, 0., sy/jnp.where(axial, 1., sn))
    mx = uy*0. - uz*sy
    my = uz*sx - ux*0.
    mz = ux*sy - uy*sx
    mn = jnp.sqrt(mx*mx + my*my + mz*mz)
    mx, my, mz = mx/mn, my/mn, mz/mn
    ox = -z*ux + scale*(px*sx + py*mx)
    oy = -z*uy + scale*(px*sy + py*my)
    oz = z - z*uz + scale*(py*mz)
    return (ox, oy, oz, ux, uy, uz)


def _clearance(table, specs, stop, hx, hy, z, px, py, scale, r2):
    """Edge-clearance merit of the marginal candidate at the stop
    (reference system.py:542-552, non-rim mode): fractional squared
    height at the stop minus one; NaN (missed a surface) counts as
    fully outside."""
    sub = jax.tree_util.tree_map(lambda a: a[:stop + 1], table)
    state = _marginal_seed(sub, hx, hy, z, px, py, scale)
    out, t = trace_components_final(
        sub, state, specs=specs[:stop + 1] if specs else None)
    d = (out[0]**2 + out[1]**2)/r2 - 1.
    return jnp.where(jnp.isfinite(d), d, 1.)


@functools.partial(jax.jit, static_argnames=("stop", "specs",
                                             "grow_iters", "bisect_iters"))
def aim_marginal_batched(table, field_tangents, z, p0, stop,
                         specs=None, direction=(0., 1.),
                         grow_iters=30, bisect_iters=40):
    """Batched marginal-ray solve: for every field point find the
    pupil-scale a such that the ray aimed at a*p0 along `direction`
    just fills the stop, by monotone bracketing + bisection with NaN
    (= vignetted/missed) treated as outside.  Returns (F,) scales a*p0.
    """
    hx = field_tangents[:, 0]
    hy = field_tangents[:, 1]
    z = jnp.broadcast_to(jnp.asarray(z, hx.dtype), hx.shape)
    px, py = direction
    r2 = table.radius[stop]**2

    def merit(a):
        return _clearance(table, specs, stop, hx, hy, z,
                          px*jnp.ones_like(hx), py*jnp.ones_like(hx),
                          a*p0, r2)

    # bracket: expand hi by the merit-proportional factor the host
    # solver uses (reference system.py:492: b *= 1 - fb), so the FIRST
    # zero crossing is bracketed even when the clearance is
    # non-monotone (it dives again once rays start missing surfaces)
    lo = jnp.zeros_like(hx)
    hi = jnp.ones_like(hx)

    def grow(_, lohis):
        lo, hi = lohis
        f = merit(hi)
        still = f < 0
        lo = jnp.where(still, hi, lo)
        hi = jnp.where(still, hi*(1 - f), hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, grow_iters, grow, (lo, hi))

    def bisect(_, lohis):
        lo, hi = lohis
        mid = (lo + hi)/2
        f = merit(mid)
        lo = jnp.where(f < 0, mid, lo)
        hi = jnp.where(f < 0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, bisect_iters, bisect, (lo, hi))
    return (lo + hi)/2*p0


def pupil_batched(table, field_tangents, z0, p0, stop, specs=None):
    """Full pupil solve for a batch of field points: chief-ray pupil
    distances plus the four-margin aperture boxes, all on device (the
    batched counterpart of System._aim_pupil, reference
    system.py:557-583).

    Returns (z, boxes): z (F,), boxes (F, 2, 2) as
    [[-sag, -mer], [+sag, +mer]].
    """
    z = aim_chief_batched(table, field_tangents, z0, stop, specs=specs)
    margins = {}
    for name, direction in (("+mer", (0., 1.)), ("-mer", (0., -1.)),
                            ("+sag", (1., 0.)), ("-sag", (-1., 0.))):
        margins[name] = aim_marginal_batched(
            table, field_tangents, z, p0, stop, specs=specs,
            direction=direction)
    boxes = jnp.stack([
        jnp.stack([-margins["-sag"], -margins["-mer"]], -1),
        jnp.stack([margins["+sag"], margins["+mer"]], -1),
    ], -2)
    return z, boxes


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
