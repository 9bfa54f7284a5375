"""Jittable, batched pupil aiming.

The reference aims one field point at a time with host-side
scipy.newton/brentq (reference system.py:507-583).  Here the chief-ray
solve becomes a fixed-trip-count Newton whose derivative comes from
jax.grad *through the trace itself*, vmapped over all field points at
once, and the marginal solve is a bracketed bisection with NaN
(= vignetted/missed) treated as outside -- SURVEY.md section 7's
"paraxial-seeded fixed-iteration solver".  The host PolarCacheND path
remains for API parity and as the oracle.

Covers finite and infinite conjugates, all five wide-angle field
projections (reference conjugates.py:208-234), the stop-edge merit and
the rim (stop=-1) vignetting merit over all interior surfaces, with
residual outputs so callers can bound convergence instead of trusting
a fixed iteration count.

Field coordinates: `field` is (F, 2) fractional object coordinates.
For the infinite conjugate pass `slope=tan(object.angle)` (or
`angle=`); `slope=None` keeps the legacy meaning "field values are
already tangents" (rectilinear only).  For the finite conjugate pass
`radius=object.radius`.
"""

import functools

import jax
import jax.numpy as jnp

from .geometric import trace_components_final, trace_rays
from . import surfaces as S


# -- field projections, jnp twins of conjugates.PROJECTIONS --------------

def _dir_rectilinear(fx, fy):
    # fx, fy are tangents here
    nrm = jax.lax.rsqrt(fx*fx + fy*fy + 1.)
    return fx*nrm, fy*nrm, nrm


def _dir_stereographic(fx, fy, angle):
    vx = fx*2*jnp.tan(angle/2)
    vy = fy*2*jnp.tan(angle/2)
    r = (vx*vx + vy*vy)/4
    return vx/(r + 1), vy/(r + 1), (1 - r)/(r + 1)


def _dir_equisolid(fx, fy, angle):
    vx = fx*2*jnp.sin(angle/2)
    vy = fy*2*jnp.sin(angle/2)
    r = vx*vx + vy*vy
    g = jnp.sqrt(jnp.maximum(1 - r/4, 0.))
    return vx*g, vy*g, 1 - r/2


def _dir_orthographic(fx, fy, angle):
    vx = fx*jnp.sin(angle)
    vy = fy*jnp.sin(angle)
    r = vx*vx + vy*vy
    return vx, vy, jnp.sqrt(jnp.maximum(1 - r, 0.))


def _dir_equidistant(fx, fy, angle):
    ax, ay = fx*angle, fy*angle
    backward = ax*ax + ay*ay > (jnp.pi/2)**2
    vx, vy = jnp.sin(ax), jnp.sin(ay)
    vz = jnp.sqrt(jnp.maximum(0., 1 - vx*vx - vy*vy))
    return vx, vy, jnp.where(backward, -vz, vz)


def _field_direction(fx, fy, slope, projection):
    """Unit field direction for fractional field (fx, fy).

    slope=None: rectilinear with (fx, fy) already tangents (legacy).
    Otherwise slope = tan(semi-angle) and angle = arctan(slope)."""
    if projection == "rectilinear":
        if slope is not None:
            fx, fy = fx*slope, fy*slope
        return _dir_rectilinear(fx, fy)
    angle = jnp.arctan(slope)
    fn = {"stereographic": _dir_stereographic,
          "equisolid": _dir_equisolid,
          "orthographic": _dir_orthographic,
          "equidistant": _dir_equidistant}[projection]
    return fn(fx, fy, angle)


def _sm_frame(ux, uy, uz, zsign=1.):
    """Sagittal/meridional unit frame of direction u against the
    (0, 0, zsign) axis (jnp twin of utils.math.sagittal_meridional)."""
    sx, sy = uy*zsign, -ux*zsign
    sn = jnp.sqrt(sx*sx + sy*sy)
    axial = sn < 1e-12
    den = jnp.where(axial, 1., sn)
    sx = jnp.where(axial, 1., sx/den)
    sy = jnp.where(axial, 0., sy/den)
    mx = -uz*sy
    my = uz*sx
    mz = ux*sy - uy*sx
    mn = jnp.sqrt(mx*mx + my*my + mz*mz)
    return sx, sy, (mx/mn, my/mn, mz/mn)


# -- ray seeds (jnp twins of Conjugate.aim) -------------------------------

def _seed_infinite(fx, fy, z, px, py, scale, slope, projection):
    """Infinite-conjugate candidate: field direction from the
    projection, origin back-projected from the pupil plane, offset by
    scale*(px, py) in the sagittal/meridional frame
    (reference conjugates.py:236-255)."""
    ux, uy, uz = _field_direction(fx, fy, slope, projection)
    sx, sy, (mx, my, mz) = _sm_frame(ux, uy, uz)
    ox = -z*ux + scale*(px*sx + py*mx)
    oy = -z*uy + scale*(px*sy + py*my)
    oz = z - z*uz + scale*(py*mz)
    return (ox, oy, oz, ux, uy, uz)


def _seed_finite(table, fx, fy, z, px, py, scale, radius):
    """Finite-conjugate candidate: origin on the (possibly curved)
    object surface at -field*radius, direction at the axial pupil
    point, tilted by scale*(px, py) in the pupil plane
    (reference conjugates.py:137-166)."""
    ox = -fx*radius
    oy = -fy*radius
    pos = jnp.stack([ox, oy, jnp.zeros_like(ox)], -1)
    oz = -S.surface_sag(pos, table.curvature[0], table.conic[0],
                        table.aspherics[0], table.aspherics_odd[0])
    ux = -ox
    uy = -oy
    uz = z - oz
    zsign = jnp.sign(z)
    sx, sy, (mx, my, mz) = _sm_frame(ux, uy, uz, zsign)
    ux = ux + scale*(px*sx + py*mx)
    uy = uy + scale*(px*sy + py*my)
    uz = uz + scale*(py*mz)
    nrm = jax.lax.rsqrt(ux*ux + uy*uy + uz*uz)*zsign
    return (ox, oy, oz, ux*nrm, uy*nrm, uz*nrm)


def _seed(table, fx, fy, z, px, py, scale, slope, radius, finite,
          projection):
    if finite:
        return _seed_finite(table, fx, fy, z, px, py, scale, radius)
    return _seed_infinite(fx, fy, z, px, py, scale, slope, projection)


# -- merits ---------------------------------------------------------------

def _stop_height(table, specs, stop, fx, fy, z, slope=None, radius=0.,
                 finite=False, projection="rectilinear"):
    """Signed fractional chief-ray height at the stop along the field
    direction (the aim_chief merit, reference system.py:519-524)."""
    sub = jax.tree_util.tree_map(lambda a: a[:stop + 1], table)
    zero = jnp.zeros_like(fx)
    state = _seed(sub, fx, fy, z, zero, zero, zero, slope, radius,
                  finite, projection)
    out, t = trace_components_final(
        sub, state, specs=specs[:stop + 1] if specs else None)
    rad = table.radius[stop]
    return (fx*out[0] + fy*out[1])/rad


def _clearance(table, specs, stop, fx, fy, z, px, py, scale, r2,
               slope=None, radius=0., finite=False,
               projection="rectilinear", rim=False):
    """Edge-clearance merit of the marginal candidate: fractional
    squared height minus one at the stop, or its max over all interior
    surfaces in rim mode (reference system.py:542-552); NaN (missed a
    surface) counts as fully outside."""
    state = _seed(table, fx, fy, z, px, py, scale, slope, radius,
                  finite, projection)
    if rim:
        y0 = jnp.stack(state[:3], -1)
        u0 = jnp.stack(state[3:], -1)
        # extended-vocabulary rows (anamorphic/grating/DOE/odd) need
        # the general path here too -- specs is static, so this is a
        # compile-time branch
        ext = bool(specs) and any(
            s.biconic or s.toroidal or s.grating or s.doe
            or s.cyl_axis or s.odd for s in specs)
        ys = trace_rays(table, y0, u0, biconic=ext)[0]
        h2 = jnp.square(ys[1:-1, :, :2]).sum(-1)
        d = h2/jnp.square(table.radius[1:-1])[:, None] - 1.
        d = jnp.where(jnp.isfinite(d), d, 1.)
        return d.max(0)
    sub = jax.tree_util.tree_map(lambda a: a[:stop + 1], table)
    out, t = trace_components_final(
        sub, state, specs=specs[:stop + 1] if specs else None)
    d = (out[0]**2 + out[1]**2)/r2 - 1.
    return jnp.where(jnp.isfinite(d), d, 1.)


# -- solvers ---------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "stop", "specs", "iters", "finite", "projection", "with_residual"))
def aim_chief_batched(table, field, z0, stop, specs=None, iters=12,
                      slope=None, radius=0., finite=False,
                      projection="rectilinear", with_residual=False):
    """Solve the chief-ray pupil distance for a whole batch of field
    points in one jitted Newton (derivative by jax.grad through the
    trace).

    field: (F, 2) fractional field coordinates (legacy: rectilinear
    tangents when slope is None); z0: scalar initial pupil distance.
    Returns (F,) solved distances, plus the (F,) final merit residuals
    when with_residual is set.
    """
    fx = field[:, 0]
    fy = field[:, 1]

    def merit_one(z, fx1, fy1):
        return _stop_height(table, specs, stop, fx1[None], fy1[None],
                            z[None], slope, radius, finite,
                            projection)[0]

    g = jax.grad(merit_one)

    def newton(z, fx1, fy1):
        def body(_, z):
            f = merit_one(z, fx1, fy1)
            df = g(z, fx1, fy1)
            df = jnp.where(jnp.abs(df) < 1e-30, 1., df)
            step = f/df
            # guard NaN (ray missed): keep the current iterate
            step = jnp.where(jnp.isfinite(step), step, 0.)
            return z - step

        return jax.lax.fori_loop(0, iters, body, z)

    z0v = jnp.broadcast_to(jnp.asarray(z0, fx.dtype), fx.shape)
    z = jax.vmap(newton)(z0v, fx, fy)
    if not with_residual:
        return z
    resid = _stop_height(table, specs, stop, fx, fy, z, slope, radius,
                         finite, projection)
    return z, jnp.abs(resid)


@functools.partial(jax.jit, static_argnames=(
    "stop", "specs", "grow_iters", "bisect_iters", "finite",
    "projection", "rim", "with_residual"))
def aim_marginal_batched(table, field, z, p0, stop, specs=None,
                         direction=(0., 1.), grow_iters=30,
                         bisect_iters=40, slope=None, radius=0.,
                         finite=False, projection="rectilinear",
                         rim=False, with_residual=False):
    """Batched marginal-ray solve: for every field point find the
    pupil-scale a such that the ray aimed at a*p0 along `direction`
    just fills the limiting aperture (the stop, or in rim mode the
    tightest of all interior surfaces), by monotone bracketing +
    bisection with NaN (= vignetted/missed) treated as outside.
    Returns (F,) scales a*p0, plus the (F,) final bracket half-widths
    (relative) when with_residual is set.
    """
    fx = field[:, 0]
    fy = field[:, 1]
    z = jnp.broadcast_to(jnp.asarray(z, fx.dtype), fx.shape)
    px, py = direction
    r2 = table.radius[stop]**2

    def merit(a):
        return _clearance(table, specs, stop, fx, fy, z,
                          px*jnp.ones_like(fx), py*jnp.ones_like(fx),
                          a*p0, r2, slope, radius, finite, projection,
                          rim)

    # bracket: expand hi by the merit-proportional factor the host
    # solver uses (reference system.py:492: b *= 1 - fb), so the FIRST
    # zero crossing is bracketed even when the clearance is
    # non-monotone (it dives again once rays start missing surfaces)
    lo = jnp.zeros_like(fx)
    hi = jnp.ones_like(fx)

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
    a = (lo + hi)/2
    if not with_residual:
        return a*p0
    return a*p0, (hi - lo)/jnp.maximum(a, 1e-30)


def pupil_batched(table, field, z0, p0, stop, specs=None, slope=None,
                  radius=0., finite=False, projection="rectilinear",
                  rim=False, with_residuals=False):
    """Full pupil solve for a batch of field points: chief-ray pupil
    distances plus the four-margin aperture boxes, all on device (the
    batched counterpart of System._aim_pupil, reference
    system.py:557-583).

    Returns (z, boxes): z (F,), boxes (F, 2, 2) as
    [[-sag, -mer], [+sag, +mer]]; with_residuals additionally returns
    (chief residual (F,), max marginal bracket width (F,)).
    """
    kw = dict(specs=specs, slope=slope, radius=radius, finite=finite,
              projection=projection)
    z = aim_chief_batched(table, field, z0, stop,
                          with_residual=with_residuals, **kw)
    if with_residuals:
        z, chief_resid = z
    margins = {}
    widths = []
    for name, direction in (("+mer", (0., 1.)), ("-mer", (0., -1.)),
                            ("+sag", (1., 0.)), ("-sag", (-1., 0.))):
        out = aim_marginal_batched(
            table, field, z, p0, stop, direction=direction, rim=rim,
            with_residual=with_residuals, **kw)
        if with_residuals:
            out, width = out
            widths.append(width)
        margins[name] = out
    boxes = jnp.stack([
        jnp.stack([-margins["-sag"], -margins["-mer"]], -1),
        jnp.stack([margins["+sag"], margins["+mer"]], -1),
    ], -2)
    if with_residuals:
        return z, boxes, (chief_resid, jnp.stack(widths).max(0))
    return z, boxes
