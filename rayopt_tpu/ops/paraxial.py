"""Pure-jnp paraxial (ABCD) engine.

The differentiable/jittable counterpart of the host-side
trace.paraxial.ParaxialTrace: 4x4 tangential/sagittal block matrices
per surface (Massey-Siegman refraction, reference elements.py:503-541),
propagated with an associative scan, plus the first-order property set
(focal length, pupils, Lagrange invariant) as pure functions of the
SurfaceTable.  Cross-checked against the host engine in
tests/test_paraxial_ops.py; used by differentiable optimization when
first-order targets (EFL, pupil positions) enter the merit.
"""

import functools

import jax
import jax.numpy as jnp


def surface_abcd(curvature, distance, n_before, n_after, mu, theta=0.,
                 aspheric0=0., doe0=0., curvature_dx=0., xy20=0.,
                 xy02=0.):
    """4x4 paraxial matrix for one surface: free propagation to the
    vertex followed by refraction/reflection.  State vector
    (y_sag, y_tan, nu_sag, nu_tan).  doe0 is the r^2 coefficient of a
    radial diffractive kick potential (table doe[:, 0]): it adds
    power -2 n_after doe0.  curvature_dx is the anamorphic x-minus-y
    vertex-curvature split: the sagittal power slot reads
    curvature + curvature_dx (matching the host twin's
    _vertex_power_x), so cylinders/biconics/toroids get per-axis
    first-order properties here too.  xy20/xy02 are the denormalized
    quadratic freeform coefficients (table xy_poly columns for x^2 /
    y^2): each adds twice its value to the respective axis curvature
    (matching FreeformXY._xy_quadratic)."""
    cy = curvature + 2*aspheric0 + 2*xy02
    cx = curvature + curvature_dx + 2*aspheric0 + 2*xy20
    costheta = jnp.cos(theta)
    is_mirror = mu == -1
    is_bare = mu == 1

    # free propagation (reference elements.py:223)
    md = jnp.eye(4)
    md = md.at[0, 2].set(distance/n_before)
    md = md.at[1, 3].set(distance/n_before)

    # refraction (reference elements.py:503)
    nr = n_after/n_before
    p = jnp.sqrt(jnp.maximum(nr**2 + costheta**2 - 1, 1e-30))
    # the same sign composes for mirrors in the reduced mirror-space
    # convention (pinned against real-ray zone-plate foci)
    doe_p = 2*n_after*doe0
    m11 = jnp.where(is_mirror | is_bare, 1., p/(nr*costheta))
    m20 = doe_p + jnp.where(is_mirror, 2*cx*costheta,
                            jnp.where(is_bare, 0.,
                                      n_before*cx*(costheta - p)))
    m31 = doe_p + jnp.where(is_mirror, 2*cy/costheta,
                            jnp.where(is_bare, 0.,
                                      nr*n_before*cy*(costheta - p)
                                      / (costheta*p)))
    m = jnp.eye(4)
    m = m.at[1, 1].set(m11)
    m = m.at[2, 0].set(m20)
    m = m.at[3, 1].set(m31)
    m = m.at[3, 3].set(1/m11)
    return m @ md


def abcd_matrices(table, theta=None):
    """(S, 4, 4) per-surface matrices for surfaces 1..S-1 (row 0 is the
    object surface and gets the identity)."""
    s = table.curvature.shape[0]
    theta = jnp.zeros(s) if theta is None else theta
    asp0 = (table.aspherics[:, 0] if table.aspherics.shape[1]
            else jnp.zeros(s))
    doe = getattr(table, "doe", None)
    doe0 = (doe[:, 0] if doe is not None and doe.shape[1]
            else jnp.zeros(s))
    cdx = getattr(table, "curvature_dx", None)
    cdx = jnp.zeros(s) if cdx is None else cdx
    xy = getattr(table, "xy_poly", None)
    if xy is not None and xy.shape[1] >= 5:
        xy20, xy02 = xy[:, 2], xy[:, 4]
    else:
        xy20 = xy02 = jnp.zeros(s)
    m = jax.vmap(surface_abcd)(table.curvature, table.distance,
                               table.n_before, table.n_after,
                               table.mu, theta, asp0, doe0, cdx,
                               xy20, xy02)
    return m.at[0].set(jnp.eye(4))


def abcd_product(table, start=1, stop=None):
    """Cumulative ABCD product over surfaces [start, stop) via an
    associative scan (reference system.py:406)."""
    m = abcd_matrices(table)[start:stop]
    prod = jax.lax.associative_scan(
        jax.vmap(lambda a, b: b @ a), m)
    return prod[-1]


def paraxial_trace(table, y0, u0):
    """Scan the (y, nu) x (marginal, chief) state through the system.

    y0, u0: (2,) marginal/chief seed (heights, n*slopes).
    Returns y (S, 2), u (S, 2)."""
    m = abcd_matrices(table)

    def step(yu, mi):
        yu = mi @ yu
        return yu, yu

    yu0 = jnp.stack([y0, y0, u0, u0])  # (4, 2): sag/tan x (y, nu)
    _, yus = jax.lax.scan(step, yu0, m[1:])
    yus = jnp.concatenate([yu0[None], yus], 0)
    # tangential components (axis=1 of the host engine)
    return yus[:, 1, :], yus[:, 3, :]


def first_order(table, y0, u0):
    """First-order property dict (focal length, pupils, invariant)
    as pure differentiable functions (reference
    paraxial_trace.py:110-211)."""
    y, u = paraxial_trace(table, y0, u0)
    n = jnp.asarray(table.n_after)
    lagrange = u0[0]*y0[1] - u0[1]*y0[0]
    denom = u[0, 1]*u[-2, 0] - u[0, 0]*u[-2, 1]
    efl = lagrange/denom
    c = jnp.stack([-efl*n[-2], efl*n[0]])/lagrange/jnp.stack(
        [n[-2], n[0]])
    fd = (jnp.stack([y[1, 1]*u[-2, 0] - y[1, 0]*u[-2, 1],
                     y[-2, 1]*u[0, 0] - y[-2, 0]*u[0, 1]])*c)
    pupil_distance = -y[jnp.array([1, -2]), 1] / \
        u[jnp.array([0, -2]), 1]*n[jnp.array([0, -2])]
    pupil_height = jnp.abs(
        y[jnp.array([1, -2]), 0] +
        pupil_distance*u[jnp.array([0, -2]), 0]/n[jnp.array([0, -2])])
    return {
        "y": y, "u": u,
        "lagrange": lagrange,
        "focal_length": jnp.stack([-efl*n[-2], efl*n[0]]),
        "focal_distance": fd,
        "pupil_distance": pupil_distance,
        "pupil_height": pupil_height,
    }


@functools.partial(jax.jit)
def paraxial_solve_image(table, y0, u0):
    """Distance from the last surface to the paraxial image (the
    refocus solve, reference paraxial_trace.py:322)."""
    y, u = paraxial_trace(table, y0, u0)
    return -table.n_after[-2]*y[-2, 0]/u[-2, 0]
