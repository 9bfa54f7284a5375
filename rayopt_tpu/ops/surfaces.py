"""Surface kernels: sag, normal, intercept, Snell refraction.

These are the numerics of the per-surface transfer-intercept-refract
step (reference elements.py:440-501 for the spheroid sag/normal and
closed-form conic intercept, elements.py:333-349 for the iterative
aspheric intercept, elements.py:351-369 for vector Snell / reflection),
re-expressed as pure, batched, NaN-safe jnp functions:

* no data-dependent control flow -- everything is `jnp.where` selects so
  the whole step fuses into one XLA kernel under `jit`;
* the per-ray SciPy Newton loop of the reference becomes a fixed
  trip-count vectorized Newton (ASPHERIC_ITERS) over the full bundle;
* "ray missed / total internal reflection / vignetted" is encoded as
  NaN, matching the reference convention, but produced with guarded
  sqrt so reverse-mode gradients never see NaN from live rays.

Surface parameters are scalars (or arrays broadcastable against the ray
batch) so the functions can be vmapped/scanned freely.
"""

import jax.numpy as jnp

ASPHERIC_ITERS = 10
ASPHERIC_TOL = 1e-9


def _safe_sqrt(x):
    """sqrt clamped at zero; pair with an explicit miss mask."""
    return jnp.sqrt(jnp.maximum(x, 0))


def _poly_even(r2, coeffs):
    """sum_i coeffs[i] * r2**(i+1) via Horner (reference elements.py:449)."""
    d = jnp.zeros_like(r2)
    for i in range(coeffs.shape[-1] - 1, -1, -1):
        d = (d + coeffs[..., i])*r2
    return d


def _dpoly_even(r2, coeffs):
    """d/d(r2) of _poly_even times 2 ... the radial derivative factor
    sum_i 2*(i+1)*coeffs[i]*r2**i (reference elements.py:470)."""
    d = jnp.zeros_like(r2)
    for i in range(coeffs.shape[-1] - 1, -1, -1):
        d = d*r2 + 2*(i + 1)*coeffs[..., i]
    return d


def _poly_odd(r2, coeffs):
    """sum_j coeffs[j] * r**(2j+1): the odd-power aspheric figure
    (the odd half of a Zemax ODDASPHE sag)."""
    d = jnp.zeros_like(r2)
    for j in range(coeffs.shape[-1] - 1, -1, -1):
        d = d*r2 + coeffs[..., j]
    return jnp.sqrt(r2)*d


def _dpoly_odd(r2, coeffs):
    """2 * d/d(r2) of _poly_odd = P(r2)/r + 2 r P'(r2); the r**1 term
    is a cone whose vertex normal is undefined -- r is floored at a
    tiny value there."""
    p = jnp.zeros_like(r2)
    for j in range(coeffs.shape[-1] - 1, -1, -1):
        p = p*r2 + coeffs[..., j]
    dp = jnp.zeros_like(r2)
    for j in range(coeffs.shape[-1] - 1, 0, -1):
        dp = dp*r2 + j*coeffs[..., j]
    r = jnp.maximum(jnp.sqrt(r2), 1e-30)
    return p/r + 2*r*dp


def surface_sag(xyz, curvature, conic, aspherics, aspherics_odd=None,
                xy_poly=None):
    """Signed distance along z from the surface: z - sag(x, y).

    Zero on the surface; matches reference elements.py:440.  A
    nonzero-width xy_poly adds the freeform XY-monomial figure
    (triangular ordering of ops.kernels._xy_terms).
    """
    e = xyz[..., 2]
    r2 = jnp.square(xyz[..., :2]).sum(-1)
    c, k = curvature, conic
    sq = _safe_sqrt(1 - (1 + k)*c**2*r2)
    e = e - c*r2/(1 + sq)
    if aspherics.shape[-1]:
        e = e - _poly_even(r2, aspherics)
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        e = e - _poly_odd(r2, aspherics_odd)
    if xy_poly is not None and xy_poly.shape[-1]:
        from . import kernels as _K
        e = e - _K._poly_xy(xyz[..., 0], xyz[..., 1], xy_poly)
    return e


def surface_normal(xyz, curvature, conic, aspherics,
                   aspherics_odd=None, xy_poly=None):
    """(Unnormalized) surface normal of the sag function, pointing +z
    (reference elements.py:457)."""
    r2 = jnp.square(xyz[..., :2]).sum(-1)
    c, k = curvature, conic
    e = -c/_safe_sqrt(1 - (1 + k)*c**2*r2)
    if aspherics.shape[-1]:
        e = e - _dpoly_even(r2, aspherics)
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        e = e - _dpoly_odd(r2, aspherics_odd)
    gx = xyz[..., 0]*e
    gy = xyz[..., 1]*e
    if xy_poly is not None and xy_poly.shape[-1]:
        from . import kernels as _K
        dpx, dpy = _K._dpoly_xy(xyz[..., 0], xyz[..., 1], xy_poly)
        gx = gx - dpx
        gy = gy - dpy
    q = jnp.stack([gx, gy, jnp.ones_like(e)], axis=-1)
    return q


def intercept_conic(y, u, curvature, conic, alternate):
    """Closed-form ray length to a conic surface (reference
    elements.py:477-501), with degenerate branches handled by selects:

    * c == 0: plane, s = -y_z/u_z
    * quadratic coefficient e == 0 (axial ray on a paraboloid): the
      conjugate-root form f/(g - d) (same root, numerically stable)
    * negative discriminant (ray misses): NaN
    """
    c, k = curvature, conic
    kv = jnp.stack([jnp.ones_like(k), jnp.ones_like(k), 1 + k], axis=-1)
    uy = (u*y*kv).sum(-1)
    uu = (jnp.square(u)*kv).sum(-1)
    yy = (jnp.square(y)*kv).sum(-1)
    d = c*uy - u[..., 2]
    e = c*uu
    f = c*yy - 2*y[..., 2]
    disc = jnp.square(d) - e*f
    g = _safe_sqrt(disc)*(1 - 2*alternate)
    # stable-root selection (see ops.kernels.intercept_conic): the
    # -(d+g)/e and f/(g-d) forms are the same root; pick the
    # cancellation-free pair so near-flat rows (c -> 0) stay exact
    conj = (d*g <= 0) | (e == 0)
    num = jnp.where(conj, f, -(d + g))
    den = jnp.where(conj, g - d, e)
    den_safe = jnp.where(den == 0, 1., den)
    s = num/den_safe
    uz_safe = jnp.where(u[..., 2] == 0, 1., u[..., 2])
    s = jnp.where(c == 0, -y[..., 2]/uz_safe, s)
    s = jnp.where((c != 0) & (disc < 0), jnp.nan, s)
    return s


def intercept(y, u, curvature, conic, aspherics,
              iters=ASPHERIC_ITERS, tol=ASPHERIC_TOL, alternate=0.,
              aspherics_odd=None, xy_poly=None):
    """Ray length from y along unit u to the surface.

    Conic part is closed-form; if aspheric coefficients are present
    (static shape), a fixed trip-count vectorized Newton refines the
    root on the full sag (replacing the per-ray scipy.newton loop of
    reference elements.py:333-349).  Non-converged rays become NaN.
    """
    s = intercept_conic(y, u, curvature, conic, alternate)
    odd = aspherics_odd is not None and aspherics_odd.shape[-1]
    has_xy = xy_poly is not None and xy_poly.shape[-1]
    if aspherics.shape[-1] or odd or has_xy:
        s0 = s
        if has_xy:
            # freeform: restart conic-seed misses from the vertex
            # plane (the symmetric seed can miss rays the true
            # surface catches)
            uz_safe = jnp.where(u[..., 2] == 0, 1., u[..., 2])
            s = jnp.where(jnp.isnan(s0), -y[..., 2]/uz_safe, s0)
        for _ in range(iters):
            p = y + s[..., None]*u
            fn = surface_sag(p, curvature, conic, aspherics,
                             aspherics_odd, xy_poly)
            fp = (surface_normal(p, curvature, conic, aspherics,
                                 aspherics_odd, xy_poly)*u).sum(-1)
            fp = jnp.where(fp == 0, 1., fp)
            s = s - fn/fp
        p = y + s[..., None]*u
        res = surface_sag(p, curvature, conic, aspherics,
                          aspherics_odd, xy_poly)
        scale = 1 + jnp.abs(s)
        s = jnp.where(jnp.abs(res) <= tol*scale, s, jnp.nan)
        if not has_xy:
            s = jnp.where(jnp.isnan(s0) & (curvature != 0), jnp.nan, s)
    return s


def refract(y, u0, mu, curvature, conic, aspherics,
            aspherics_odd=None, xy_poly=None):
    """Vector Snell refraction / mirror reflection at the intercept
    (Spencer & Murty 1962; reference elements.py:351-369).

    mu = n_before/n_after; mu == -1 reflects, mu == 1 passes through.
    Total internal reflection produces NaN.
    """
    r = surface_normal(y, curvature, conic, aspherics, aspherics_odd,
                       xy_poly)
    r2 = jnp.square(r).sum(-1)
    muf = jnp.abs(mu)
    a = muf*(u0*r).sum(-1)/r2
    # reflection branch (mu == -1): muf == 1
    u_refl = u0 - 2*a[..., None]*r
    # refraction branch
    b = (mu**2 - 1)/r2
    disc = jnp.square(a) - b
    g = -a + jnp.sign(mu)*_safe_sqrt(disc)
    u_refr = muf*u0 + g[..., None]*r
    u_refr = jnp.where(disc[..., None] < 0, jnp.nan, u_refr)
    u = jnp.where(mu == -1, u_refl, u_refr)
    u = jnp.where(mu == 1, u0, u)
    return u


def clip_aperture(y, u, radius):
    """NaN the direction of rays outside the aperture
    (reference elements.py:207)."""
    good = jnp.square(y[..., :2]).sum(-1) <= radius**2
    return jnp.where(good[..., None], u, jnp.nan)


def propagate_surface(y, u, surf, clip=False):
    """One full surface step in local (normal) coordinates: intercept,
    transfer, optional clip, refract (reference elements.py:306-315).

    surf is a row of SurfaceTable fields (scalars).  Returns
    (y1, u1, t) with t the geometric path length (multiply by n_before
    for the optical path, as the trace engine does).
    """
    xy = getattr(surf, "xy_poly", None)
    if xy is not None and not xy.shape[-1]:
        xy = None
    t = intercept(y, u, surf.curvature, surf.conic, surf.aspherics,
                  alternate=surf.alternate,
                  aspherics_odd=surf.aspherics_odd, xy_poly=xy)
    y1 = y + t[..., None]*u
    u0 = u
    if clip:
        u0 = clip_aperture(y1, u0, surf.radius)
    u1 = refract(y1, u0, surf.mu, surf.curvature, surf.conic,
                 surf.aspherics, aspherics_odd=surf.aspherics_odd,
                 xy_poly=xy)
    return y1, u1, t
