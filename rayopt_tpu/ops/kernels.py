"""Component-form (structure-of-arrays) trace kernels.

TPU arrays tile as (8 sublanes x 128 lanes) on the trailing axes; an
(N, 3) ray array puts the xyz 3-vector on the lane axis and wastes
125/128 of the vector unit.  The hot engine therefore carries rays as
six separate (N,) component arrays -- every operation below is a pure
elementwise expression over perfectly tiled vectors.

Physics is identical to rayopt_tpu.ops.surfaces (the (..., 3) oracle
implementation, reference elements.py:306-501); the two are
cross-checked in tests/test_ops.py.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp

ASPHERIC_ITERS = 10
ASPHERIC_TOL = 1e-9
TINY = 1e-30


def _tol_for(x, tol):
    """Dtype-aware Newton convergence tolerance: the f64 default
    (1e-9, reference elements.py:345) sits far below f32 evaluation
    noise, so in reduced precision the floor is a small multiple of
    the machine epsilon -- otherwise every converged ray would be
    declared a miss (NaN)."""
    import numpy as np
    return max(tol, 64*float(np.finfo(np.dtype(x.dtype)).eps))


def _sqrt0(x):
    return jnp.sqrt(jnp.maximum(x, 0))


def rot_apply(r, x, y, z):
    """v' = R v on components (to_normal when R = rot_normal)."""
    return (r[0, 0]*x + r[0, 1]*y + r[0, 2]*z,
            r[1, 0]*x + r[1, 1]*y + r[1, 2]*z,
            r[2, 0]*x + r[2, 1]*y + r[2, 2]*z)


def rot_apply_t(r, x, y, z):
    """v' = R^T v on components (from_normal)."""
    return (r[0, 0]*x + r[1, 0]*y + r[2, 0]*z,
            r[0, 1]*x + r[1, 1]*y + r[2, 1]*z,
            r[0, 2]*x + r[1, 2]*y + r[2, 2]*z)


def _poly_even(r2, coeffs):
    d = jnp.zeros_like(r2)
    for i in range(coeffs.shape[-1] - 1, -1, -1):
        d = (d + coeffs[..., i])*r2
    return d


def _dpoly_even(r2, coeffs):
    d = jnp.zeros_like(r2)
    for i in range(coeffs.shape[-1] - 1, -1, -1):
        d = d*r2 + 2*(i + 1)*coeffs[..., i]
    return d


def _poly_odd(r2, coeffs):
    """sum_j coeffs[j] * r**(2j+1) with r = sqrt(r2): odd-power
    aspheric figure (the odd half of a Zemax ODDASPHE sag)."""
    d = jnp.zeros_like(r2)
    for j in range(coeffs.shape[-1] - 1, -1, -1):
        d = d*r2 + coeffs[..., j]
    return jnp.sqrt(r2)*d


def _dpoly_odd(r2, coeffs):
    """2 * d/d(r2) of _poly_odd: P(r2)/r + 2 r P'(r2).  The r**1 term
    has a cusp at the vertex; the axis value is clamped through a tiny
    floor on r (normals exactly on the vertex of a coned surface are
    genuinely undefined)."""
    p = jnp.zeros_like(r2)
    for j in range(coeffs.shape[-1] - 1, -1, -1):
        p = p*r2 + coeffs[..., j]
    dp = jnp.zeros_like(r2)
    for j in range(coeffs.shape[-1] - 1, 0, -1):
        dp = dp*r2 + j*coeffs[..., j]
    r = jnp.maximum(jnp.sqrt(r2), TINY)
    return p/r + 2*r*dp


@functools.lru_cache()
def _xy_terms(deg):
    """Triangular XY-monomial ordering: total degree d = 1..deg, within
    each degree from x^d down to y^d, i.e. (i, j) exponent pairs
    (d, 0), (d-1, 1), ..., (0, d).  No (0, 0) term: a constant sag is
    a vertex shift and belongs in the surface position (it would be
    degenerate with `distance` under optimization)."""
    return tuple((d - j, j) for d in range(1, deg + 1)
                 for j in range(d + 1))


def xy_degree(nterms):
    """Polynomial degree from the triangular term count
    nterms = deg*(deg + 3)/2 (inverse of len(_xy_terms(deg)))."""
    deg, n = 0, 0
    while n < nterms:
        deg += 1
        n += deg + 1
    if n != nterms:
        raise ValueError(
            "xy_poly width %d is not triangular (expected deg*(deg+3)/2"
            " for some integer degree)" % nterms)
    return deg


def _xy_pows(v, deg):
    pows = [None, v]
    for _ in range(2, deg + 1):
        pows.append(pows[-1]*v)
    return pows


def _poly_xy(x, y, coeffs):
    """sum_t coeffs[t] x^i y^j over the triangular ordering
    (_xy_terms); the freeform XY-polynomial figure."""
    deg = xy_degree(coeffs.shape[-1])
    xp = _xy_pows(x, deg)
    yp = _xy_pows(y, deg)
    out = jnp.zeros_like(x)
    for t, (i, j) in enumerate(_xy_terms(deg)):
        m = xp[i] if i else yp[j]
        if i and j:
            m = m*yp[j]
        out = out + coeffs[..., t]*m
    return out


def _dpoly_xy(x, y, coeffs):
    """(d/dx, d/dy) of _poly_xy."""
    deg = xy_degree(coeffs.shape[-1])
    xp = _xy_pows(x, deg)
    yp = _xy_pows(y, deg)
    gx = jnp.zeros_like(x)
    gy = jnp.zeros_like(x)
    for t, (i, j) in enumerate(_xy_terms(deg)):
        c = coeffs[..., t]
        if i:
            m = xp[i - 1] if i > 1 else None
            if j:
                m = yp[j] if m is None else m*yp[j]
            gx = gx + (i*c if m is None else (i*c)*m)
        if j:
            m = yp[j - 1] if j > 1 else None
            if i:
                m = xp[i] if m is None else m*xp[i]
            gy = gy + (j*c if m is None else (j*c)*m)
    return gx, gy


def sag(x, y, z, c, k, aspherics, aspherics_odd=None):
    """z - surface_sag(x, y) (reference elements.py:440)."""
    r2 = x*x + y*y
    e = z - c*r2/(1 + _sqrt0(1 - (1 + k)*c*c*r2))
    if aspherics.shape[-1]:
        e = e - _poly_even(r2, aspherics)
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        e = e - _poly_odd(r2, aspherics_odd)
    return e


def normal_radial(x, y, c, k, aspherics, aspherics_odd=None):
    """The radial factor e of the surface normal (nx, ny, nz) =
    (x*e, y*e, 1) (reference elements.py:457)."""
    r2 = x*x + y*y
    e = -c/_sqrt0(1 - (1 + k)*c*c*r2)
    if aspherics.shape[-1]:
        e = e - _dpoly_even(r2, aspherics)
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        e = e - _dpoly_odd(r2, aspherics_odd)
    return e


def sag_biconic(x, y, z, cx, kx, cy, ky, aspherics,
                aspherics_odd=None):
    """z - biconic_sag(x, y): independent x/y curvature and conic,

        sag = (cx x^2 + cy y^2) /
              (1 + sqrt(1 - (1+kx) cx^2 x^2 - (1+ky) cy^2 y^2))

    (the Zemax BICONICX convention restricted to conics), plus the
    shared rotationally-symmetric aspheric terms.  Reduces exactly to
    `sag` when cx == cy and kx == ky."""
    x2, y2 = x*x, y*y
    a = cx*x2 + cy*y2
    b = (1 + kx)*cx*cx*x2 + (1 + ky)*cy*cy*y2
    e = z - a/(1 + _sqrt0(1 - b))
    r2 = x2 + y2
    if aspherics.shape[-1]:
        e = e - _poly_even(r2, aspherics)
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        e = e - _poly_odd(r2, aspherics_odd)
    return e


def normal_biconic(x, y, cx, kx, cy, ky, aspherics,
                   aspherics_odd=None):
    """Transverse components (gx, gy) of the unnormalized surface
    normal (gx, gy, 1) = grad(z - sag).  In the symmetric limit
    gx = -c x / sqrt(1 - (1+k) c^2 r^2) = x * normal_radial."""
    x2, y2 = x*x, y*y
    a = cx*x2 + cy*y2
    b = (1 + kx)*cx*cx*x2 + (1 + ky)*cy*cy*y2
    s = _sqrt0(1 - b)
    s_safe = jnp.maximum(s, TINY)
    inv = 1./(1 + s)
    gx = -(2*cx*x*(1 + s) + a*(1 + kx)*cx*cx*x/s_safe)*inv*inv
    gy = -(2*cy*y*(1 + s) + a*(1 + ky)*cy*cy*y/s_safe)*inv*inv
    r2 = x2 + y2
    if aspherics.shape[-1]:
        d = _dpoly_even(r2, aspherics)
        gx = gx - x*d
        gy = gy - y*d
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        d = _dpoly_odd(r2, aspherics_odd)
        gx = gx - x*d
        gy = gy - y*d
    return gx, gy


def _newton_residual(kind, s, x, y, z, ux, uy, uz, pa, pb, pc, pd,
                     asp, aspo, xy):
    """Sag residual F(s) at distance s along the ray, for the three
    Newton-refined figures (pa..pd = figure scalars per kind).  A
    nonzero-width `xy` (triangular XY-monomial coefficients) adds the
    freeform figure on top of any base."""
    px, py, pz = x + s*ux, y + s*uy, z + s*uz
    if kind == "radial":
        e = sag(px, py, pz, pa, pb, asp, aspo)
    elif kind == "biconic":
        e = sag_biconic(px, py, pz, pa, pb, pc, pd, asp, aspo)
    else:
        e = sag_toroid(px, py, pz, pa, pb, pc, asp, aspo)
    if xy.shape[-1]:
        e = e - _poly_xy(px, py, xy)
    return e


def _newton_slope(kind, s, x, y, z, ux, uy, uz, pa, pb, pc, pd,
                  asp, aspo, xy):
    """dF/ds = u . grad(z - sag) via the hand-written normals."""
    px, py = x + s*ux, y + s*uy
    if kind == "radial":
        e = normal_radial(px, py, pa, pb, asp, aspo)
        gx, gy = px*e, py*e
    elif kind == "biconic":
        gx, gy = normal_biconic(px, py, pa, pb, pc, pd, asp, aspo)
    else:
        gx, gy = normal_toroid(px, py, pa, pb, pc, asp, aspo)
    if xy.shape[-1]:
        dpx, dpy = _dpoly_xy(px, py, xy)
        gx = gx - dpx
        gy = gy - dpy
    return ux*gx + uy*gy + uz


@partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2))
def _newton_root(kind, iters, tol, seed, x, y, z, ux, uy, uz,
                 pa, pb, pc, pd, asp, aspo, xy):
    """Fixed-count Newton refinement of the intercept distance with
    IMPLICIT differentiation: the JVP comes from the implicit function
    theorem at the converged root (one residual jet), not from
    unrolling the iterations -- nested jacfwd through the trace (the
    AD aberration expansion, optimizer Hessians) stays compilable and
    the derivative is that of the exact root, independent of the
    iteration path.  Non-converged rays give NaN (and NaN jets)."""
    s = seed
    for _ in range(iters):
        fn = _newton_residual(kind, s, x, y, z, ux, uy, uz,
                              pa, pb, pc, pd, asp, aspo, xy)
        fp = _newton_slope(kind, s, x, y, z, ux, uy, uz,
                           pa, pb, pc, pd, asp, aspo, xy)
        fp = jnp.where(fp == 0, 1., fp)
        s = s - fn/fp
    res = _newton_residual(kind, s, x, y, z, ux, uy, uz,
                           pa, pb, pc, pd, asp, aspo, xy)
    tol = _tol_for(s, tol)
    return jnp.where(jnp.abs(res) <= tol*(1 + jnp.abs(s)), s, jnp.nan)


@_newton_root.defjvp
def _newton_root_jvp(kind, iters, tol, primals, tangents):
    s = _newton_root(kind, iters, tol, *primals)
    args = primals[1:]
    dargs = tangents[1:]
    # 0 = F_s ds + F_p . dp  (the seed tangent is irrelevant: the
    # converged root is a function of the surface/ray parameters only)
    fdot = jax.jvp(
        lambda *a: _newton_residual(kind, s, *a), args, dargs)[1]
    fs = _newton_slope(kind, s, *args)
    fs = jnp.where(fs == 0, 1., fs)
    return s, -fdot/fs


def intercept_biconic(x, y, z, ux, uy, uz, cx, kx, cy, ky, aspherics,
                      alternate, iters=ASPHERIC_ITERS,
                      tol=ASPHERIC_TOL, aspherics_odd=None,
                      xy_poly=None):
    """Ray length to a biconic surface: the y-axis conic closed form
    seeds a fixed-count Newton on the exact sag; rays whose conic
    seed misses (e.g. a wide-x ray on a y-cylinder, where the
    seeding sphere curves away but the cylinder does not) restart
    from the vertex-plane intercept.  Non-converged rays give NaN."""
    seed = intercept_conic(x, y, z, ux, uy, uz, cy, ky, alternate)
    uz_safe = jnp.where(uz == 0, 1., uz)
    seed = jnp.where(jnp.isnan(seed), -z/uz_safe, seed)
    if aspherics_odd is None:
        aspherics_odd = jnp.zeros((0,))
    if xy_poly is None:
        xy_poly = jnp.zeros((0,))
    return _newton_root("biconic", iters, tol, seed, x, y, z,
                        ux, uy, uz, cx, kx, cy, ky, aspherics,
                        aspherics_odd, xy_poly)


def refract_biconic(x, y, ux, uy, uz, mu, cx, kx, cy, ky, aspherics,
                    aspherics_odd=None):
    """Snell/mirror refraction with the general biconic normal."""
    gx, gy = normal_biconic(x, y, cx, kx, cy, ky, aspherics,
                            aspherics_odd)
    return _refract_general(x, y, ux, uy, uz, mu, gx, gy)


def _ycurve(y, cy, ky, aspherics, aspherics_odd=None):
    """(sag, d sag/dy) of the toroid's generating curve in the y-z
    plane: conic + polynomial figure evaluated on y alone."""
    y2 = y*y
    sq = _sqrt0(1 - (1 + ky)*cy*cy*y2)
    zy = cy*y2/(1 + sq)
    dzy = cy*y/jnp.maximum(sq, TINY)
    if aspherics.shape[-1]:
        zy = zy + _poly_even(y2, aspherics)
        dzy = dzy + y*_dpoly_even(y2, aspherics)
    if aspherics_odd is not None and aspherics_odd.shape[-1]:
        zy = zy + _poly_odd(y2, aspherics_odd)
        dzy = dzy + y*_dpoly_odd(y2, aspherics_odd)
    return zy, dzy


def sag_toroid(x, y, z, cr, cy, ky, aspherics, aspherics_odd=None):
    """z - toroidal_sag(x, y): the y-z generating curve zy(y) (conic
    cy/ky + polynomial figure) swept about an axis parallel to y at
    radius R = 1/cr (the Zemax TOROIDAL model):

        sag = zy + x^2 cr' / (1 + sqrt(1 - x^2 cr'^2)),
        cr' = cr/(1 - cr zy)

    cr == 0 degenerates to the pure y-cylinder curve."""
    zy, dzy = _ycurve(y, cy, ky, aspherics, aspherics_odd)
    crp = cr/(1 - cr*zy)
    x2 = x*x
    return z - zy - crp*x2/(1 + _sqrt0(1 - x2*crp*crp))


def normal_toroid(x, y, cr, cy, ky, aspherics, aspherics_odd=None):
    """Transverse components (gx, gy) of the unnormalized normal
    (gx, gy, 1) = grad(z - sag) of the toroid:

        gx = -x cr'/w,  gy = -zy'/w,  w = sqrt(1 - x^2 cr'^2)

    (from z = R - sqrt((R - zy)^2 - x^2); exact, including the
    rotation-induced y-coupling through cr'(zy))."""
    zy, dzy = _ycurve(y, cy, ky, aspherics, aspherics_odd)
    crp = cr/(1 - cr*zy)
    w = jnp.maximum(_sqrt0(1 - x*x*crp*crp), TINY)
    return -x*crp/w, -dzy/w


def intercept_toroid(x, y, z, ux, uy, uz, cr, cy, ky, aspherics,
                     alternate, iters=ASPHERIC_ITERS,
                     tol=ASPHERIC_TOL, aspherics_odd=None,
                     xy_poly=None):
    """Ray length to a toroidal surface: y-conic seed (plane restart
    for rays the seeding sphere misses) + fixed-count Newton on the
    exact sag; non-converged rays give NaN."""
    seed = intercept_conic(x, y, z, ux, uy, uz, cy, ky, alternate)
    uz_safe = jnp.where(uz == 0, 1., uz)
    seed = jnp.where(jnp.isnan(seed), -z/uz_safe, seed)
    if aspherics_odd is None:
        aspherics_odd = jnp.zeros((0,))
    if xy_poly is None:
        xy_poly = jnp.zeros((0,))
    return _newton_root("toroid", iters, tol, seed, x, y, z,
                        ux, uy, uz, cr, cy, ky, jnp.zeros(()),
                        aspherics, aspherics_odd, xy_poly)


def refract_toroid(x, y, ux, uy, uz, mu, cr, cy, ky, aspherics,
                   aspherics_odd=None):
    """Snell/mirror refraction with the toroidal normal."""
    gx, gy = normal_toroid(x, y, cr, cy, ky, aspherics, aspherics_odd)
    return _refract_general(x, y, ux, uy, uz, mu, gx, gy)


def normal_freeform(x, y, c, k, aspherics, aspherics_odd, xy_poly):
    """Transverse components (gx, gy) of the unnormalized normal
    (gx, gy, 1) = grad(z - sag) of a freeform surface: symmetric
    conic/aspheric base plus the triangular XY-monomial figure."""
    e = normal_radial(x, y, c, k, aspherics, aspherics_odd)
    gx, gy = x*e, y*e
    if xy_poly.shape[-1]:
        dpx, dpy = _dpoly_xy(x, y, xy_poly)
        gx = gx - dpx
        gy = gy - dpy
    return gx, gy


def refract_freeform(x, y, ux, uy, uz, mu, c, k, aspherics,
                     aspherics_odd, xy_poly):
    """Snell/mirror refraction with the freeform normal."""
    gx, gy = normal_freeform(x, y, c, k, aspherics, aspherics_odd,
                             xy_poly)
    return _refract_general(x, y, ux, uy, uz, mu, gx, gy)


def doe_kick(x, y, doe):
    """Per-ray tangential kick (sx, sy) of a radially-symmetric
    diffractive phase profile: the table column `doe` holds the
    dimensionless kick potential psi(r^2) = sum doe[i] r**(2i+2)
    (= m lambda phi(r) / (2 pi n_after) with phi the imprinted phase
    in radians), so the Spencer & Murty ray kick is grad psi =
    dpsi/d(r^2) * (2x, 2y)."""
    e = _dpoly_even(x*x + y*y, doe)
    return e*x, e*y


def refract_grating(x, y, ux, uy, uz, mu, gdy, gx, gy, doe=None):
    """Diffraction-grating refraction/reflection on an arbitrary
    substrate normal (gx, gy, 1): the generalized Spencer & Murty
    construction u' = muf u + T q + s + Gamma n with the groove
    vector q = y-hat projected into the tangent plane, the
    dimensionless grating term T = m lambda G / n_after (table
    grating_dy), and an optional radial diffractive kick
    s = grad psi(r^2) (table doe; kinoform / Zemax Binary 2).  Any
    normal component of s is absorbed into Gamma, so the in-plane
    gradient needs no explicit tangential projection.

    T == 0, s == 0 reduces exactly to Snell/mirror reflection.
    Evanescent orders (no real Gamma) give NaN, matching the TIR
    convention."""
    nn = gx*gx + gy*gy + 1.
    inv_nn = 1./nn
    muf = jnp.abs(mu)
    # unit groove-dispersion vector: y-hat minus its normal component
    qx, qy, qz = -gy*gx*inv_nn, 1. - gy*gy*inv_nn, -gy*inv_nn
    qn = jax.lax.rsqrt(jnp.maximum(qx*qx + qy*qy + qz*qz, TINY))
    qx, qy, qz = qx*qn, qy*qn, qz*qn
    bx = muf*ux + gdy*qx
    by = muf*uy + gdy*qy
    bz = muf*uz + gdy*qz
    kick0 = True
    if doe is not None and doe.shape[-1]:
        sx, sy = doe_kick(x, y, doe)
        bx = bx + sx
        by = by + sy
        # row-level (not per-ray!) kick presence: an on-axis ray has
        # sx == sy == 0 exactly, and a per-ray select would route the
        # forward-mode derivatives of the AD aberration jets through
        # the passthrough branch at the vertex
        if hasattr(doe, "vals"):
            # scalar-tuple coefficient view (ops.pallas_grad.Coeffs):
            # reduce elementwise, no array comparison
            kick0 = functools.reduce(
                lambda a, b: a & b, [c == 0 for c in doe.vals])
        else:
            kick0 = jnp.all(doe == 0, axis=-1)
    bn = (bx*gx + by*gy + bz)*inv_nn
    bb = bx*bx + by*by + bz*bz
    disc = bn*bn - (bb - 1.)*inv_nn
    root = _sqrt0(disc)
    # transmission keeps the refraction sign convention; reflection
    # (mu == -1) takes the branch that flips the normal component
    # (reduces to gamma = -2 bn, i.e. u - 2(u.n)n/|n|^2, at T == 0)
    gam_t = -bn + jnp.sign(mu)*root
    gam_r = -bn - jnp.sign(bn)*root
    gam = jnp.where(mu == -1, gam_r, gam_t)
    gam = jnp.where(disc < 0, jnp.nan, gam)
    ox = bx + gam*gx
    oy = by + gam*gy
    oz = bz + gam
    keep = (mu == 1) & (gdy == 0) & kick0
    ox = jnp.where(keep, ux, ox)
    oy = jnp.where(keep, uy, oy)
    oz = jnp.where(keep, uz, oz)
    return ox, oy, oz


def _refract_general(x, y, ux, uy, uz, mu, gx, gy):
    """Snell/mirror on an arbitrary (gx, gy, 1) normal."""
    r2 = gx*gx + gy*gy + 1.
    muf = jnp.abs(mu)
    a = muf*(ux*gx + uy*gy + uz)/r2
    rx, ry, rz = ux - 2*a*gx, uy - 2*a*gy, uz - 2*a
    b = (mu*mu - 1)/r2
    disc = a*a - b
    g = -a + jnp.sign(mu)*_sqrt0(disc)
    g = jnp.where(disc < 0, jnp.nan, g)
    tx, ty, tz = muf*ux + g*gx, muf*uy + g*gy, muf*uz + g
    ox = jnp.where(mu == -1, rx, tx)
    oy = jnp.where(mu == -1, ry, ty)
    oz = jnp.where(mu == -1, rz, tz)
    ox = jnp.where(mu == 1, ux, ox)
    oy = jnp.where(mu == 1, uy, oy)
    oz = jnp.where(mu == 1, uz, oz)
    return ox, oy, oz


def intercept_cyl(w, z, uw, uz, c, k, alternate):
    """Closed-form intercept of a pure conic cylinder: the surface
    depends on one transverse coordinate w only, so it is the quadric
    c (w^2 + (1+k) z^2) - 2 z = 0 -- same cancellation-free root
    selection as the rotationally-symmetric conic with the flat-axis
    terms dropped (about half the ops of the seeded Newton a general
    biconic needs)."""
    k1 = 1 + k
    uy_ = uw*w + k1*uz*z
    uu = uw*uw + k1*uz*uz
    yy = w*w + k1*z*z
    d = c*uy_ - uz
    e = c*uu
    f = c*yy - 2*z
    disc = d*d - e*f
    g = _sqrt0(disc)*(1 - 2*alternate)
    e_safe = jnp.where(e == 0, 1., e)
    gd_safe = jnp.where(g == d, 1., g - d)
    s = jnp.where(e == 0, f/gd_safe, -(d + g)/e_safe)
    return jnp.where(disc < 0, jnp.nan, s)


def refract_cyl(w, z, uw, uv, uz, mu, c, k, kind):
    """Snell/mirror on a conic-cylinder normal at the on-surface
    point (w, z): uw is the direction component along the curved
    axis, uv along the flat axis (which the surface normal has no
    component on).  kind: 1 refract, 2 mirror (static).

    Uses the polynomial implicit-gradient normal of the quadric
    c(w^2 + (1+k)z^2) - 2z = 0: N = (-c w, 1 - c(1+k)z) -- no rsqrt,
    and exact beyond the half-cylinder rim."""
    nw = -c*w
    nz = 1. - (1 + k)*c*z
    nn = nw*nw + nz*nz
    inv = 1./nn
    dot = uw*nw + uz*nz
    if kind == 2:
        a2 = 2.*dot*inv
        return uw - a2*nw, uv, uz - a2*nz
    muf = jnp.abs(mu)
    a = muf*dot*inv
    b = (mu*mu - 1)*inv
    disc = a*a - b
    g = -a + jnp.sign(mu)*_sqrt0(disc)
    g = jnp.where(disc < 0, jnp.nan, g)
    return muf*uw + g*nw, muf*uv, muf*uz + g*nz


def intercept_conic(x, y, z, ux, uy, uz, c, k, alternate):
    """Closed-form conic intercept on components
    (reference elements.py:477; degenerate branches as in
    ops.surfaces.intercept_conic).

    The root -(d+g)/e equals f/(g-d) algebraically; numerically each
    form cancels catastrophically in the regime where the other is
    exact (d and g of opposite signs kills -(d+g): at c -> 0 an f32
    trace of a nearly-flat row is garbage -- e.g. an optimizer nudging
    a flat row's curvature to 1e-12 blew the double-Gauss spot RMS
    from 0.022 to 6.4 mm).  Select the cancellation-free numerator/
    denominator pair and share ONE division."""
    k1 = 1 + k
    uy_ = ux*x + uy*y + k1*uz*z
    uu = ux*ux + uy*uy + k1*uz*uz
    yy = x*x + y*y + k1*z*z
    d = c*uy_ - uz
    e = c*uu
    f = c*yy - 2*z
    disc = d*d - e*f
    g = _sqrt0(disc)*(1 - 2*alternate)
    conj = (d*g <= 0) | (e == 0)
    num = jnp.where(conj, f, -(d + g))
    den = jnp.where(conj, g - d, e)
    den_safe = jnp.where(den == 0, 1., den)
    s = num/den_safe
    uz_safe = jnp.where(uz == 0, 1., uz)
    s = jnp.where(c == 0, -z/uz_safe, s)
    s = jnp.where((c != 0) & (disc < 0), jnp.nan, s)
    return s


def intercept(x, y, z, ux, uy, uz, c, k, aspherics, alternate,
              iters=ASPHERIC_ITERS, tol=ASPHERIC_TOL,
              aspherics_odd=None, xy_poly=None):
    s = intercept_conic(x, y, z, ux, uy, uz, c, k, alternate)
    odd = aspherics_odd is not None and aspherics_odd.shape[-1]
    has_xy = xy_poly is not None and xy_poly.shape[-1]
    if aspherics.shape[-1] or odd or has_xy:
        s0 = s
        if aspherics_odd is None:
            aspherics_odd = jnp.zeros((0,))
        if xy_poly is None:
            xy_poly = jnp.zeros((0,))
        if has_xy:
            # a freeform figure breaks rotational symmetry: the conic
            # seed can miss rays the true surface catches -- restart
            # those from the vertex-plane intercept (as the biconic
            # seeding does)
            uz_safe = jnp.where(uz == 0, 1., uz)
            s0 = jnp.where(jnp.isnan(s0), -z/uz_safe, s0)
        s = _newton_root("radial", iters, tol, s0, x, y, z,
                         ux, uy, uz, c, k, jnp.zeros(()),
                         jnp.zeros(()), aspherics, aspherics_odd,
                         xy_poly)
        if not has_xy:
            s = jnp.where(jnp.isnan(s0) & (c != 0), jnp.nan, s)
    return s


def refract(x, y, ux, uy, uz, mu, c, k, aspherics, aspherics_odd=None):
    """Vector Snell / mirror reflection on components
    (reference elements.py:351)."""
    e = normal_radial(x, y, c, k, aspherics, aspherics_odd)
    nx, ny = x*e, y*e
    r2 = nx*nx + ny*ny + 1.
    muf = jnp.abs(mu)
    a = muf*(ux*nx + uy*ny + uz)/r2
    # reflection (mu == -1, muf == 1)
    rx, ry, rz = ux - 2*a*nx, uy - 2*a*ny, uz - 2*a
    # refraction
    b = (mu*mu - 1)/r2
    disc = a*a - b
    g = -a + jnp.sign(mu)*_sqrt0(disc)
    g = jnp.where(disc < 0, jnp.nan, g)
    tx, ty, tz = muf*ux + g*nx, muf*uy + g*ny, muf*uz + g
    ox = jnp.where(mu == -1, rx, tx)
    oy = jnp.where(mu == -1, ry, ty)
    oz = jnp.where(mu == -1, rz, tz)
    ox = jnp.where(mu == 1, ux, ox)
    oy = jnp.where(mu == 1, uy, oy)
    oz = jnp.where(mu == 1, uz, oz)
    return ox, oy, oz


from typing import NamedTuple


class SurfaceSpec(NamedTuple):
    """Static (compile-time) per-surface specialization flags.

    Derived on the host from the concrete table values by
    `specialize`; passed as a static jit argument so each unrolled
    surface only emits the ops it needs.  kind: 0 = passthrough
    (mu == 1), 1 = refract, 2 = mirror (mu == -1)."""

    flat: bool        # curvature == 0
    spherical: bool   # conic == 0 (and not flat)
    aspheric: bool    # any even-aspheric coefficient nonzero
    rotated: bool     # rot != identity
    off_axis: bool    # offset has nonzero x/y
    alternate: bool   # alternate (far) conic intersection
    kind: int
    finite_aperture: bool
    off_sign: int     # sign of the axial offset (static geometry)
    odd: bool = False  # any odd-aspheric coefficient nonzero
    biconic: bool = False  # x-axis figure differs from y (anamorphic)
    toroidal: bool = False  # swept y-z curve (toroid) row
    grating: bool = False  # linear diffraction grating on the row
    cyl_axis: int = 0  # pure conic cylinder: 1 = curved in y only,
    #                    2 = curved in x only (closed-form intercept
    #                    instead of the seeded Newton)
    doe: bool = False  # radial diffractive phase (kinoform) on the row
    freeform: bool = False  # XY-monomial freeform figure on the row


def specialize(table):
    """Host-side: derive the static SurfaceSpec tuple from a (NumPy)
    SurfaceTable.  Pose deltas (tilt/decenter) are folded first, so a
    concretely tilted/decentered row gets rotated/off_axis flags."""
    import numpy as np
    from .tables import lower_pose
    table = lower_pose(table)
    specs = []
    s = np.asarray(table.curvature).shape[0]
    for j in range(s):
        c = float(np.asarray(table.curvature)[j])
        k = float(np.asarray(table.conic)[j])
        asp = np.asarray(table.aspherics)[j]
        asp_odd = np.asarray(getattr(table, "aspherics_odd",
                                     np.zeros((s, 0))))[j]
        rot = np.asarray(table.rot)[j]
        off = np.asarray(table.offset)[j]
        mu = float(np.asarray(table.mu)[j])
        alt = float(np.asarray(table.alternate)[j])
        rad = float(np.asarray(table.radius)[j])
        kind = 0 if mu == 1. else (2 if mu == -1. else 1)
        cdx = np.asarray(getattr(table, "curvature_dx", None))
        kdx = np.asarray(getattr(table, "conic_dx", None))
        tor = np.asarray(getattr(table, "toroidal", None))
        grat = np.asarray(getattr(table, "grating_dy", None))
        doe_all = getattr(table, "doe", None)
        doe_row = (np.zeros(0) if doe_all is None
                   else np.asarray(doe_all)[j])
        xy_all = getattr(table, "xy_poly", None)
        xy_row = (np.zeros(0) if xy_all is None
                  else np.asarray(xy_all)[j])
        cdx = 0. if cdx.ndim == 0 else float(cdx[j])
        kdx = 0. if kdx.ndim == 0 else float(kdx[j])
        tor = 0. if tor.ndim == 0 else float(tor[j])
        grat = 0. if grat.ndim == 0 else float(grat[j])
        figured = bool((asp.size and np.any(asp != 0))
                       or (asp_odd.size and np.any(asp_odd != 0)))
        cyl_axis = 0
        if not figured:
            if tor != 0. and c + cdx == 0. and c != 0.:
                cyl_axis = 1      # toroid with zero rotation curvature
            elif tor == 0. and (cdx != 0. or kdx != 0.):
                if c + cdx == 0. and c != 0.:
                    cyl_axis = 1  # x-flat biconic: y-cylinder
                elif c == 0. and c + cdx != 0.:
                    cyl_axis = 2  # y-flat biconic: x-cylinder
        specs.append(SurfaceSpec(
            flat=(c == 0.),
            spherical=(k == 0.),
            aspheric=bool(asp.size and np.any(asp != 0)),
            rotated=not np.allclose(rot, np.eye(3)),
            off_axis=bool(off[0] != 0 or off[1] != 0),
            alternate=bool(alt != 0),
            kind=kind,
            finite_aperture=bool(np.isfinite(rad)),
            off_sign=int(np.sign(off[2])) or 1,
            odd=bool(asp_odd.size and np.any(asp_odd != 0)),
            biconic=bool((cdx != 0. or kdx != 0.) and tor == 0.),
            toroidal=bool(tor != 0.),
            grating=bool(grat != 0.),
            cyl_axis=cyl_axis,
            doe=bool(doe_row.size and np.any(doe_row != 0)),
            freeform=bool(xy_row.size and np.any(xy_row != 0)),
        ))
        if specs[-1].freeform and (specs[-1].biconic
                                   or specs[-1].toroidal):
            raise NotImplementedError(
                "row %d combines an anamorphic base with a freeform "
                "XY figure; express the full figure in xy_poly "
                "(quadratic terms carry the cylinder power)" % j)
    return tuple(specs)


def with_pose(specs, rows=None):
    """Force the rotated/off_axis flags on the given spec rows
    (default: every row but the object) so the pose parameters they
    gate -- rot (from table.tilt via tables.lower_pose) and the
    transverse offset (from table.decenter) -- stay LIVE in the
    statically specialized engines.  A specialization derived from the
    nominal (zero-pose) table bakes them out, so gradients at the
    nominal point would be structurally zero.  Forward results are
    unchanged (identity rotation applied, zero transverse offset
    subtracted); use for pose gradients/tolerancing at or near the
    nominal alignment (reference elements.py:116-147 keeps pose a
    first-class parameter the same way)."""
    if rows is None or rows is True:
        live = set(range(1, len(specs)))
    else:
        live = set(int(r) for r in rows)
    return tuple(s._replace(rotated=True, off_axis=True)
                 if j in live else s for j, s in enumerate(specs))


def intercept_spec(x, y, z, ux, uy, uz, c, k, alternate, spec):
    """Specialized conic intercept: assumes unit direction vectors
    (uu == 1 when spherical), drops the conic terms when spherical,
    and the whole quadratic when flat."""
    if spec.flat:
        uz_safe = jnp.where(uz == 0, 1., uz)
        return -z/uz_safe
    if spec.spherical:
        uy_ = ux*x + uy*y + uz*z
        uu = 1.
        yy = x*x + y*y + z*z
    else:
        k1 = 1 + k
        uy_ = ux*x + uy*y + k1*uz*z
        uu = ux*ux + uy*uy + k1*uz*uz
        yy = x*x + y*y + k1*z*z
    d = c*uy_ - uz
    e = c*uu
    f = c*yy - 2*z
    disc = d*d - e*f
    g = _sqrt0(disc)
    if spec.alternate:
        g = -g
    if spec.spherical:
        # e == c, a per-surface scalar: the reciprocal is computed
        # once (constant-folded when c is baked in), turning the
        # per-ray divide into a multiply
        s = (d + g)*(-1./c)
    else:
        e_safe = jnp.where(e == 0, 1., e)
        gd_safe = jnp.where(g == d, 1., g - d)
        s = jnp.where(e == 0, f/gd_safe, -(d + g)/e_safe)
    s = jnp.where(disc < 0, jnp.nan, s)
    return s


def refract_spec(x, y, z, ux, uy, uz, mu, c, k, aspherics, spec,
                 aspherics_odd=None):
    """Specialized Snell/mirror refraction at the on-surface point
    (x, y, z local)."""
    if spec.kind == 0:
        return ux, uy, uz
    figured = spec.aspheric or spec.odd
    if spec.flat and not figured:
        # plane: normal is exactly +z
        if spec.kind == 2:
            return ux, uy, -uz
        muf = jnp.abs(mu)
        a = muf*uz
        disc = a*a - (mu*mu - 1)
        g = -a + jnp.sign(mu)*_sqrt0(disc)
        g = jnp.where(disc < 0, jnp.nan, g)
        return muf*ux, muf*uy, muf*uz + g
    if not figured:
        # polynomial (implicit-gradient) conic normal at the
        # on-surface point: the conic is c(x^2+y^2+(1+k)z^2) - 2z = 0,
        # so N = (-c x, -c y, 1 - c(1+k) z) -- no rsqrt.  For a sphere
        # the on-surface identity c^2(x^2+y^2+z^2) = 2cz makes
        # |N| == 1 EXACTLY, so the reciprocal normalization drops out
        # too (and is more accurate than TPU's ~1e-6 approximate
        # divide).  This form is also exact beyond the hemisphere
        # (alternate intersections), where the old radial-slope
        # normalization lost the sign of 1 - c z.
        nx, ny = -c*x, -c*y
        if spec.spherical:
            nz = 1. - c*z
            dot = ux*nx + uy*ny + uz*nz
            if spec.kind == 2:
                a2 = 2.*dot
                return ux - a2*nx, uy - a2*ny, uz - a2*nz
            muf = jnp.abs(mu)
            a = muf*dot
            disc = a*a - (mu*mu - 1)
        else:
            nz = 1. - (1 + k)*c*z
            dot = ux*nx + uy*ny + uz*nz
            ir2 = 1./(nx*nx + ny*ny + nz*nz)
            if spec.kind == 2:
                a2 = 2.*dot*ir2
                return ux - a2*nx, uy - a2*ny, uz - a2*nz
            muf = jnp.abs(mu)
            a = muf*dot*ir2
            disc = a*a - (mu*mu - 1)*ir2
        g = -a + jnp.sign(mu)*_sqrt0(disc)
        g = jnp.where(disc < 0, jnp.nan, g)
        return muf*ux + g*nx, muf*uy + g*ny, muf*uz + g*nz
    r2s = x*x + y*y
    e = -c*jax.lax.rsqrt(jnp.maximum(1 - (1 + k)*c*c*r2s, TINY))
    if spec.aspheric:
        e = e - _dpoly_even(r2s, aspherics)
    if spec.odd:
        e = e - _dpoly_odd(r2s, aspherics_odd)
    nx, ny = x*e, y*e
    r2 = nx*nx + ny*ny + 1.
    ir2 = 1./r2
    dot = ux*nx + uy*ny + uz
    if spec.kind == 2:
        a2 = 2.*dot*ir2
        return ux - a2*nx, uy - a2*ny, uz - a2
    muf = jnp.abs(mu)
    a = muf*dot*ir2
    b = (mu*mu - 1)*ir2
    disc = a*a - b
    g = -a + jnp.sign(mu)*_sqrt0(disc)
    g = jnp.where(disc < 0, jnp.nan, g)
    return muf*ux + g*nx, muf*uy + g*ny, muf*uz + g


def surface_step_spec(state, surf, spec, clip):
    """Specialized transfer-intercept-refract step (same semantics as
    surface_step; static branches from SurfaceSpec)."""
    x, y, z, ux, uy, uz = state
    if spec.off_axis:
        x = x - surf.offset[0]
        y = y - surf.offset[1]
    z = z - surf.offset[2]
    if spec.rotated:
        r = surf.rot
        x, y, z = rot_apply(r, x, y, z)
        ux, uy, uz = rot_apply(r, ux, uy, uz)
    if spec.cyl_axis == 1:
        t = intercept_cyl(y, z, uy, uz, surf.curvature, surf.conic,
                          surf.alternate)
    elif spec.cyl_axis == 2:
        t = intercept_cyl(x, z, ux, uz,
                          surf.curvature + surf.curvature_dx,
                          surf.conic + surf.conic_dx, surf.alternate)
    elif spec.toroidal:
        t = intercept_toroid(x, y, z, ux, uy, uz,
                             surf.curvature + surf.curvature_dx,
                             surf.curvature, surf.conic,
                             surf.aspherics, surf.alternate,
                             aspherics_odd=surf.aspherics_odd)
    elif spec.biconic:
        t = intercept_biconic(x, y, z, ux, uy, uz,
                              surf.curvature + surf.curvature_dx,
                              surf.conic + surf.conic_dx,
                              surf.curvature, surf.conic,
                              surf.aspherics, surf.alternate,
                              aspherics_odd=surf.aspherics_odd)
    elif spec.freeform:
        t = intercept(x, y, z, ux, uy, uz, surf.curvature, surf.conic,
                      surf.aspherics, surf.alternate,
                      aspherics_odd=surf.aspherics_odd,
                      xy_poly=surf.xy_poly)
    elif spec.aspheric or spec.odd:
        t = intercept(x, y, z, ux, uy, uz, surf.curvature, surf.conic,
                      surf.aspherics, surf.alternate,
                      aspherics_odd=surf.aspherics_odd)
    else:
        t = intercept_spec(x, y, z, ux, uy, uz, surf.curvature,
                           surf.conic, surf.alternate, spec)
    x1, y1, z1 = x + t*ux, y + t*uy, z + t*uz
    topt = t*surf.n_before
    ux0, uy0, uz0 = ux, uy, uz
    if clip and spec.finite_aperture:
        bad = x1*x1 + y1*y1 > surf.radius*surf.radius
        nan = jnp.full_like(x1, jnp.nan)
        ux0 = jnp.where(bad, nan, ux0)
        uy0 = jnp.where(bad, nan, uy0)
        uz0 = jnp.where(bad, nan, uz0)
    if spec.grating or spec.doe:
        # substrate normal per figure kind, then the generalized
        # grating/phase solve (exact Snell at zero order)
        if spec.toroidal:
            ngx, ngy = normal_toroid(
                x1, y1, surf.curvature + surf.curvature_dx,
                surf.curvature, surf.conic, surf.aspherics,
                surf.aspherics_odd)
        elif spec.biconic:
            ngx, ngy = normal_biconic(
                x1, y1, surf.curvature + surf.curvature_dx,
                surf.conic + surf.conic_dx, surf.curvature,
                surf.conic, surf.aspherics, surf.aspherics_odd)
        elif spec.freeform:
            ngx, ngy = normal_freeform(
                x1, y1, surf.curvature, surf.conic, surf.aspherics,
                surf.aspherics_odd, surf.xy_poly)
        elif spec.flat and not (spec.aspheric or spec.odd):
            ngx = jnp.zeros_like(x1)
            ngy = jnp.zeros_like(y1)
        else:
            e = normal_radial(x1, y1, surf.curvature, surf.conic,
                              surf.aspherics, surf.aspherics_odd)
            ngx, ngy = x1*e, y1*e
        gdy = surf.grating_dy if spec.grating else 0.
        ux1, uy1, uz1 = refract_grating(
            x1, y1, ux0, uy0, uz0, surf.mu, gdy,
            ngx, ngy, doe=surf.doe if spec.doe else None)
        if spec.doe:
            # the imprinted phase is optical path: the OPD/PSF
            # machinery must see m lambda phi/(2 pi) = psi * n_after
            # added at the surface (Fermat across the kinoform zones)
            topt = topt + _poly_even(x1*x1 + y1*y1,
                                     surf.doe)*surf.n_after
    elif spec.cyl_axis and spec.kind != 0:
        if spec.cyl_axis == 1:
            uy1, ux1, uz1 = refract_cyl(
                y1, z1, uy0, ux0, uz0, surf.mu, surf.curvature,
                surf.conic, spec.kind)
        else:
            ux1, uy1, uz1 = refract_cyl(
                x1, z1, ux0, uy0, uz0, surf.mu,
                surf.curvature + surf.curvature_dx,
                surf.conic + surf.conic_dx, spec.kind)
    elif spec.cyl_axis or (spec.kind == 0
                           and (spec.biconic or spec.toroidal)):
        # passthrough figured rows: skip the whole normal+Snell chain
        # (the select inside _refract_general would discard it anyway)
        ux1, uy1, uz1 = ux0, uy0, uz0
    elif spec.toroidal:
        ux1, uy1, uz1 = refract_toroid(
            x1, y1, ux0, uy0, uz0, surf.mu,
            surf.curvature + surf.curvature_dx,
            surf.curvature, surf.conic, surf.aspherics,
            aspherics_odd=surf.aspherics_odd)
    elif spec.biconic:
        ux1, uy1, uz1 = refract_biconic(
            x1, y1, ux0, uy0, uz0, surf.mu,
            surf.curvature + surf.curvature_dx,
            surf.conic + surf.conic_dx,
            surf.curvature, surf.conic, surf.aspherics,
            aspherics_odd=surf.aspherics_odd)
    elif spec.freeform:
        if spec.kind == 0:
            ux1, uy1, uz1 = ux0, uy0, uz0
        else:
            ux1, uy1, uz1 = refract_freeform(
                x1, y1, ux0, uy0, uz0, surf.mu, surf.curvature,
                surf.conic, surf.aspherics, surf.aspherics_odd,
                surf.xy_poly)
    else:
        ux1, uy1, uz1 = refract_spec(x1, y1, z1, ux0, uy0, uz0,
                                     surf.mu, surf.curvature,
                                     surf.conic, surf.aspherics, spec,
                                     aspherics_odd=surf.aspherics_odd)
    out = ((x1, y1, z1), (ux1, uy1, uz1), (ux, uy, uz), topt)
    if spec.rotated:
        r = surf.rot
        nstate = (*rot_apply_t(r, x1, y1, z1),
                  *rot_apply_t(r, ux1, uy1, uz1))
    else:
        nstate = (x1, y1, z1, ux1, uy1, uz1)
    return nstate, out


def _intercept_anam(x, y, z, ux, uy, uz, surf):
    """Per-row biconic-or-toroid intercept for the dynamic scan path
    (row kind is a traced value; both candidates evaluate, a where
    selects -- the static spec path pays for only one).  A freeform
    XY figure (zero-padded table column) rides the biconic candidate:
    a symmetric base (zero curvature/conic split) plus the monomial
    terms is exactly the freeform sag."""
    cx = surf.curvature + surf.curvature_dx
    kx = surf.conic + surf.conic_dx
    xy = getattr(surf, "xy_poly", None)
    tb = intercept_biconic(x, y, z, ux, uy, uz, cx, kx,
                           surf.curvature, surf.conic, surf.aspherics,
                           surf.alternate,
                           aspherics_odd=surf.aspherics_odd,
                           xy_poly=xy)
    tt = intercept_toroid(x, y, z, ux, uy, uz, cx,
                          surf.curvature, surf.conic, surf.aspherics,
                          surf.alternate,
                          aspherics_odd=surf.aspherics_odd,
                          xy_poly=xy)
    return jnp.where(surf.toroidal != 0, tt, tb)


def _refract_anam(x, y, ux, uy, uz, surf):
    cx = surf.curvature + surf.curvature_dx
    kx = surf.conic + surf.conic_dx
    gbx, gby = normal_biconic(x, y, cx, kx, surf.curvature,
                              surf.conic, surf.aspherics,
                              surf.aspherics_odd)
    gtx, gty = normal_toroid(x, y, cx, surf.curvature, surf.conic,
                             surf.aspherics, surf.aspherics_odd)
    tor = surf.toroidal != 0
    gx = jnp.where(tor, gtx, gbx)
    gy = jnp.where(tor, gty, gby)
    xy = getattr(surf, "xy_poly", None)
    if xy is not None and xy.shape[-1]:
        dpx, dpy = _dpoly_xy(x, y, xy)
        gx = gx - dpx
        gy = gy - dpy
    return refract_grating(x, y, ux, uy, uz, surf.mu,
                           surf.grating_dy, gx, gy,
                           doe=getattr(surf, "doe", None))


def surface_step(state, surf, clip, biconic=False):
    """One transfer-intercept-refract step on component state
    (x, y, z, ux, uy, uz).  Returns (next_state, local_outputs) where
    local outputs are the per-surface (y, u, i, t) components in the
    surface-normal frame (reference system.py:459-464).

    biconic (static): use the general anamorphic sag (x/y curvature
    split via surf.curvature_dx/conic_dx) -- seed + Newton intercept
    instead of the closed form.  Only set when the table actually
    contains anamorphic rows (ops.tables.is_anamorphic)."""
    x, y, z, ux, uy, uz = state
    ox, oy, oz = surf.offset[0], surf.offset[1], surf.offset[2]
    r = surf.rot
    x, y, z = rot_apply(r, x - ox, y - oy, z - oz)
    ix, iy, iz = rot_apply(r, ux, uy, uz)
    xy = getattr(surf, "xy_poly", None)
    if xy is not None and not xy.shape[-1]:
        xy = None
    if biconic:
        t = _intercept_anam(x, y, z, ix, iy, iz, surf)
    else:
        t = intercept(x, y, z, ix, iy, iz, surf.curvature, surf.conic,
                      surf.aspherics, surf.alternate,
                      aspherics_odd=surf.aspherics_odd, xy_poly=xy)
    x1, y1, z1 = x + t*ix, y + t*iy, z + t*iz
    ux0, uy0, uz0 = ix, iy, iz
    if clip:
        bad = x1*x1 + y1*y1 > surf.radius*surf.radius
        nan = jnp.full_like(x1, jnp.nan)
        ux0 = jnp.where(bad, nan, ux0)
        uy0 = jnp.where(bad, nan, uy0)
        uz0 = jnp.where(bad, nan, uz0)
    topt = t*surf.n_before
    if biconic:
        ux1, uy1, uz1 = _refract_anam(x1, y1, ux0, uy0, uz0, surf)
        doe = getattr(surf, "doe", None)
        if doe is not None and doe.shape[-1]:
            # imprinted diffractive phase = optical path (see
            # surface_step_spec); zero-coefficient rows add zero
            topt = topt + _poly_even(x1*x1 + y1*y1,
                                     doe)*surf.n_after
    elif xy is not None:
        ux1, uy1, uz1 = refract_freeform(
            x1, y1, ux0, uy0, uz0, surf.mu, surf.curvature,
            surf.conic, surf.aspherics, surf.aspherics_odd, xy)
    else:
        ux1, uy1, uz1 = refract(x1, y1, ux0, uy0, uz0, surf.mu,
                                surf.curvature, surf.conic,
                                surf.aspherics,
                                aspherics_odd=surf.aspherics_odd)
    out = ((x1, y1, z1), (ux1, uy1, uz1), (ix, iy, iz), topt)
    nx, ny, nz = rot_apply_t(r, x1, y1, z1)
    nux, nuy, nuz = rot_apply_t(r, ux1, uy1, uz1)
    return (nx, ny, nz, nux, nuy, nuz), out


def split(v):
    """(N, 3) -> component tuple."""
    return v[..., 0], v[..., 1], v[..., 2]


def join(x, y, z):
    """component tuple -> (..., 3)."""
    return jnp.stack([x, y, z], axis=-1)
