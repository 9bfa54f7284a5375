"""Double-single ("df32") arithmetic and the extended-precision trace.

TPU v5e has no hardware float64: jax f64 is software-emulated and
~70x slower than f32 on the VPU.  This module implements the classic
double-word arithmetic (Dekker 1971 / Knuth two_sum; the float32
analog of double-double) on (hi, lo) pairs of f32 arrays: ~2^-47
relative accuracy (~7e-15) per operation at a small constant multiple
of f32 cost, all of it perfectly-tiled elementwise VPU work.

Used by the parity-grade throughput engine: the same
transfer-intercept-refract chain as ops.kernels (axial flat/spherical/
conic/even-aspheric surfaces, mirrors, alternate intersections,
axis-flip folds), evaluated in df32 and unrolled per surface
(`plan` + `trace_df32_final`), with `pallas_trace_df32` as the
device kernel.  Spot positions agree with the f64 trace to ~1e-12
(vs ~1e-6 for plain f32), i.e. the <= 1e-9 spot-RMS parity target at
f32-class speed: on v5e 5.8e9 intersections/s/chip in the default
`fast` plan mode (one-round div/sqrt refinements, 5.9e-13 spot
parity) and 4.9e9 in exact mode (9.5e-14), 12-14x emulated f64.

CAUTION -- the error-free transforms require the compiler to emit the
rounded f32 mul/add exactly as written.  XLA's fusion codegen (CPU and
TPU alike) contracts a product feeding an add/sub into a fused
multiply-add of the *exact* product, silently degrading the lo words
to f32 level; `optimization_barrier` does not survive and the
fast-math/excess-precision flags do not help.  Therefore: run this
arithmetic eagerly (op-by-op) or inside the Pallas kernel (Mosaic
emits VPU ops as written) -- never under a fused XLA jit.  TPU f32
div/sqrt are additionally only ~1e-6/~1e-4 accurate, so div and sqrt
refine twice.  tests/test_df32.py covers the eager path; bench.py
verifies the real-TPU kernel parity on every run.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels as K

F32 = jnp.float32
_SPLITTER = 4097.  # 2^12 + 1 (f32 has a 24-bit significand)
_TINY32 = np.float32(1e-30)


# -- error-free transforms -------------------------------------------------

def two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def quick_two_sum(a, b):
    """Assumes |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = _SPLITTER*a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    p = a*b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah*bh - p) + ah*bl + al*bh) + al*bl


# -- df32 numbers: (hi, lo) pairs ------------------------------------------

def const(v):
    """Split a float64 scalar into an exact (hi, lo) f32 pair of
    NumPy scalars (literals under tracing, Pallas-embeddable)."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


def from_f64(x):
    """Split a float64 array into an (hi, lo) f32 pair, exactly."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def to_f64(a):
    return np.asarray(a[0], np.float64) + np.asarray(a[1], np.float64)


def zero_like(a):
    z = jnp.zeros_like(a[0])
    return z, z


def neg(a):
    return -a[0], -a[1]


def add(a, b):
    s, e = two_sum(a[0], b[0])
    return quick_two_sum(s, e + (a[1] + b[1]))


def sub(a, b):
    return add(a, neg(b))


def mul(a, b):
    p, e = two_prod(a[0], b[0])
    return quick_two_sum(p, e + (a[0]*b[1] + a[1]*b[0]))


def sqr(a):
    p, e = two_prod(a[0], a[0])
    return quick_two_sum(p, e + 2*(a[0]*a[1]))


def scale(a, s):
    """Multiply by an exact power of two (or other exact f32)."""
    return a[0]*s, a[1]*s


def div(a, b):
    """Two refinement rounds: TPU f32 divide is reciprocal-based and
    only ~1e-6 accurate, so a single remainder step is not enough to
    reach full df32 precision."""
    zero = jnp.zeros_like(a[0])
    q1 = a[0]/b[0]
    r = sub(a, mul((q1, zero), b))
    q = quick_two_sum(q1, (r[0] + r[1])/b[0])
    r = sub(a, mul(q, b))
    return add(q, ((r[0] + r[1])/b[0], zero))


def sqrt(a):
    """Two Karp-Markstein rounds: TPU f32 sqrt comes from an rsqrt
    approximation with ~1e-4 relative error, so one residual
    correction only reaches ~1e-8; the second lands at ~(err)^2 of
    that.  NaN-deliberate: negative inputs yield NaN like jnp.sqrt."""
    zero = jnp.zeros_like(a[0])
    s1 = jnp.sqrt(a[0])
    ok = s1 > 0
    inv2 = jnp.where(ok, .5/jnp.where(ok, s1, 1.), 0.)
    r = sub(a, sqr((s1, zero)))
    s = quick_two_sum(s1, (r[0] + r[1])*inv2)
    r = sub(a, sqr(s))
    return add(s, ((r[0] + r[1])*inv2, zero))


def div1(a, b):
    """One-round division: ~1e-12 relative (the f32 seed divide is
    ~1e-6; one df correction squares that).  The `fast` plan mode uses
    this -- still 3 decades inside the 1e-9 parity target."""
    q1 = a[0]/b[0]
    r = sub(a, mul((q1, jnp.zeros_like(q1)), b))
    return quick_two_sum(q1, (r[0] + r[1])/b[0])


def sqrt1(a):
    """One Karp-Markstein round: ~1e-8 relative (f32 rsqrt seed is
    ~1e-4).  Used by the `fast` plan mode."""
    zero = jnp.zeros_like(a[0])
    s1 = jnp.sqrt(a[0])
    ok = s1 > 0
    inv2 = jnp.where(ok, .5/jnp.where(ok, s1, 1.), 0.)
    r = sub(a, sqr((s1, zero)))
    return quick_two_sum(s1, (r[0] + r[1])*inv2)


def where(cond, a, b):
    return jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])


# -- the extended-precision surface chain ----------------------------------

def _dot3(ax, ay, az, bx, by, bz):
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


def _broadcast(cst, like):
    return (jnp.broadcast_to(cst[0], like.shape),
            jnp.broadcast_to(cst[1], like.shape))


def _poly_even_df(r2, coeffs):
    """Horner over even powers: sum coeffs[i] * r2^(i+1)."""
    acc = None
    for ci in coeffs[::-1]:
        acc = ci if acc is None else add(mul(acc, r2), ci)
    return mul(acc, r2)


def _dpoly_even_df(r2, coeffs):
    """d/d(r) of the even polynomial divided by r:
    sum 2(i+1) coeffs[i] r2^i."""
    acc = None
    for i in range(len(coeffs) - 1, -1, -1):
        ci = scale(coeffs[i], np.float32(2*(i + 1)))
        acc = ci if acc is None else add(mul(acc, r2), ci)
    return acc


def _max_tiny(a):
    """Floor the pair at a tiny positive value (division guards; the
    floored case only arises for degenerate geometry)."""
    ok = a[0] > _TINY32
    return jnp.where(ok, a[0], _TINY32), jnp.where(ok, a[1], 0.)


def _poly_odd_df(r2, r, coeffs):
    """sum coeffs[j] * r^(2j+1) with r = sqrt(r2) precomputed."""
    acc = None
    for cj in coeffs[::-1]:
        acc = cj if acc is None else add(mul(acc, r2), cj)
    return mul(r, acc)


def _dpoly_odd_df(r2, r, coeffs, dv):
    """2 d/d(r2) of _poly_odd_df: P(r2)/r + 2 r P'(r2) (the vertex
    cusp of the r^1 term is floored like kernels._dpoly_odd)."""
    p = None
    for cj in coeffs[::-1]:
        p = cj if p is None else add(mul(p, r2), cj)
    dp = None
    for j in range(len(coeffs) - 1, 0, -1):
        cj = scale(coeffs[j], np.float32(j))
        dp = cj if dp is None else add(mul(dp, r2), cj)
    out = dv(p, _max_tiny(r))
    if dp is not None:
        out = add(out, scale(mul(r, dp), 2.))
    return out


def _sag_df(x, y, z, c, k1, asp, dv=None, sq=None, asp_odd=()):
    """z - surface_sag(x, y) (kernels.sag in df32)."""
    dv, sq = dv or div, sq or sqrt
    r2 = add(sqr(x), sqr(y))
    cr2 = mul(c, r2)
    den = add(_ONE, sq(sub(_ONE, mul(k1, mul(c, cr2)))))
    e = sub(z, dv(cr2, den))
    if asp:
        e = sub(e, _poly_even_df(r2, asp))
    if asp_odd:
        e = sub(e, _poly_odd_df(r2, sq(r2), asp_odd))
    return e


def _normal_radial_df(x, y, c, k1, asp, dv=None, sq=None, asp_odd=()):
    """Radial factor of the normal (kernels.normal_radial in df32)."""
    dv, sq = dv or div, sq or sqrt
    r2 = add(sqr(x), sqr(y))
    e = neg(dv(c, sq(sub(_ONE, mul(k1, mul(sqr(c), r2))))))
    if asp:
        e = sub(e, _dpoly_even_df(r2, asp))
    if asp_odd:
        e = sub(e, _dpoly_odd_df(r2, sq(r2), asp_odd, dv))
    return e


ASPHERIC_ITERS = 8
ASPHERIC_TOL = 1e-9  # matches kernels.ASPHERIC_TOL
ANAM_F32_ITERS = 6   # cheap f32 Newton pre-polish on anamorphic rows
ANAM_DF_ITERS = 2    # df32 polish rounds (3 in exact mode)


# -- anamorphic (biconic / cylinder / toroid) rows -------------------------
#
# The extended vocabulary (reference elements.py:333-369 generalized to
# the biconic/toroidal sags of ops/kernels.py:101-272) in double-single
# arithmetic.  Pure conic cylinders are quadrics in one transverse
# coordinate, so they get the same cancellation-free closed form as
# spheres -- full parity-grade speed.  General biconics/toroids run a
# mixed-precision Newton: the y-conic closed form seeds (f32), a few
# f32 iterations converge to f32 noise, and two df32 polish rounds
# (quadratic convergence) land at df32 precision.

def _sag_biconic_df(x, y, z, an, dv, sq):
    """z - biconic_sag (kernels.sag_biconic in df32)."""
    x2, y2 = sqr(x), sqr(y)
    a = add(mul(an["cx"], x2), mul(an["cy"], y2))
    b = add(mul(an["bxc"], x2), mul(an["byc"], y2))
    e = sub(z, dv(a, add(_ONE, sq(sub(_ONE, b)))))
    r2 = add(x2, y2)
    if an["asp"]:
        e = sub(e, _poly_even_df(r2, an["asp"]))
    if an["asp_odd"]:
        e = sub(e, _poly_odd_df(r2, sq(r2), an["asp_odd"]))
    return e


def _normal_biconic_df(x, y, an, dv, sq):
    """Transverse normal components (kernels.normal_biconic in df32):
    gx = -x (2 cx (1+s) + a bxc / s) / (1+s)^2, bxc = (1+kx) cx^2."""
    x2, y2 = sqr(x), sqr(y)
    a = add(mul(an["cx"], x2), mul(an["cy"], y2))
    b = add(mul(an["bxc"], x2), mul(an["byc"], y2))
    s = sq(sub(_ONE, b))
    one_s = add(_ONE, s)
    inv2 = sqr(dv(_ONE, one_s))
    a_s = dv(a, _max_tiny(s))
    gx = neg(mul(x, mul(add(scale(mul(an["cx"], one_s), 2.),
                            mul(a_s, an["bxc"])), inv2)))
    gy = neg(mul(y, mul(add(scale(mul(an["cy"], one_s), 2.),
                            mul(a_s, an["byc"])), inv2)))
    r2 = add(x2, y2)
    d = None
    if an["asp"]:
        d = _dpoly_even_df(r2, an["asp"])
    if an["asp_odd"]:
        do = _dpoly_odd_df(r2, sq(r2), an["asp_odd"], dv)
        d = do if d is None else add(d, do)
    if d is not None:
        gx = sub(gx, mul(x, d))
        gy = sub(gy, mul(y, d))
    return gx, gy


def _ycurve_df(y, an, dv, sq):
    """(sag, d sag/dy) of the toroid's y-z generating curve in df32
    (kernels._ycurve)."""
    y2 = sqr(y)
    sqv = sq(sub(_ONE, mul(an["byc"], y2)))
    zy = dv(mul(an["cy"], y2), add(_ONE, sqv))
    dzy = dv(mul(an["cy"], y), _max_tiny(sqv))
    if an["asp"]:
        zy = add(zy, _poly_even_df(y2, an["asp"]))
        dzy = add(dzy, mul(y, _dpoly_even_df(y2, an["asp"])))
    if an["asp_odd"]:
        ya = sq(y2)
        zy = add(zy, _poly_odd_df(y2, ya, an["asp_odd"]))
        dzy = add(dzy, mul(y, _dpoly_odd_df(y2, ya, an["asp_odd"],
                                            dv)))
    return zy, dzy


def _sag_toroid_df(x, y, z, an, dv, sq):
    """z - toroidal_sag (kernels.sag_toroid in df32)."""
    zy, _ = _ycurve_df(y, an, dv, sq)
    crp = dv(an["cr"], sub(_ONE, mul(an["cr"], zy)))
    x2 = sqr(x)
    w = sq(sub(_ONE, mul(x2, sqr(crp))))
    return sub(sub(z, zy), dv(mul(crp, x2), add(_ONE, w)))


def _normal_toroid_df(x, y, an, dv, sq):
    """(gx, gy) of the toroid normal (kernels.normal_toroid in df32)."""
    zy, dzy = _ycurve_df(y, an, dv, sq)
    crp = dv(an["cr"], sub(_ONE, mul(an["cr"], zy)))
    w = _max_tiny(sq(sub(_ONE, mul(sqr(x), sqr(crp)))))
    return neg(dv(mul(x, crp), w)), neg(dv(dzy, w))


def _xy_pows_df(v, deg):
    pows = [None, v]
    for _ in range(2, deg + 1):
        pows.append(mul(pows[-1], v))
    return pows


def _poly_xy_df(x, y, terms, deg):
    """sum c x^i y^j in df32.  `terms` is a tuple of
    (df_const, i, j); exponents (0, 0) broadcast the constant (the
    gradient term lists contain them)."""
    xp = _xy_pows_df(x, deg)
    yp = _xy_pows_df(y, deg)
    acc = None
    for cdf, i, j in terms:
        if i == 0 and j == 0:
            t = _broadcast(cdf, x[0])
        else:
            m = xp[i] if i else yp[j]
            if i and j:
                m = mul(m, yp[j])
            t = mul(cdf, m)
        acc = t if acc is None else add(acc, t)
    return acc


def _sag_freeform_df(x, y, z, an, dv, sq):
    """z - freeform_sag: symmetric conic/aspheric base (_sag_df) plus
    the triangular XY-monomial figure (kernels._poly_xy in df32)."""
    e = _sag_df(x, y, z, an["c"], an["k1"], an["asp"], dv, sq,
                an["asp_odd"])
    return sub(e, _poly_xy_df(x, y, an["xy"], an["deg"]))


def _normal_freeform_df(x, y, an, dv, sq):
    """(gx, gy) of the freeform normal: radial base factor plus the
    pre-differentiated monomial gradient terms (host-scaled, so the
    kernel only evaluates polynomials)."""
    e = _normal_radial_df(x, y, an["c"], an["k1"], an["asp"], dv, sq,
                          an["asp_odd"])
    gx, gy = mul(x, e), mul(y, e)
    if an["xy_gx"]:
        gx = sub(gx, _poly_xy_df(x, y, an["xy_gx"], an["deg"]))
    if an["xy_gy"]:
        gy = sub(gy, _poly_xy_df(x, y, an["xy_gy"], an["deg"]))
    return gx, gy


def _anam_funcs_df(an, dv, sq):
    if an["mode"] == "freeform":
        return (lambda x, y, z: _sag_freeform_df(x, y, z, an, dv, sq),
                lambda x, y: _normal_freeform_df(x, y, an, dv, sq))
    if an["mode"] == "toroid":
        return (lambda x, y, z: _sag_toroid_df(x, y, z, an, dv, sq),
                lambda x, y: _normal_toroid_df(x, y, an, dv, sq))
    return (lambda x, y, z: _sag_biconic_df(x, y, z, an, dv, sq),
            lambda x, y: _normal_biconic_df(x, y, an, dv, sq))


def _anam_funcs_f32(an):
    f = an["f32"]
    if an["mode"] == "freeform":
        return (lambda x, y, z: K.sag(x, y, z, f["cy"], f["ky"],
                                      f["asp"], f["asp_odd"])
                - K._poly_xy(x, y, f["xy"]),
                lambda x, y: K.normal_freeform(
                    x, y, f["cy"], f["ky"], f["asp"], f["asp_odd"],
                    f["xy"]))
    if an["mode"] == "toroid":
        return (lambda x, y, z: K.sag_toroid(
                    x, y, z, f["cr"], f["cy"], f["ky"], f["asp"],
                    f["asp_odd"]),
                lambda x, y: K.normal_toroid(
                    x, y, f["cr"], f["cy"], f["ky"], f["asp"],
                    f["asp_odd"]))
    return (lambda x, y, z: K.sag_biconic(
                x, y, z, f["cx"], f["kx"], f["cy"], f["ky"], f["asp"],
                f["asp_odd"]),
            lambda x, y: K.normal_biconic(
                x, y, f["cx"], f["kx"], f["cy"], f["ky"], f["asp"],
                f["asp_odd"]))


def _intercept_cyl_df(w, z, uw, uz, an, dv, sq):
    """Closed-form conic-cylinder intercept in df32: the quadric
    c (w^2 + (1+k) z^2) - 2 z = 0 in one transverse coordinate w
    (the same cancellation-free two-branch root selection as the
    rotationally-symmetric conic)."""
    c, k1 = an["c1"], an["k1"]
    kz = mul(k1, z)
    uy_ = add(mul(uw, w), mul(uz, kz))
    uu = add(sqr(uw), mul(k1, sqr(uz)))
    yy = add(sqr(w), mul(z, kz))
    d = sub(mul(c, uy_), uz)
    f = sub(mul(c, yy), scale(z, 2.))
    e_q = mul(c, uu)
    disc = sub(sqr(d), mul(e_q, f))
    g = sq(disc)
    # degenerate quadric (e_q == 0: ray parallel to the curved axis of
    # a parabolic cylinder) must take the conjugate-root form like
    # kernels.intercept_cyl, not divide by zero
    ez = e_q[0] == 0
    if an["alternate"]:
        g = neg(g)
        stable = ez
    else:
        stable = (d[0] < 0) | ez
    num = where(stable, f, neg(add(d, g)))
    den = where(stable, sub(g, d), e_q)
    den = where(den[0] == 0, _ONE, den)
    return dv(num, den)


def _normal_cyl_df(w, an, dv, sq):
    """Single-axis cylinder normal factor: g_w = w * e with
    e = -c/sqrt(1 - (1+k) c^2 w^2)."""
    e = neg(dv(an["c1"], sq(sub(_ONE, mul(an["bc"], sqr(w))))))
    return mul(w, e)


def _intercept_anam_df(x, y, z, ux, uy, uz, an, dv, sq):
    """Anamorphic intercept: closed form for conic cylinders,
    mixed-precision Newton for general biconics/toroids."""
    mode = an["mode"]
    if mode == "cyl_y":
        return _intercept_cyl_df(y, z, uy, uz, an, dv, sq)
    if mode == "cyl_x":
        return _intercept_cyl_df(x, z, ux, uz, an, dv, sq)
    f = an["f32"]
    x0, y0, z0 = x[0], y[0], z[0]
    ux0, uy0, uz0 = ux[0], uy[0], uz[0]
    s32 = K.intercept_conic(x0, y0, z0, ux0, uy0, uz0,
                            f["cy"], f["ky"], f["alt"])
    uz_safe = jnp.where(uz0 == 0, np.float32(1.), uz0)
    s32 = jnp.where(jnp.isnan(s32), -z0/uz_safe, s32)
    sag32, grad32 = _anam_funcs_f32(an)
    for _ in range(ANAM_F32_ITERS):
        px, py, pz = x0 + s32*ux0, y0 + s32*uy0, z0 + s32*uz0
        fn = sag32(px, py, pz)
        gx, gy = grad32(px, py)
        fp = ux0*gx + uy0*gy + uz0
        fp = jnp.where(fp == 0, np.float32(1.), fp)
        s32 = s32 - fn/fp
    sag_df, grad_df = _anam_funcs_df(an, dv, sq)
    s = (s32, jnp.zeros_like(s32))
    for _ in range(an["df_iters"]):
        px = add(x, mul(s, ux))
        py = add(y, mul(s, uy))
        pz = add(z, mul(s, uz))
        fn = sag_df(px, py, pz)
        gx, gy = grad_df(px, py)
        fp = add(add(mul(ux, gx), mul(uy, gy)), uz)
        ok = fp[0] != 0
        fp = (jnp.where(ok, fp[0], 1.), jnp.where(ok, fp[1], 0.))
        s = sub(s, dv(fn, fp))
    res = sag_df(add(x, mul(s, ux)), add(y, mul(s, uy)),
                 add(z, mul(s, uz)))
    good = jnp.abs(res[0]) <= ASPHERIC_TOL*(1 + jnp.abs(s[0]))
    nanv = (jnp.full_like(s[0], jnp.nan),)*2
    return where(good, s, nanv)


def _normal_anam_df(x, y, an, dv, sq):
    """(gx, gy) of the anamorphic row's normal."""
    mode = an["mode"]
    if mode == "cyl_y":
        return zero_like(x), _normal_cyl_df(y, an, dv, sq)
    if mode == "cyl_x":
        return _normal_cyl_df(x, an, dv, sq), zero_like(y)
    _, grad_df = _anam_funcs_df(an, dv, sq)
    return grad_df(x, y)


def _refract_grating_df(ux, uy, uz, mu, kind, gdy, nrm, dv, sq,
                        kick=None):
    """Diffraction-grating/phase refraction-reflection in df32
    (kernels.refract_grating with the branch selection static):
    b = mu u + T q + s with q = y-hat projected into the tangent
    plane and s an optional per-ray radial diffractive kick (sx, sy)
    (DOE rows), then u' = b + Gamma n.  nrm is (gx, gy) of the
    substrate normal (None = plane, where q = y-hat exactly).
    Evanescent orders give NaN through the sqrt of the negative
    discriminant."""
    if nrm is None:
        bx = mul(mu, ux)
        by = mul(mu, uy) if gdy is None else add(mul(mu, uy), gdy)
        if kick is not None:
            bx = add(bx, kick[0])
            by = add(by, kick[1])
        bz = mul(mu, uz)
        bn = bz
        disc = sub(sub(_ONE, sqr(bx)), sqr(by))
        root = sq(disc)
        if kind == 2:
            gam = sub(neg(bn), where(bn[0] >= 0, root, neg(root)))
        else:
            gam = sub(root, bn)
        return bx, by, add(bz, gam)
    gx, gy = nrm
    nn = add(add(sqr(gx), sqr(gy)), _ONE)
    inv_nn = dv(_ONE, nn)
    bx = mul(mu, ux)
    by = mul(mu, uy)
    bz = mul(mu, uz)
    if gdy is not None:
        qx = neg(mul(mul(gy, gx), inv_nn))
        qy = sub(_ONE, mul(sqr(gy), inv_nn))
        qz = neg(mul(gy, inv_nn))
        qinv = dv(_ONE, _max_tiny(sq(add(add(sqr(qx), sqr(qy)),
                                         sqr(qz)))))
        bx = add(bx, mul(gdy, mul(qx, qinv)))
        by = add(by, mul(gdy, mul(qy, qinv)))
        bz = add(bz, mul(gdy, mul(qz, qinv)))
    if kick is not None:
        bx = add(bx, kick[0])
        by = add(by, kick[1])
    bn = mul(add(add(mul(bx, gx), mul(by, gy)), bz), inv_nn)
    bb = add(add(sqr(bx), sqr(by)), sqr(bz))
    disc = sub(sqr(bn), mul(sub(bb, _ONE), inv_nn))
    root = sq(disc)
    if kind == 2:
        gam = sub(neg(bn), where(bn[0] >= 0, root, neg(root)))
    else:
        gam = sub(root, bn)
    return (add(bx, mul(gam, gx)), add(by, mul(gam, gy)),
            add(bz, gam))


def _apply_signed(R, vx, vy, vz):
    """Apply a signed permutation matrix (one +-1 per row) to a
    component triple -- exact in df32 (pure sign flips/swaps)."""
    comps = (vx, vy, vz)
    out = []
    for row in R:
        k = int(np.flatnonzero(row)[0])
        out.append(comps[k] if row[k] > 0 else neg(comps[k]))
    return tuple(out)


def _apply_rot_df(R, vx, vy, vz):
    """Full 3x3 rotation in df32: R is a 3x3 nest of (hi, lo) consts.
    9 df muls + 6 df adds -- only emitted for tilted surfaces."""
    out = []
    for r in range(3):
        acc = mul(R[r][0], vx)
        acc = add(acc, mul(R[r][1], vy))
        acc = add(acc, mul(R[r][2], vz))
        out.append(acc)
    return tuple(out)


def _surface_df(state, c, mu, dz, kind, flat, k1=None, asp=None,
                alternate=False, rotm=None, rot_df=None, dxy=None,
                radius=None, clip=False, fast=False, asp_odd=(),
                anam=None, grat=None, doe=None, doe_path=None):
    """One transfer-intercept-refract step in df32.  `c`, `mu`, `dz`,
    `k1` (= 1+conic) are df32 constants, `asp`/`asp_odd` tuples of
    df32 figure constants; kind: 0 passthrough, 1 refract, 2 mirror
    (see kernels.SurfaceSpec).  `anam` carries the constants of an
    anamorphic row (conic cylinder / biconic / toroid), `grat` a
    linear grating's baked diffraction term.  Mirrors the math of
    kernels.intercept/intercept_spec/refract_spec and the extended
    kernels of ops/kernels.py:101-311.

    fast=True swaps the two-round div/sqrt refinements for one-round
    variants (div1/sqrt1): ~1e-12 / ~1e-8 per-op relative accuracy
    instead of the full ~7e-15 -- measured spot parity stays orders of
    magnitude inside the 1e-9 target at a lower op count."""
    dv, sq = (div1, sqrt1) if fast else (div, sqrt)
    x, y, z, ux, uy, uz = state
    z = sub(z, dz)
    if dxy is not None:
        x = sub(x, dxy[0])
        y = sub(y, dxy[1])
    if rotm is not None:
        # exact axis-flip frame change (mirror folds): to_normal
        x, y, z = _apply_signed(rotm, x, y, z)
        ux, uy, uz = _apply_signed(rotm, ux, uy, uz)
    elif rot_df is not None:
        # general tilt: full df32 rotation into the normal frame
        x, y, z = _apply_rot_df(rot_df, x, y, z)
        ux, uy, uz = _apply_rot_df(rot_df, ux, uy, uz)
    conic = k1 is not None
    kk = k1 if conic else const(1.)
    if anam is not None:
        s = _intercept_anam_df(x, y, z, ux, uy, uz, anam, dv, sq)
    elif flat:
        s = neg(dv(z, uz))
    else:
        # closed-form conic intercept, unit |u|; the two algebraically
        # equal root forms -(d+g)/e and f/(g-d) are each stable in the
        # complementary sign regime of d (cancellation-free choice)
        if conic:
            kz = mul(k1, z)
            uy_ = _dot3(ux, uy, uz, x, y, kz)
            uu = add(add(sqr(ux), sqr(uy)), mul(k1, sqr(uz)))
            yy = _dot3(x, y, z, x, y, kz)
            e_q = mul(c, uu)
        else:
            uy_ = _dot3(ux, uy, uz, x, y, z)
            yy = _dot3(x, y, z, x, y, z)
            e_q = _broadcast(c, x[0])
        d = sub(mul(c, uy_), uz)
        f = sub(mul(c, yy), scale(z, 2.))
        disc = sub(sqr(d), mul(e_q, f))
        g = sq(disc)
        if alternate:
            s = dv(neg(sub(d, g)), e_q)
        else:
            stable = d[0] < 0
            num = where(stable, f, neg(add(d, g)))
            den = where(stable, sub(g, d), e_q)
            s = dv(num, den)
    if (asp or asp_odd) and anam is None:
        # Newton-polish against the full aspheric sag
        for _ in range(ASPHERIC_ITERS):
            px = add(x, mul(s, ux))
            py = add(y, mul(s, uy))
            pz = add(z, mul(s, uz))
            fn = _sag_df(px, py, pz, c, kk, asp, dv, sq, asp_odd)
            en = _normal_radial_df(px, py, c, kk, asp, dv, sq,
                                   asp_odd)
            fp = add(add(mul(ux, mul(px, en)),
                         mul(uy, mul(py, en))), uz)
            s = sub(s, dv(fn, fp))
        # non-converged rays are misses, like kernels.intercept
        res = _sag_df(add(x, mul(s, ux)), add(y, mul(s, uy)),
                      add(z, mul(s, uz)), c, kk, asp, dv, sq, asp_odd)
        ok = jnp.abs(res[0]) <= ASPHERIC_TOL*(1 + jnp.abs(s[0]))
        nanv = jnp.full_like(s[0], jnp.nan)
        s = where(ok, s, (nanv, nanv))
    x = add(x, mul(s, ux))
    y = add(y, mul(s, uy))
    z = add(z, mul(s, uz))
    if clip and radius is not None:
        # aperture clip: NaN the direction of rays outside the radius
        # (membership decided on the hi words -- f32 edge precision)
        bad = x[0]*x[0] + y[0]*y[0] > radius
        nanv = (jnp.full_like(x[0], jnp.nan),)*2
        ux = where(bad, nanv, ux)
        uy = where(bad, nanv, uy)
        uz = where(bad, nanv, uz)
    if doe_path is not None:
        # imprinted diffractive phase = optical path: fold
        # psi(r^2) * n_after/n_before into the returned length so the
        # caller's s*nb accumulation sees m lambda phi/(2 pi)
        r2p = add(sqr(x), sqr(y))
        acc = doe_path[-1]
        for cdf in doe_path[-2::-1]:
            acc = add(mul(acc, r2p), cdf)
        s = add(s, mul(acc, r2p))
    plane = flat and not asp and not asp_odd and anam is None
    # clean conic rows (incl. pure conic cylinders) take the
    # polynomial implicit-gradient normal N = (-c x, -c y,
    # 1 - c(1+k) z): no df sqrt/div for the normal, and for spheres /
    # circular cylinders the on-surface identity makes |N| == 1
    # EXACTLY (the on-surface residual of the closed-form intercept,
    # ~1e-14, is far below the 1e-9 parity target), so the
    # normalization divide drops out too -- mirrors
    # kernels.refract_spec / refract_cyl.
    cyl_mode = (anam["mode"] if anam is not None
                and anam["mode"] in ("cyl_y", "cyl_x") else None)
    poly_n = (kind != 0 and grat is None and doe is None
              and not asp and not asp_odd
              and ((not flat and anam is None)
                   or cyl_mode is not None))
    nx = ny = None
    nzv = None
    if ((kind != 0 or grat is not None or doe is not None)
            and not plane and not poly_n):
        if anam is not None:
            nx, ny = _normal_anam_df(x, y, anam, dv, sq)
        else:
            # surface normal (nx, ny, 1)*e
            e = _normal_radial_df(x, y, c, kk, asp, dv, sq, asp_odd)
            nx, ny = mul(x, e), mul(y, e)
    if grat is not None or doe is not None:
        kick = None
        if doe is not None:
            # radial diffractive kick: e = sum 2(i+1) doe_i r^(2i)
            # (coefficients pre-scaled on the host), s = e (x, y)
            r2k = add(sqr(x), sqr(y))
            ek = doe[-1]
            for cdf in doe[-2::-1]:
                ek = add(mul(ek, r2k), cdf)
            kick = (mul(ek, x), mul(ek, y))
        vx, vy, vz = _refract_grating_df(
            ux, uy, uz, mu, kind, grat,
            None if plane else (nx, ny), dv, sq, kick=kick)
    elif kind == 0:
        vx, vy, vz = ux, uy, uz
    else:
        if poly_n:
            def _cf(t):
                return float(t[0]) + float(t[1])
            if cyl_mode is not None:
                c1, k1cyl = anam["c1"], anam["k1"]
                w, uw = (y, uy) if cyl_mode == "cyl_y" else (x, ux)
                nw = neg(mul(c1, w))
                # (1+k)c baked exactly on the host
                k1c = const(_cf(k1cyl)*_cf(c1))
                nzv = sub(_ONE, mul(k1c, z))
                dot = add(mul(uw, nw), mul(uz, nzv))
                if _cf(k1cyl) == 1.:
                    nn = _ONE    # exact on a circular cylinder
                else:
                    nn = add(sqr(nw), sqr(nzv))
                if cyl_mode == "cyl_y":
                    ny = nw      # nx stays None (exactly zero)
                else:
                    nx = nw      # ny stays None
            else:
                nx, ny = neg(mul(c, x)), neg(mul(c, y))
                if conic:
                    # (1+k)c baked exactly on the host (f64 holds the
                    # 48-bit double-single product)
                    k1c = const(_cf(kk)*_cf(c))
                    nzv = sub(_ONE, mul(k1c, z))
                else:
                    nzv = sub(_ONE, mul(c, z))
                dot = add(add(mul(ux, nx), mul(uy, ny)),
                          mul(uz, nzv))
                if conic:
                    nn = add(add(sqr(nx), sqr(ny)), sqr(nzv))
                else:
                    nn = _ONE    # exact on-sphere
        elif not plane:
            nn = add(add(sqr(nx), sqr(ny)), _ONE)
            dot = add(add(mul(ux, nx), mul(uy, ny)), uz)
        else:
            nn = _ONE
            dot = uz
        if kind == 2:
            a2 = (scale(dot, 2.) if nn is _ONE
                  else scale(dv(dot, nn), 2.))
            if plane:
                vx, vy, vz = ux, uy, sub(uz, a2)
            else:
                vx = sub(ux, mul(a2, nx)) if nx is not None else ux
                vy = sub(uy, mul(a2, ny)) if ny is not None else uy
                vz = (sub(uz, mul(a2, nzv)) if nzv is not None
                      else sub(uz, a2))
        else:
            # refraction: mu > 0 here (mirror handled above)
            b0 = sub(sqr(mu), _ONE)
            if nn is _ONE:
                a = mul(mu, dot)
                b = b0
            else:
                inv_nn = dv(_ONE, nn)
                a = mul(mul(mu, dot), inv_nn)
                b = mul(b0, inv_nn)
            gdisc = sub(sqr(a), b)
            g = sub(sq(gdisc), a)
            if plane:
                vx, vy = mul(mu, ux), mul(mu, uy)
                vz = add(mul(mu, uz), g)
            else:
                vx = (add(mul(mu, ux), mul(g, nx))
                      if nx is not None else mul(mu, ux))
                vy = (add(mul(mu, uy), mul(g, ny))
                      if ny is not None else mul(mu, uy))
                vz = (add(mul(mu, uz), mul(g, nzv))
                      if nzv is not None else add(mul(mu, uz), g))
    if rotm is not None:
        # back to the running (global) frame: from_normal = R^T
        rt = rotm.T
        x, y, z = _apply_signed(rt, x, y, z)
        vx, vy, vz = _apply_signed(rt, vx, vy, vz)
    elif rot_df is not None:
        rt = tuple(tuple(rot_df[r][col] for r in range(3))
                   for col in range(3))
        x, y, z = _apply_rot_df(rt, x, y, z)
        vx, vy, vz = _apply_rot_df(rt, vx, vy, vz)
    return (x, y, z, vx, vy, vz), s


_ONE = (np.float32(1.), np.float32(0.))


def _trim(coeffs):
    nz = int(np.max(np.nonzero(coeffs)[0]) + 1) if coeffs.any() else 0
    return coeffs[:nz]


def plan(table, clip=False, fast=False):
    """Host-side: per-surface df32 constants + static flags from a
    float64 SurfaceTable.  Covers the full surface vocabulary:
    flat/spherical/conic/even+odd-aspheric, mirrors, alternate
    intersections, decenters, rotations (exact signed-permutation
    folds take the cheap sign-flip path, general tilts a full df32
    3x3 rotation), anamorphics (conic cylinders closed-form, general
    biconics/toroids by mixed-precision Newton), linear gratings, and
    radial diffractive (kinoform / Binary 2) rows; `clip` adds the
    aperture NaN-clip per surface.

    fast=True bakes one-round div/sqrt refinements into every step
    (div1/sqrt1): lower op count at ~1e-12/~1e-8 per-op accuracy --
    measured end-to-end spot parity stays well inside the 1e-9
    target (bench.py reports both modes)."""
    from .tables import lower_pose
    table = lower_pose(table)  # fold concrete tilt/decenter deltas
    curv = np.asarray(table.curvature, np.float64)
    conic = np.asarray(table.conic, np.float64)
    mu = np.asarray(table.mu, np.float64)
    off = np.asarray(table.offset, np.float64)
    rot = np.asarray(table.rot, np.float64)
    asp = np.asarray(table.aspherics, np.float64)
    s_count = curv.shape[0]
    asp_odd = np.asarray(getattr(table, "aspherics_odd", None)
                         if getattr(table, "aspherics_odd", None)
                         is not None else np.zeros((s_count, 0)),
                         np.float64)

    def _opt(name):
        v = getattr(table, name, None)
        return (np.zeros(s_count) if v is None
                else np.asarray(v, np.float64))

    cdx = _opt("curvature_dx")
    kdx = _opt("conic_dx")
    tor = _opt("toroidal")
    gdy = _opt("grating_dy")
    doe_tab = getattr(table, "doe", None)
    doe_tab = (np.zeros((s_count, 0)) if doe_tab is None
               else np.asarray(doe_tab, np.float64))
    xy_tab = getattr(table, "xy_poly", None)
    xy_tab = (np.zeros((s_count, 0)) if xy_tab is None
              else np.asarray(xy_tab, np.float64))
    alt = np.asarray(table.alternate, np.float64)
    rad = np.asarray(table.radius, np.float64)
    df_iters = ANAM_DF_ITERS + (0 if fast else 1)
    steps = []
    for j in range(1, s_count):
        rotm = rot_df = None
        if not np.allclose(rot[j], np.eye(3)):
            ri = np.rint(rot[j]).astype(int)
            exact_flip = (np.abs(rot[j] - ri).max() < 1e-12
                          and (np.abs(ri).sum(0) == 1).all()
                          and (np.abs(ri).sum(1) == 1).all())
            if exact_flip:
                rotm = ri
            else:
                rot_df = tuple(tuple(const(rot[j][r, cc])
                                     for cc in range(3))
                               for r in range(3))
        dxy = None
        if off[j, 0] or off[j, 1]:
            dxy = (const(off[j, 0]), const(off[j, 1]))
        kind = 0 if mu[j] == 1. else (2 if mu[j] == -1. else 1)
        coeffs = _trim(asp[j] if asp.shape[1] else np.zeros(0))
        codd = _trim(asp_odd[j] if asp_odd.shape[1] else np.zeros(0))
        figured = coeffs.size or codd.size
        anam = None
        xy_row = xy_tab[j] if xy_tab.shape[1] else np.zeros(0)
        if np.any(xy_row != 0):
            if tor[j] != 0 or cdx[j] != 0 or kdx[j] != 0:
                raise NotImplementedError(
                    "row %d combines an anamorphic base with a "
                    "freeform XY figure; express the full figure in "
                    "xy_poly" % j)
            from .kernels import _xy_terms, xy_degree
            deg = xy_degree(xy_row.size)
            terms = _xy_terms(deg)
            val, gx_t, gy_t = [], [], []
            for a, (ti, tj) in zip(xy_row, terms):
                if a == 0.:
                    continue
                val.append((const(a), ti, tj))
                if ti:
                    gx_t.append((const(ti*a), ti - 1, tj))
                if tj:
                    gy_t.append((const(tj*a), ti, tj - 1))
            anam = dict(
                mode="freeform", df_iters=df_iters, deg=deg,
                c=const(curv[j]), k1=const(1. + conic[j]),
                asp=tuple(const(a) for a in coeffs),
                asp_odd=tuple(const(a) for a in codd),
                xy=tuple(val), xy_gx=tuple(gx_t),
                xy_gy=tuple(gy_t),
                f32=dict(cy=np.float32(curv[j]),
                         ky=np.float32(conic[j]),
                         alt=np.float32(alt[j]),
                         asp=np.asarray(coeffs, np.float32),
                         asp_odd=np.asarray(codd, np.float32),
                         xy=np.asarray(xy_row, np.float32)))
        elif tor[j] != 0 or cdx[j] != 0 or kdx[j] != 0:
            cy, ky = curv[j], conic[j]
            if tor[j] != 0:
                cx, kx = 0., 0.          # placeholders (toroid uses cr)
                cr = cy + cdx[j]
                cylinder = cr == 0.       # degenerate: pure y-curve
                mode = "toroid"
            else:
                cx, kx = cy + cdx[j], ky + kdx[j]
                cr = 0.
                cylinder = cx == 0. or cy == 0.
                mode = "biconic"
            if cylinder and not figured:
                caxis, kaxis = ((cy, ky) if (tor[j] != 0 or cx == 0.)
                                else (cx, kx))
                if caxis == 0.:
                    anam = None          # both axes flat: plain plane
                else:
                    anam = dict(
                        mode=("cyl_y" if tor[j] != 0 or cx == 0.
                              else "cyl_x"),
                        c1=const(caxis), k1=const(1. + kaxis),
                        bc=const((1. + kaxis)*caxis*caxis),
                        alternate=bool(alt[j]))
            else:
                anam = dict(
                    mode=mode, df_iters=df_iters,
                    cx=const(cx), cy=const(cy), cr=const(cr),
                    bxc=const((1. + kx)*cx*cx),
                    byc=const((1. + ky)*cy*cy),
                    asp=tuple(const(a) for a in coeffs),
                    asp_odd=tuple(const(a) for a in codd),
                    f32=dict(cx=np.float32(cx), kx=np.float32(kx),
                             cy=np.float32(cy), ky=np.float32(ky),
                             cr=np.float32(cr),
                             alt=np.float32(alt[j]),
                             asp=np.asarray(coeffs, np.float32),
                             asp_odd=np.asarray(codd, np.float32)))
        steps.append(dict(
            c=const(curv[j]), mu=const(abs(mu[j])),
            dz=const(off[j, 2]), kind=kind,
            flat=curv[j] == 0. and anam is None,
            k1=const(1. + conic[j]) if conic[j] else None,
            asp=tuple(const(a) for a in coeffs),
            asp_odd=tuple(const(a) for a in codd),
            alternate=bool(alt[j]), rotm=rotm, rot_df=rot_df,
            dxy=dxy, anam=anam,
            grat=const(gdy[j]) if gdy[j] != 0 else None,
            doe=(tuple(const(2.*(i + 1)*a) for i, a
                       in enumerate(_trim(doe_tab[j])))
                 if doe_tab.shape[1] and doe_tab[j].any() else None),
            doe_path=(tuple(const(
                a*float(np.asarray(table.n_after, np.float64)[j])
                / float(np.asarray(table.n_before, np.float64)[j]))
                for a in _trim(doe_tab[j]))
                if doe_tab.shape[1] and doe_tab[j].any() else None),
            radius=(np.float32(rad[j])**2 if clip
                    and np.isfinite(rad[j]) else None),
            clip=clip, fast=fast,
            nb=const(np.asarray(table.n_before, np.float64)[j])))
    return steps


def _run_step(state, st):
    return _surface_df(state, st["c"], st["mu"], st["dz"], st["kind"],
                       st["flat"], st.get("k1"), st.get("asp"),
                       st.get("alternate", False), st.get("rotm"),
                       st.get("rot_df"), st.get("dxy"),
                       st.get("radius"), st.get("clip", False),
                       st.get("fast", False),
                       st.get("asp_odd", ()), st.get("anam"),
                       st.get("grat"), st.get("doe"),
                       st.get("doe_path"))


def _to_last_frame(steps, state):
    """Rotate the running-frame state into the last surface's normal
    frame (what trace_components_final returns)."""
    last = steps[-1]
    if last.get("rotm") is not None:
        return (*_apply_signed(last["rotm"], *state[:3]),
                *_apply_signed(last["rotm"], *state[3:]))
    if last.get("rot_df") is not None:
        return (*_apply_rot_df(last["rot_df"], *state[:3]),
                *_apply_rot_df(last["rot_df"], *state[3:]))
    return state


def trace_df32_final(steps, state, with_path=False):
    """Unrolled df32 trace over the planned surface chain.

    state: six (hi, lo) component pairs.  Returns the final state in
    the last surface's normal frame (like trace_components_final);
    with_path additionally returns the accumulated optical path as an
    (hi, lo) pair.  Trace inside jit; `steps` constants close over
    the function."""
    tacc = zero_like(state[0])
    for st in steps:
        state, s = _run_step(state, st)
        if with_path:
            tacc = add(tacc, mul(s, st["nb"]))
    state = _to_last_frame(steps, state)
    if with_path:
        return state, tacc
    return state


def trace_df32_final_multi(plans, state, with_path=False):
    """Polychromatic df32 trace: the same input rays through several
    planned surface chains (one `plan` per wavelength -- the geometry
    is shared, the baked refraction constants differ).  Returns one
    final state per plan.  Eager reference implementation; the device
    kernel is pallas_trace_df32_multi."""
    return tuple(trace_df32_final(p, state, with_path=with_path)
                 for p in plans)


def state_from_f64(y, u):
    """(N, 3) float64 position/direction -> df32 component state."""
    comps = []
    for arr in (y, u):
        arr = np.asarray(arr, np.float64)
        for k in range(3):
            comps.append(from_f64(arr[:, k]))
    return tuple(comps)


def pallas_trace_df32(steps, state, tile=8*1024, interpret=False,
                      with_path=False):
    """The df32 trace as one Pallas TPU kernel.

    This is the load-bearing path, not an optimization: XLA (CPU and
    TPU alike) contracts a product feeding an error-free add/sub into
    a fused multiply-add of the *exact* product, silently breaking the
    double-word renormalization (observed: the lo words degrade to
    ~f32 level).  Mosaic emits the VPU ops exactly as written, so the
    kernel keeps full df32 precision -- and stages each ray tile
    through VMEM once for the whole unrolled surface chain.

    state: 6-tuple of (hi, lo) pairs of (N,) f32 arrays.
    Returns the final state in the same layout; with_path appends the
    accumulated optical path (hi, lo) pair.
    """
    import functools
    from jax.experimental import pallas as pl

    n = state[0][0].shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    nout = 14 if with_path else 12

    def kernel(*refs):
        ins, outs = refs[:12], refs[12:]
        st = tuple((ins[2*i][:], ins[2*i + 1][:]) for i in range(6))
        tacc = zero_like(st[0])
        for stp in steps:
            st, s = _run_step(st, stp)
            if with_path:
                tacc = add(tacc, mul(s, stp["nb"]))
        # express the final state in the image surface's frame
        st = _to_last_frame(steps, st)
        if with_path:
            st = st + (tacc,)
        for i in range(nout // 2):
            outs[2*i][:] = st[i][0]
            outs[2*i + 1][:] = st[i][1]

    flat = [jnp.asarray(w).reshape(n // 128, 128)
            for comp in state for w in comp]
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((n // 128, 128), jnp.float32)
                 for _ in range(nout)]
    # Mosaic rejects i64 index maps when jax_enable_x64 is on
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, grid=(n // tile,),
            in_specs=[spec]*12, out_specs=[spec]*nout,
            out_shape=out_shape, interpret=interpret,
        )(*flat)
    outs = [o.reshape(n) for o in outs]
    return tuple((outs[2*i], outs[2*i + 1]) for i in range(nout // 2))


def pallas_trace_df32_multi(plans, state, tile=8*1024,
                            interpret=False, with_path=False):
    """Polychromatic df32 Pallas kernel: trace one ray tile through
    every wavelength plan while it is VMEM-resident (the input is read
    from HBM once for all wavelengths).  Returns a tuple of final
    states, one per plan, each shaped like pallas_trace_df32's."""
    from jax.experimental import pallas as pl

    n = state[0][0].shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    per = 14 if with_path else 12
    nout = per*len(plans)

    def kernel(*refs):
        ins, outs = refs[:12], refs[12:]
        st0 = tuple((ins[2*i][:], ins[2*i + 1][:]) for i in range(6))
        for li, steps in enumerate(plans):
            st = st0
            tacc = zero_like(st[0])
            for stp in steps:
                st, s = _run_step(st, stp)
                if with_path:
                    tacc = add(tacc, mul(s, stp["nb"]))
            st = _to_last_frame(steps, st)
            if with_path:
                st = st + (tacc,)
            for i in range(per // 2):
                outs[li*per + 2*i][:] = st[i][0]
                outs[li*per + 2*i + 1][:] = st[i][1]

    flat = [jnp.asarray(w).reshape(n // 128, 128)
            for comp in state for w in comp]
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((n // 128, 128), jnp.float32)
                 for _ in range(nout)]
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, grid=(n // tile,),
            in_specs=[spec]*12, out_specs=[spec]*nout,
            out_shape=out_shape, interpret=interpret,
        )(*flat)
    outs = [o.reshape(n) for o in outs]
    return tuple(
        tuple((outs[li*per + 2*i], outs[li*per + 2*i + 1])
              for i in range(per // 2))
        for li in range(len(plans)))

def _df_sum_rows(hi, lo):
    """Error-free pairwise tree sum of a (rows, 128) df32 value along
    the sublane axis -> a (1, 128) per-lane df32 accumulator.  rows
    must be a power of two (tile/128 always is).  Static halving keeps
    every intermediate 2-D for Mosaic."""
    r = hi.shape[0]
    assert r & (r - 1) == 0, r
    while r > 1:
        half = r // 2
        hi, lo = add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
        r = half
    return hi, lo


def _df32_moment_block(st):
    """Reduce a traced df32 tile to per-lane spot moments packed into
    a (16, 128) block: rows 2i/2i+1 are the (hi, lo) words of
    [count, sum x, sum y, sum x^2, sum y^2], the rest zero.  The
    cross-row accumulation is full df32 (pairwise two_sum trees), so
    the only rounding left for the host is an exact f64 promotion."""
    x, y, uz = st[0], st[1], st[5]
    good = (jnp.isfinite(x[0]) & jnp.isfinite(y[0])
            & jnp.isfinite(uz[0]))

    def masked(a):
        return (jnp.where(good, a[0], 0.), jnp.where(good, a[1], 0.))

    xm, ym = masked(x), masked(y)
    cnt = (good.astype(jnp.float32), jnp.zeros_like(x[0]))
    moments = (cnt, xm, ym, mul(xm, xm), mul(ym, ym))
    parts = []
    for m in moments:
        parts.extend(_df_sum_rows(*m))
    parts.append(jnp.zeros((6, 128), jnp.float32))
    return jnp.concatenate(parts, axis=0)


def _merit_from_blocks(out, nblk):
    """(nblk*16, 128) moment blocks -> five exact f64 totals."""
    blk = out.reshape(nblk, 16, 128)
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return tuple(
        (blk[:, 2*i].astype(f64) + blk[:, 2*i + 1].astype(f64)).sum()
        for i in range(5))


def _df_sum_flat(hi, lo):
    """Pairwise df32 tree sum of (N,) words -> scalar pair.  Pads to
    a power of two with exact zeros.  Eager-path helper."""
    n = hi.shape[0]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = p - n
        hi = jnp.concatenate([hi, jnp.zeros(pad, hi.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros(pad, lo.dtype)])
    while p > 1:
        half = p // 2
        hi, lo = add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
        p = half
    return hi[0], lo[0]


def trace_df32_merit(steps, state):
    """Eager reference of pallas_trace_df32_merit: trace, mask dead
    rays, and reduce to (count, sum x, sum y, sum x^2, sum y^2) with
    full df32 pairwise accumulation, promoted exactly to f64.

    Runs op-by-op (never under a fused XLA jit -- see the module
    caution), so it keeps parity grade on the CPU backend where the
    interpret-mode kernel loses the error-free transforms to FMA
    contraction."""
    st = trace_df32_final(steps, state)
    x, y, uz = st[0], st[1], st[5]
    good = (jnp.isfinite(x[0]) & jnp.isfinite(y[0])
            & jnp.isfinite(uz[0]))

    def masked(a):
        return (jnp.where(good, a[0], 0.), jnp.where(good, a[1], 0.))

    xm, ym = masked(x), masked(y)
    cnt = (good.astype(jnp.float32), jnp.zeros_like(x[0]))
    out = []
    for m in (cnt, xm, ym, mul(xm, xm), mul(ym, ym)):
        hi, lo = _df_sum_flat(*m)
        out.append(jnp.float64(hi) + jnp.float64(lo))
    return tuple(out)


def pallas_trace_df32_merit(steps, state, tile=8*1024,
                            interpret=False):
    """Fused parity-grade trace + in-kernel spot-moment reduction.

    The df32 twin of ops.pallas_trace.pallas_trace_merit: each ray
    tile is traced VMEM-resident and collapsed to five df32 moment
    accumulators before leaving the kernel, so HBM sees only the 12
    input words -- no per-ray writeback (vs 12 (N,) outputs for
    pallas_trace_df32).  The common lens-optimization merit therefore
    runs at parity grade without paying the full-state HBM writeback.

    Returns (count, sum_x, sum_y, sum_xx, sum_yy) as f64 scalars
    (exact promotions of the df32 accumulators); feed
    ops.pallas_trace.spot_rms_from_moments.  Forward (monitoring/
    merit) use only -- not differentiable."""
    from jax.experimental import pallas as pl

    n = state[0][0].shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128

    def kernel(*refs):
        ins, out = refs[:12], refs[12]
        st = tuple((ins[2*i][:], ins[2*i + 1][:]) for i in range(6))
        for stp in steps:
            st, _ = _run_step(st, stp)
        st = _to_last_frame(steps, st)
        out[:, :] = _df32_moment_block(st)

    flat = [jnp.asarray(w).reshape(n // 128, 128)
            for comp in state for w in comp]
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_spec = pl.BlockSpec((16, 128), lambda i: (i, 0))
    nblk = n // tile
    out_shape = jax.ShapeDtypeStruct((nblk*16, 128), jnp.float32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel, grid=(nblk,),
            in_specs=[spec]*12, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(*flat)
    return _merit_from_blocks(out, nblk)


def pallas_trace_df32_merit_multi(plans, state, tile=8*1024,
                                  interpret=False):
    """Polychromatic df32 merit kernel: one ray tile traced through
    every wavelength plan while VMEM-resident, each reduced to its
    five spot moments in-kernel.  Returns a tuple of f64 moment
    5-tuples, one per plan."""
    from jax.experimental import pallas as pl

    n = state[0][0].shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    nlam = len(plans)

    def kernel(*refs):
        ins, outs = refs[:12], refs[12:]
        st0 = tuple((ins[2*i][:], ins[2*i + 1][:]) for i in range(6))
        for li, steps in enumerate(plans):
            st = st0
            for stp in steps:
                st, _ = _run_step(st, stp)
            st = _to_last_frame(steps, st)
            outs[li][:, :] = _df32_moment_block(st)

    flat = [jnp.asarray(w).reshape(n // 128, 128)
            for comp in state for w in comp]
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_spec = pl.BlockSpec((16, 128), lambda i: (i, 0))
    nblk = n // tile
    out_shape = [jax.ShapeDtypeStruct((nblk*16, 128), jnp.float32)
                 for _ in range(nlam)]
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel, grid=(nblk,),
            in_specs=[spec]*12, out_specs=[out_spec]*nlam,
            out_shape=out_shape, interpret=interpret,
        )(*flat)
    return tuple(_merit_from_blocks(o, nblk) for o in outs)
