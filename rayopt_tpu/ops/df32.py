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

F32 = jnp.float32
_SPLITTER = 4097.  # 2^12 + 1 (f32 has a 24-bit significand)


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


def _sag_df(x, y, z, c, k1, asp, dv=None, sq=None):
    """z - surface_sag(x, y) (kernels.sag in df32)."""
    dv, sq = dv or div, sq or sqrt
    r2 = add(sqr(x), sqr(y))
    cr2 = mul(c, r2)
    den = add(_ONE, sq(sub(_ONE, mul(k1, mul(c, cr2)))))
    e = sub(z, dv(cr2, den))
    if asp:
        e = sub(e, _poly_even_df(r2, asp))
    return e


def _normal_radial_df(x, y, c, k1, asp, dv=None, sq=None):
    """Radial factor of the normal (kernels.normal_radial in df32)."""
    dv, sq = dv or div, sq or sqrt
    r2 = add(sqr(x), sqr(y))
    e = neg(dv(c, sq(sub(_ONE, mul(k1, mul(sqr(c), r2))))))
    if asp:
        e = sub(e, _dpoly_even_df(r2, asp))
    return e


ASPHERIC_ITERS = 8
ASPHERIC_TOL = 1e-9  # matches kernels.ASPHERIC_TOL


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
                radius=None, clip=False, fast=False):
    """One transfer-intercept-refract step in df32 for an axial
    surface (flat / spherical / conic / even-aspheric).  `c`, `mu`,
    `dz`, `k1` (= 1+conic) are df32 constants, `asp` a tuple of df32
    aspheric constants; kind: 0 passthrough, 1 refract, 2 mirror (see
    kernels.SurfaceSpec).  Mirrors the math of
    kernels.intercept/intercept_spec/refract_spec.

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
    if flat:
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
    if asp:
        # Newton-polish against the full aspheric sag
        for _ in range(ASPHERIC_ITERS):
            px = add(x, mul(s, ux))
            py = add(y, mul(s, uy))
            pz = add(z, mul(s, uz))
            fn = _sag_df(px, py, pz, c, kk, asp, dv, sq)
            en = _normal_radial_df(px, py, c, kk, asp, dv, sq)
            fp = add(add(mul(ux, mul(px, en)),
                         mul(uy, mul(py, en))), uz)
            s = sub(s, dv(fn, fp))
        # non-converged rays are misses, like kernels.intercept
        res = _sag_df(add(x, mul(s, ux)), add(y, mul(s, uy)),
                      add(z, mul(s, uz)), c, kk, asp, dv, sq)
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
    plane = flat and not asp
    if kind == 0:
        vx, vy, vz = ux, uy, uz
    else:
        if not plane:
            # surface normal (nx, ny, 1)*e
            e = _normal_radial_df(x, y, c, kk, asp, dv, sq)
            nx, ny = mul(x, e), mul(y, e)
            nn = add(add(sqr(nx), sqr(ny)), _ONE)
            dot = add(add(mul(ux, nx), mul(uy, ny)), uz)
        else:
            nn = _ONE
            dot = uz
        if kind == 2:
            a2 = scale(dv(dot, nn), 2.)
            if plane:
                vx, vy, vz = ux, uy, sub(uz, a2)
            else:
                vx = sub(ux, mul(a2, nx))
                vy = sub(uy, mul(a2, ny))
                vz = sub(uz, a2)
        else:
            # refraction: mu > 0 here (mirror handled above)
            inv_nn = dv(_ONE, nn)
            a = mul(mul(mu, dot), inv_nn)
            b = mul(sub(sqr(mu), _ONE), inv_nn)
            gdisc = sub(sqr(a), b)
            g = sub(sq(gdisc), a)
            if plane:
                vx, vy = mul(mu, ux), mul(mu, uy)
                vz = add(mul(mu, uz), g)
            else:
                vx = add(mul(mu, ux), mul(g, nx))
                vy = add(mul(mu, uy), mul(g, ny))
                vz = add(mul(mu, uz), g)
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


def plan(table, clip=False, fast=False):
    """Host-side: per-surface df32 constants + static flags from a
    float64 SurfaceTable.  Covers the full surface vocabulary:
    flat/spherical/conic/even-aspheric, mirrors, alternate
    intersections, decenters, and rotations (exact signed-permutation
    folds take the cheap sign-flip path, general tilts a full df32
    3x3 rotation); `clip` adds the aperture NaN-clip per surface.

    fast=True bakes one-round div/sqrt refinements into every step
    (div1/sqrt1): lower op count at ~1e-12/~1e-8 per-op accuracy --
    measured end-to-end spot parity stays well inside the 1e-9
    target (bench.py reports both modes)."""
    curv = np.asarray(table.curvature, np.float64)
    conic = np.asarray(table.conic, np.float64)
    mu = np.asarray(table.mu, np.float64)
    off = np.asarray(table.offset, np.float64)
    rot = np.asarray(table.rot, np.float64)
    asp = np.asarray(table.aspherics, np.float64)
    asp_odd = np.asarray(getattr(table, "aspherics_odd",
                                 np.zeros((curv.shape[0], 0))),
                         np.float64)
    if asp_odd.size and np.any(asp_odd != 0):
        raise NotImplementedError(
            "odd aspherics are not supported by the df32 kernel; "
            "use the f64 engines (trace_rays_final)")
    from .tables import is_anamorphic
    if is_anamorphic(table):
        raise NotImplementedError(
            "anamorphic (biconic/cylindrical) surfaces are not "
            "supported by the df32 kernel; use the f64 engines "
            "(trace_rays_final with biconic=True)")
    alt = np.asarray(table.alternate, np.float64)
    rad = np.asarray(table.radius, np.float64)
    steps = []
    for j in range(1, curv.shape[0]):
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
        coeffs = asp[j] if asp.shape[1] else np.zeros(0)
        nz = int(np.max(np.nonzero(coeffs)[0]) + 1) if coeffs.any() \
            else 0
        steps.append(dict(
            c=const(curv[j]), mu=const(abs(mu[j])),
            dz=const(off[j, 2]), kind=kind, flat=curv[j] == 0.,
            k1=const(1. + conic[j]) if conic[j] else None,
            asp=tuple(const(a) for a in coeffs[:nz]),
            alternate=bool(alt[j]), rotm=rotm, rot_df=rot_df,
            dxy=dxy,
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
                       st.get("fast", False))


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
