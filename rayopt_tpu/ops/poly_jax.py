"""Jittable, differentiable aberration-polynomial trace.

The same Andersen recursion as trace/poly.py (reference
elements.py:383-408, poly_trace.py:33-216), but the simplex
coefficient vectors are jnp arrays and every per-surface update is
built from the JAX simplex kernels (ops.simplex.mul_jax/pow_jax), so
the whole propagation jits and `jax.grad` flows from Seidel /
higher-order aberration coefficients back to curvatures and
distances.  Static geometry decisions (flat vs curved, aspheric
presence) come from kernels.SurfaceSpec so the program stays
trace-compatible while the values are differentiated.
"""

import functools

import jax
import jax.numpy as jnp

from . import simplex as sx


class Box:
    """A truncated multinomial with jnp coefficients and the operator
    set the Andersen recursion uses (immutable; shift returns new)."""

    __slots__ = ("v", "alg")

    def __init__(self, alg, v=None):
        self.alg = alg
        # fresh zeros per use: caching a jnp constant on the Algebra
        # would capture a tracer when first built inside a jit
        self.v = jnp.zeros(alg.q) if v is None else v

    def _new(self, v):
        return Box(self.alg, v)

    def copy(self):
        return self._new(self.v)

    def shift(self, a):
        return self._new(self.v.at[0].add(a))

    def __neg__(self):
        return self._new(-self.v)

    def __add__(self, other):
        if isinstance(other, Box):
            return self._new(self.v + other.v)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, Box):
            return self._new(self.v - other.v)
        return NotImplemented

    def __mul__(self, other):
        if isinstance(other, Box):
            return self._new(sx.mul_jax(self.alg.mtab, self.v,
                                        other.v))
        return self._new(self.v*other)

    def __rmul__(self, other):
        return self._new(self.v*other)

    def __truediv__(self, other):
        return self._new(self.v/other)

    def __pow__(self, p):
        return self._new(sx.pow_jax(self.alg.mtab, self.alg.n,
                                    self.v, p))


class Algebra:
    def __init__(self, d, n):
        self.d, self.n = d, n
        self.idx, self.jdx = sx.simplex_enum(d, n)
        self.mtab = sx.mul_table(d, n)
        self.q = self.jdx.shape[0]

    def box(self, v=None):
        return Box(self, v)


@functools.lru_cache(maxsize=None)
def algebra(d, n):
    return Algebra(d, n)


def _intercept_poly(alg, spec, curvature, sgn, aspherics, r, p, k):
    """Conic + aspheric intercept in simplex algebra
    (reference elements.py:589-620; static branch on spec.flat)."""
    S = alg.box
    if spec.flat and not spec.aspheric:
        return r, S(), S(), S().shift(1.)
    if spec.flat:
        f = S()
        fr = S()
        g = S().shift(1.)
    else:
        u = curvature*sgn
        p1 = p.copy().shift(1.)
        a = (-u*k).shift(1.)
        a = a - (a*a - p1*r*u**2)**.5
        a = a*p1**-1.
        f = a/u
        r = a*(-a).shift(2.)
        g = (-a).shift(1.)
        fr = .5*u*g**-1.
    if spec.aspheric:
        asp = [aspherics[i]*sgn for i in range(aspherics.shape[0])]
        r0 = r
        for _ in range(len(asp)):
            df = S()
            for uj in reversed(asp):
                df = (df.shift(uj))*r
            r = r0 + df*(2*k + df*p)
        dfr = S()
        for i in reversed(range(len(asp))):
            dfr = (dfr*r).shift((i + 1)*asp[i])
        f = f + df
        fr = fr + dfr
        g = (4*r*dfr*dfr).shift(1.)**-.5
    return r, f, fr, g


def poly_trace_table(table, specs, kmax, pupil_distance,
                     telecentric=False):
    """Propagate the Andersen polynomial state through the table.

    Returns (stvwof, n): stvwof is (S, 6, q) stacked (s, t, v, w, o, f)
    coefficient vectors per surface, n the index after each surface —
    the jnp mirror of PolyTrace.stvwof (reference poly_trace.py:85-95).
    """
    # odd aspherics (|r| powers) are not representable in the
    # polynomial basis; the check keys on the static width so it is
    # trace/vmap-safe (zero-width = none present)
    if table.aspherics_odd.shape[-1]:
        raise NotImplementedError(
            "odd aspherics cannot be represented in the "
            "aberration-polynomial basis")
    import numpy as _host_np
    dx = getattr(table, "curvature_dx", None)
    if dx is not None and not isinstance(
            dx, jax.core.Tracer) and (
            _host_np.any(_host_np.asarray(dx) != 0)
            or _host_np.any(_host_np.asarray(table.conic_dx) != 0)
            or _host_np.any(_host_np.asarray(
                getattr(table, "toroidal", 0.)) != 0)
            or _host_np.any(_host_np.asarray(
                getattr(table, "grating_dy", 0.)) != 0)):
        raise NotImplementedError(
            "anamorphic (biconic) surfaces break the rotational "
            "symmetry of the aberration-polynomial basis")
    doe = getattr(table, "doe", None)
    if (doe is not None and not isinstance(doe, jax.core.Tracer)
            and _host_np.asarray(doe).size
            and _host_np.any(_host_np.asarray(doe) != 0)):
        raise NotImplementedError(
            "diffractive (binary2) kicks are not implemented in the "
            "aberration-polynomial basis; use transverse_expansion")
    alg = algebra(3, kmax)
    S = alg.box
    nsurf = table.curvature.shape[0]
    pos = 0. if telecentric else pupil_distance
    f = S().shift(pos)
    r, p, k = S(), S(), S()
    r = Box(alg, r.v.at[1].set(1.))
    p = Box(alg, p.v.at[2].set(1.))
    k = Box(alg, k.v.at[3].set(1.))
    s = S().shift(1.)
    t, v = S(), S()
    w = S().shift(1.)
    o = S()
    n = table.n_before[0]

    rows = [jnp.stack([s.v, t.v, v.v, w.v, o.v, f.v])]
    ns = [n]
    for j in range(1, nsurf):
        spec = specs[j]
        # the sign of the axial offset is static geometry
        sgn = float(spec.off_sign)
        # transfer (reference elements.py:238)
        fd = (-f).shift(table.offset[j, 2])
        fdp = fd*p
        rt = r + fd*(2*k + fdp)
        kt = k + fdp
        ri, fi, fr, g = _intercept_poly(
            alg, spec, table.curvature[j], sgn, table.aspherics[j],
            rt, p, kt)
        mu = table.mu[j]
        n = table.n_after[j]

        p1 = p.copy().shift(1.)
        mun = mu*p1**-.5                                # (30)
        ct = g*mun*((-2*(kt + fi*p)*fr).shift(1.))      # (31)
        gdct = g*((ct*ct).shift(1 - mu**2)**.5 - ct)    # (32)
        n1i = (mun + gdct)**-1.                         # (33)
        a = fi + fd
        b = -2*n1i*gdct*fr                              # (34)
        c = mun*n1i
        ap = a*p

        r = r + a*(2*k + ap)                            # (35)
        p = (n1i*n1i).shift(-1.)                        # (40)
        k = b*r + c*(k + ap)

        s, t = s + a*v, t + a*w                         # (39)
        v, w = b*s + c*v, b*t + c*w
        o = o + ns[-1]*(a*(p1**.5))                     # (57)
        f = fi

        rows.append(jnp.stack([s.v, t.v, v.v, w.v, o.v, f.v]))
        ns.append(n)
    return jnp.stack(rows), jnp.stack(
        [jnp.asarray(x) for x in ns])


def seidel_coefficients(table, specs, kmax, pupil_distance,
                        field_scale, pupil_scale):
    """(s, t) field/pupil-normalized coefficient vectors for an
    infinite-conjugate system (reference poly_trace.py:115-123):
    evaluate directly in the scaled invariants."""
    stvwof, n = poly_trace_table(table, specs, kmax, pupil_distance)
    return stvwof[-1, 0], stvwof[-1, 1]
