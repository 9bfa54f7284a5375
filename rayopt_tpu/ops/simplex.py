"""Truncated-multinomial (simplex polynomial) algebra.

This is the TPU-native replacement of the reference's Cython kernel
family (reference simplex_accel.pyx:28-209 and simplex.py:53-193): the
coefficients of a d-variable polynomial truncated to total order < n
live on the d-n simplex.  The aberration-polynomial trace (Andersen
1980) is built entirely from four operations on coefficient vectors:

* mul       -- sparse index contraction  c[l] = sum a[i]*b[j], i+j -> l
* pow       -- binomial series around the constant term (the trace
               maintains the a0 == 1 invariant the series requires)
* eval      -- multi-point evaluation (a Vandermonde matmul: MXU work)
* transform -- linear change of variables R^d -> R^d

Index tables are precomputed host-side as flat gather/scatter arrays;
the kernels are then pure vectorized expressions that run identically
as NumPy (host default) and as jittable jnp (TPU path, scatter-add via
.at[].add).  Both backends are cross-checked in the tests.
"""

import functools

import numpy as np


def simplex_iter(d, m):
    """Yield multi-index tuples covering the d-m simplex
    (reference simplex.py:53)."""
    if d == 0:
        yield ()
    else:
        for i in range(m):
            for j in simplex_iter(d - 1, i + 1):
                yield (i - sum(j),) + j


def simplex_size(d, m):
    """Number of points in the d-m simplex (reference simplex.py:64)."""
    n, p = 1, 1
    for i in range(d):
        n *= m + i
        p *= i + 1
    return n//p


def simplex_enum(d, m):
    """Forward (idx) and backward (jdx) index maps
    (reference simplex.py:74)."""
    idx = np.zeros((m,)*d, dtype=np.int32)
    jdx = np.zeros((simplex_size(d, m), d), dtype=np.int32)
    for j, i in enumerate(simplex_iter(d, m)):
        idx[i] = j
        jdx[j] = i
    return idx, jdx


@functools.lru_cache(maxsize=None)
def mul_table(d, m):
    """Flat multiplication table: (out, ia, ib) index triples such that
    c[out] += a[ia]*b[ib] computes the truncated product."""
    idx, jdx = simplex_enum(d, m)
    out, ia, ib = [], [], []
    for pq in simplex_iter(2*d, m):
        p, q = pq[0::2], pq[1::2]
        out.append(idx[tuple(pi + qi for pi, qi in zip(p, q))])
        ia.append(idx[p])
        ib.append(idx[q])
    return (np.asarray(out, dtype=np.int32),
            np.asarray(ia, dtype=np.int32),
            np.asarray(ib, dtype=np.int32))


def _multinomial_assignments(ji, d):
    """All ways to split the multi-index ji over d output variables:
    yields (p matrix (d, d), multinomial weight).  Row k of p sums to
    ji[k]; the weight is prod_k multinom(ji[k]; p[k])."""
    from math import comb

    def compositions(total, parts):
        if parts == 1:
            yield (total,)
            return
        for first in range(total + 1):
            for rest in compositions(total - first, parts - 1):
                yield (first,) + rest

    def multinom(row):
        t, r = 0, 1
        for v in row:
            t += v
            r *= comb(t, v)
        return r

    rows = [list(compositions(jik, d)) for jik in ji]

    def rec(k, acc, w):
        if k == len(rows):
            yield acc, w
            return
        for row in rows[k]:
            yield from rec(k + 1, acc + [row], w*multinom(row))

    yield from rec(0, [], 1)


@functools.lru_cache(maxsize=None)
def transform_table(d, m):
    """Scatter table for the linear change of variables
    x_k -> sum_j t[k, j] x_j (reference simplex_accel.pyx:149-182).

    Returns (t_in, t_out, t_mult, t_pows): for each term,
    out[t_out] += t_mult * prod(t.flat ** t_pows) * in[t_in].
    """
    idx, jdx = simplex_enum(d, m)
    t_in, t_out, t_mult, t_pows = [], [], [], []
    for i, ji in enumerate(jdx):
        for p, w in _multinomial_assignments(tuple(int(v) for v in ji), d):
            p = np.asarray(p)  # p[k, j]: power of t[k, j]
            lout = idx[tuple(p.sum(axis=0))]
            t_in.append(i)
            t_out.append(lout)
            t_mult.append(w)
            t_pows.append(p.ravel())
    return (np.asarray(t_in, dtype=np.int32),
            np.asarray(t_out, dtype=np.int32),
            np.asarray(t_mult, dtype=np.float64),
            np.asarray(t_pows, dtype=np.int32))


# -- NumPy kernels (host default) ------------------------------------


def mul_np(table, a, b):
    out, ia, ib = table
    c = np.zeros(a.shape[-1], dtype=np.result_type(a, b))
    np.add.at(c, out, a[..., ia]*b[..., ib])
    return c


def pow_np(table, order, a, p):
    """Binomial series a0^p * sum_k C(p, k) (a - a0)^k (reference
    simplex_accel.pyx:49-72; requires |a0| == 1 scaled bases, which the
    poly trace maintains)."""
    x = np.array(a, dtype=float)
    x[0] = 0.
    y = p*x
    z = y.copy()
    z[0] += 1.
    for i in range(1, order):
        y = (p - i)/(i + 1.)*mul_np(table, x, y)
        z += y
    return z*a[0]**p


def eval_np(jdx, a, x):
    """Evaluate at x (d, m) -> (m,); a Vandermonde contraction
    (reference simplex_accel.pyx:75-96)."""
    x = np.asarray(x, dtype=float)
    mono = np.prod(x.T[:, None, :]**jdx[None, :, :], axis=-1)  # (m, q)
    return mono @ np.asarray(a, dtype=float)


def transform_np(table, x, t):
    t_in, t_out, t_mult, t_pows = table
    x = np.atleast_2d(np.asarray(x, dtype=float))
    tf = np.asarray(t, dtype=float).ravel()
    fac = t_mult*np.prod(tf[None, :]**t_pows, axis=-1)
    y = np.zeros_like(x)
    for r in range(x.shape[0]):
        np.add.at(y[r], t_out, fac*x[r, t_in])
    return y


# -- JAX kernels (jit/grad/TPU path) ----------------------------------


def mul_jax(table, a, b):
    import jax.numpy as jnp
    out, ia, ib = table
    c = jnp.zeros(a.shape[-1], dtype=a.dtype)
    return c.at[out].add(a[ia]*b[ib])


def pow_jax(table, order, a, p):
    import jax.numpy as jnp
    x = a.at[0].set(0.)
    y = p*x
    z = y.at[0].add(1.)
    for i in range(1, order):
        y = (p - i)/(i + 1.)*mul_jax(table, x, y)
        z = z + y
    return z*a[0]**p


def eval_jax(jdx, a, x):
    import jax.numpy as jnp
    x = jnp.asarray(x)
    mono = jnp.prod(x.T[:, None, :]**jdx[None, :, :], axis=-1)
    return mono @ a


def transform_jax(table, x, t):
    import jax
    import jax.numpy as jnp
    t_in, t_out, t_mult, t_pows = table
    x = jnp.atleast_2d(x)
    tf = jnp.ravel(t)
    fac = t_mult*jnp.prod(tf[None, :]**t_pows, axis=-1)

    def row(xr):
        return jnp.zeros(xr.shape[-1], xr.dtype).at[t_out].add(
            fac*xr[t_in])

    return jax.vmap(row)(x)


# -- ndarray-subclass front-end (reference simplex.py:109-193) ---------


def simplex_transform(idx, jdx, x, t):
    """Module-level transform matching the reference signature
    (reference simplex.py:26-35): infers (d, m) from jdx."""
    d = jdx.shape[1]
    m = int(jdx.max()) + 1
    return transform_np(transform_table(d, m), x, t)


@functools.lru_cache(maxsize=None)
def make_simplex(d0, n0):
    """Class factory: an ndarray subclass with truncated-multinomial
    mul/pow/shift/eval/transform (reference simplex.py:109)."""
    idx0, jdx0 = simplex_enum(d0, n0)
    mtab = mul_table(d0, n0)

    class Simplex(np.ndarray):
        d, n = d0, n0
        i, j = idx0, jdx0
        q = jdx0.shape[0]

        def __new__(cls, t=None):
            if t is None:
                t = np.zeros(cls.q, np.double)
            else:
                t = np.asarray(t).astype(np.double)
                assert t.shape[0] == cls.q
            return t.view(cls)

        def __array_finalize__(self, obj):
            if obj is None:
                return
            assert obj.shape == (self.q,), obj.shape
            assert obj.dtype == np.double

        def __mul__(self, other):
            cls = self.__class__
            if isinstance(other, cls):
                return mul_np(mtab, np.asarray(self),
                              np.asarray(other)).view(cls)
            return np.ndarray.__mul__(self, other)

        def __pow__(self, other):
            if np.isscalar(other):
                return pow_np(mtab, self.n, np.asarray(self),
                              float(other)).view(self.__class__)
            return np.ndarray.__pow__(self, other)

        def shift(self, a):
            """Offset the constant term in place; returns self."""
            self[0] += a
            return self

        def __call__(self, *x):
            assert len(x) == self.d
            x = np.array(np.broadcast_arrays(*x), dtype=float)
            return eval_np(self.j, np.asarray(self), x)

        def transform(self, t):
            p = transform_np(transform_table(self.d, self.n),
                             np.asarray(self)[None], t)[0]
            return p.view(self.__class__)

    Simplex.__name__ = f"Simplex{d0}d{n0}n"
    return Simplex
