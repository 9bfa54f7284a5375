"""Simplex-polynomial algebra: NumPy vs JAX kernel parity, transform
round trips, and agreement with direct polynomial evaluation."""

import numpy as np
from numpy import testing as nptest
import jax.numpy as jnp

from rayopt_tpu.ops import simplex as sx
from rayopt_tpu.utils.geometry import rotation_matrix


def test_sizes():
    # reference simplex.py:46 golden size table
    sizes = [sx.simplex_size(3, n) for n in range(12)]
    assert sizes == [0, 1, 4, 10, 20, 35, 56, 84, 120, 165, 220, 286]


def test_enum_roundtrip():
    idx, jdx = sx.simplex_enum(3, 7)
    for j, ji in enumerate(jdx):
        assert idx[tuple(ji)] == j


def test_mul_matches_eval():
    # (a*b)(x) == a(x)*b(x) for random polynomials
    d, m = 3, 6
    tab = sx.mul_table(d, m)
    idx, jdx = sx.simplex_enum(d, m)
    q = jdx.shape[0]
    rng = np.random.RandomState(0)
    a = rng.randn(q)
    b = rng.randn(q)
    # keep x small so truncation error is negligible
    x = rng.uniform(-.01, .01, (d, 7))
    c = sx.mul_np(tab, a, b)
    va = sx.eval_np(jdx, a, x)
    vb = sx.eval_np(jdx, b, x)
    vc = sx.eval_np(jdx, c, x)
    nptest.assert_allclose(vc, va*vb, rtol=1e-6, atol=1e-12)


def test_pow_inverse():
    # a**-1 * a == 1 for a with unit constant term
    d, m = 3, 7
    tab = sx.mul_table(d, m)
    rng = np.random.RandomState(1)
    q = sx.simplex_size(d, m)
    a = rng.randn(q)*.1
    a[0] = 1.
    inv = sx.pow_np(tab, m, a, -1.)
    one = sx.mul_np(tab, a, inv)
    expect = np.zeros(q)
    expect[0] = 1
    nptest.assert_allclose(one, expect, atol=1e-12)


def test_pow_sqrt():
    d, m = 3, 7
    tab = sx.mul_table(d, m)
    rng = np.random.RandomState(2)
    q = sx.simplex_size(d, m)
    a = rng.randn(q)*.1
    a[0] = 1.
    r = sx.pow_np(tab, m, a, .5)
    back = sx.mul_np(tab, r, r)
    nptest.assert_allclose(back, a, atol=1e-12)


def test_transform_roundtrip():
    # forward and backward rotation recovers the polynomial
    # (reference simplex.py:27-35)
    S = sx.make_simplex(3, 7)
    rng = np.random.RandomState(3)
    a = rng.randn(1, S.q)
    t = rotation_matrix(.7, (1, 2, 3.))
    b = sx.simplex_transform(S.i.ravel(), S.j, a, t)
    c = sx.simplex_transform(S.i.ravel(), S.j, b, t.T.copy())
    nptest.assert_allclose(a, c, atol=1e-10)


def test_transform_matches_eval():
    # p'(x) == p(t x)
    d, m = 3, 5
    idx, jdx = sx.simplex_enum(d, m)
    ttab = sx.transform_table(d, m)
    rng = np.random.RandomState(4)
    q = jdx.shape[0]
    a = rng.randn(q)
    t = rng.randn(d, d)
    b = sx.transform_np(ttab, a[None], t)[0]
    x = rng.uniform(-.5, .5, (d, 9))
    tx = t @ x
    # transform implements substitution x_k -> sum_j t[k,j] x_j
    nptest.assert_allclose(sx.eval_np(jdx, b, x),
                           sx.eval_np(jdx, a, tx), rtol=1e-9)


def test_jax_kernels_match_numpy():
    d, m = 3, 6
    tab = sx.mul_table(d, m)
    ttab = sx.transform_table(d, m)
    idx, jdx = sx.simplex_enum(d, m)
    q = sx.simplex_size(d, m)
    rng = np.random.RandomState(5)
    a = rng.randn(q)
    b = rng.randn(q)
    a1 = a.copy()
    a1[0] = 1.
    t = rng.randn(d, d)
    x = rng.uniform(-1, 1, (d, 5))
    nptest.assert_allclose(
        np.asarray(sx.mul_jax(tab, jnp.asarray(a), jnp.asarray(b))),
        sx.mul_np(tab, a, b), atol=1e-12)
    nptest.assert_allclose(
        np.asarray(sx.pow_jax(tab, m, jnp.asarray(a1), -.5)),
        sx.pow_np(tab, m, a1, -.5), atol=1e-12)
    nptest.assert_allclose(
        np.asarray(sx.eval_jax(jdx, jnp.asarray(a), jnp.asarray(x))),
        sx.eval_np(jdx, a, x), atol=1e-10)
    nptest.assert_allclose(
        np.asarray(sx.transform_jax(ttab, jnp.asarray(a[None]),
                                    jnp.asarray(t))),
        sx.transform_np(ttab, a[None], t), rtol=1e-10, atol=1e-10)


def test_simplex_class():
    S = sx.make_simplex(3, 5)
    a = S().shift(3.)
    b = a*a
    assert b[0] == 9.
    c = S()
    c[1] = 1.
    v = c(np.array([2.]), np.array([0.]), np.array([0.]))
    nptest.assert_allclose(v, [2.])


def test_finite_object_matches_generic():
    """The finite-object fast transform (precomputed closed-form
    scatter, reference simplex_accel.pyx:185-209) equals the generic
    simplex_transform with the structured matrix."""
    import numpy as np
    from rayopt_tpu.ops.simplex import (
        make_simplex, simplex_transform, finite_object_table,
        finite_object_np)
    S = make_simplex(3, 7)
    rng = np.random.default_rng(3)
    s = rng.standard_normal(S.q)
    t = rng.standard_normal(S.q)
    for r, a, c in ((1.7, .3, -.8), (2., -.1, .5), (.4, .9, .2)):
        m = np.array([[r**2, 0, 0], [a**2, c**2, 2*a*c],
                      [r*a, 0, r*c]])
        st = np.dot([[r, a], [0, c]], np.stack([s, t]))
        want = simplex_transform(S.i.ravel(), S.j, st, m)
        tab = finite_object_table(S.d, S.n)
        got = finite_object_np(tab, r, -a, -c, s, t)
        np.testing.assert_allclose(got, want, atol=1e-10, rtol=1e-12)
