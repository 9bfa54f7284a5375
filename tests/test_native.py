"""Native C++ kernels: build, load, and match the NumPy fallbacks."""

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.native import build, available
from rayopt_tpu.ops import simplex as sx
from rayopt_tpu.utils import geometry as geo

pytestmark = pytest.mark.skipif(not available(),
                                reason="no C++ toolchain")


def test_enum_matches():
    for d, m in ((3, 5), (3, 11), (2, 7)):
        idx_n, jdx_n = build.simplex_enum(d, m)
        idx_p, jdx_p = sx.simplex_enum(d, m)
        nptest.assert_array_equal(jdx_n, jdx_p)
        nptest.assert_array_equal(idx_n, idx_p)


def test_mul_table_matches():
    out_n, ia_n, ib_n = build.mul_table(3, 7)
    # python reference path
    idx, jdx = sx.simplex_enum(3, 7)
    out, ia, ib = [], [], []
    for pq in sx.simplex_iter(6, 7):
        p, q = pq[0::2], pq[1::2]
        out.append(idx[tuple(pi + qi for pi, qi in zip(p, q))])
        ia.append(idx[p])
        ib.append(idx[q])
    nptest.assert_array_equal(out_n, out)
    nptest.assert_array_equal(ia_n, ia)
    nptest.assert_array_equal(ib_n, ib)


def test_mul_pow_eval_match_numpy():
    d, m = 3, 9
    tab = build.mul_table(d, m)
    idx, jdx = sx.simplex_enum(d, m)
    q = jdx.shape[0]
    rng = np.random.RandomState(0)
    a = rng.randn(q)
    b = rng.randn(q)
    nptest.assert_allclose(build.mul(tab, a, b),
                           sx.mul_np(tab, a, b), atol=1e-13)
    a1 = a*.1
    a1[0] = 1.
    nptest.assert_allclose(build.pow(tab, m, a1, -.5),
                           sx.pow_np(tab, m, a1, -.5), atol=1e-13)
    x = rng.uniform(-.5, .5, (d, 11))
    nptest.assert_allclose(build.eval(jdx, a, x),
                           sx.eval_np(jdx, a, x), rtol=1e-12)


def test_rotation_helpers_match():
    rng = np.random.RandomState(1)
    for _ in range(10):
        ang = rng.uniform(-3, 3)
        axis = rng.randn(3)
        nptest.assert_allclose(build.rotation_matrix(ang, axis),
                               geo.rotation_matrix(ang, axis),
                               atol=1e-14)
        a, b, c = rng.uniform(-1.2, 1.2, 3)
        mn = build.euler_matrix_rxyz(a, b, c)
        mp = geo.euler_matrix(a, b, c, "rxyz")
        nptest.assert_allclose(mn, mp, atol=1e-14)
        nptest.assert_allclose(build.euler_from_matrix_rxyz(mn),
                               geo.euler_from_matrix(mp, "rxyz"),
                               atol=1e-12)


def test_poly_trace_uses_native():
    """PolyTrace still reproduces the golden doublet with the native
    mul/pow wired in."""
    from rayopt_tpu import system_from_yaml, PolyTrace
    from tests.test_poly import DOUBLET
    s = system_from_yaml(DOUBLET)
    p = PolyTrace(s, 5)
    st, t = p.st()
    nptest.assert_allclose(st.base[0], 1.566e-03, rtol=1e-3)
