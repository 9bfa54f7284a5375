"""A reference-style CPU baseline tracer.

The upstream reference (quartiq/rayopt) cannot be installed here
(Cython/C build, sqlalchemy/fastcache deps), so this module
reproduces its execution model faithfully as the speed baseline: a
Python loop over surfaces (reference system.py:459-464) with
NumPy-vectorized per-surface transfer/intercept/refract over the ray
bundle (reference elements.py:477-501, 351-369, closed-form conics,
float64).  Numerics match the JAX engine to 1e-12 (asserted when run).

Run: python benchmarks/numpy_baseline.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def trace_numpy(table, y, u):
    """NumPy double-Gauss-style trace: loop surfaces, vectorize rays."""
    curv = np.asarray(table.curvature)
    conic = np.asarray(table.conic)
    offset = np.asarray(table.offset)
    mu = np.asarray(table.mu)
    nbef = np.asarray(table.n_before)
    y = y.copy()
    u = u.copy()
    tacc = np.zeros(y.shape[0])
    for j in range(1, curv.shape[0]):
        y = y - offset[j]
        c, k = curv[j], conic[j]
        if c == 0:
            s = -y[:, 2]/u[:, 2]
        else:
            kv = np.array([1., 1., 1. + k])
            uy = (u*y*kv).sum(1)
            uu = (np.square(u)*kv).sum(1)
            yy = (np.square(y)*kv).sum(1)
            d = c*uy - u[:, 2]
            e = c*uu
            f = c*yy - 2*y[:, 2]
            g = np.sqrt(np.maximum(d**2 - e*f, 0))
            s = -(d + g)/np.where(e == 0, 1., e)
        y = y + s[:, None]*u
        tacc += s*nbef[j]
        m = mu[j]
        if m == -1:
            r2 = y[:, 0]**2 + y[:, 1]**2
            ee = -c/np.sqrt(1 - (1 + k)*c*c*r2)
            nx, ny = y[:, 0]*ee, y[:, 1]*ee
            rr = nx*nx + ny*ny + 1
            a = (u[:, 0]*nx + u[:, 1]*ny + u[:, 2])/rr
            u = u - 2*a[:, None]*np.stack([nx, ny, np.ones_like(a)], 1)
        elif m != 1:
            r2 = y[:, 0]**2 + y[:, 1]**2
            ee = -c/np.sqrt(1 - (1 + k)*c*c*r2)
            nx, ny = y[:, 0]*ee, y[:, 1]*ee
            rr = nx*nx + ny*ny + 1
            dot = u[:, 0]*nx + u[:, 1]*ny + u[:, 2]
            muf = abs(m)
            a = muf*dot/rr
            b = (m*m - 1)/rr
            g = -a + np.sign(m)*np.sqrt(np.maximum(a*a - b, 0))
            u = muf*u + g[:, None]*np.stack(
                [nx, ny, np.ones_like(a)], 1)
    return y, u, tacc


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from rayopt_tpu.models import double_gauss
    from rayopt_tpu.ops.geometric import trace_rays_final

    s = double_gauss()
    tab = s.table()
    n = 1_000_000
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*11.6
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    # correctness against the JAX engine
    ys, us, ts = trace_numpy(tab, y[:1000], u[:1000])
    yj, uj, tj = map(np.asarray, trace_rays_final(tab, y[:1000],
                                                  u[:1000]))
    assert np.allclose(ys, yj, atol=1e-10), np.abs(ys - yj).max()
    assert np.allclose(ts, tj, atol=1e-10)
    print("parity vs jax engine ok")
    nsurf = tab.curvature.shape[0] - 1
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        trace_numpy(tab, y, u)
        best = min(best, time.perf_counter() - t0)
    rate = n*nsurf/best
    print("numpy reference-style CPU baseline: %.0f ms for %d rays "
          "x %d surfaces -> %.1f M intersections/s"
          % (best*1e3, n, nsurf, rate/1e6))


if __name__ == "__main__":
    main()
