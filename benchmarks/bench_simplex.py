"""Microbenchmark: simplex-polynomial kernels vs the reference's only
published performance numbers (reference simplex.py:41-49, Cython on
a ~2015 CPU): Simplex(3,11) multiply 20.2 us/op, pow(-0.5) 154 us/op.

Run: python benchmarks/bench_simplex.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(fn, reps):
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0)/reps)
    return best*1e6


def main():
    from rayopt_tpu.ops.simplex import make_simplex, mul_table, \
        mul_np, pow_np
    from rayopt_tpu.native import build, available

    S = make_simplex(3, 11)
    a = S().shift(3)
    b = a*10
    print("Simplex(3,11), q=%d coefficients" % S.q)
    print("class mul      : %7.2f us/op (reference Cython 20.2 us)"
          % timeit(lambda: a*b, 3000))
    print("class pow -0.5 : %7.2f us/op (reference Cython 154 us)"
          % timeit(lambda: a**-.5, 500))
    tab = mul_table(3, 11)
    an, bn = np.asarray(a), np.asarray(b)
    print("numpy mul      : %7.2f us/op"
          % timeit(lambda: mul_np(tab, an, bn), 2000))
    print("numpy pow      : %7.2f us/op"
          % timeit(lambda: pow_np(tab, 11, an, -.5), 300))
    if available():
        bt = build.BoundTable(tab)
        q = S.q
        print("native mul     : %7.2f us/op"
              % timeit(lambda: bt.mul(an, bn, q), 5000))
        print("native pow     : %7.2f us/op"
              % timeit(lambda: bt.pow(11, an, -.5, q), 2000))


if __name__ == "__main__":
    main()
