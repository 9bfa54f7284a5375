"""Merit-function optimization.

Two paths:

* `optimize` -- API parity with the reference wrapper
  (reference optimize.py:24-161): Variables (get/set on System paths,
  bounds, scaling) and Operands (weight/offset/min/max -> objective,
  equality, inequality) driving scipy.optimize.minimize.

* `optimize_grad` (see rayopt_tpu.parallel.grad) -- the TPU-native
  replacement: the merit is a pure function of the SurfaceTable pytree,
  differentiated end-to-end with jax.grad through the ray trace instead
  of finite differences, and minimized with optax.
"""

import functools

import numpy as np
from scipy.optimize import minimize


class Variable:
    def __init__(self, system, bounds=(-np.inf, np.inf),
                 scale=None, init=None):
        self.system = system
        if scale is None:
            rng = bounds[1] - bounds[0]
            assert np.isfinite(rng)
            scale = rng
        self.scale = scale
        self.bounds = bounds
        if init is None:
            init = self.get()
        self.init = init

    def get(self):
        raise NotImplementedError

    def set(self, value):
        raise NotImplementedError


class PathVariable(Variable):
    def __init__(self, system, path, *args, **kwargs):
        self.path = path
        super().__init__(system, *args, **kwargs)

    def get(self):
        return self.system.get_path(self.path)

    def set(self, value):
        self.system.set_path(self.path, value)


class Operand:
    def __init__(self, system, weight=None, offset=0, min=None, max=None):
        self.system = system
        self.weight = weight
        self.offset = offset
        self.min = min
        self.max = max

    def get(self):
        raise NotImplementedError

    def get_objective(self):
        if self.weight:
            yield lambda v: self.weight*(v - self.offset)

    def get_equality(self):
        if self.min is not None and self.min == self.max:
            yield lambda v: v - self.offset

    def get_inequality(self):
        if self.min is not None:
            yield lambda v: v - self.offset - self.min
        if self.max is not None:
            yield lambda v: self.max - (v - self.offset)


class FuncOp(Operand):
    def __init__(self, system, func, *args, **kwargs):
        super().__init__(system, *args, **kwargs)
        self.func = func

    def get(self):
        return np.atleast_1d(self.func(self.system)).ravel()


def optimize(variables, operands, callback=None, tol=1e-4, options={},
             trace=False, **kwargs):
    """Constrained merit minimization (reference optimize.py:93)."""
    assert variables
    assert operands
    s = np.array([v.scale for v in variables])
    x0 = np.array([v.get() for v in variables])/s
    x1 = np.array([v.init for v in variables])/s
    bounds = np.array([v.bounds for v in variables])/s[:, None]

    ob, eq, ineq = [], [], []
    for i, op in enumerate(operands):
        for obi in op.get_objective():
            ob.append((i, obi))
        for eqi in op.get_equality():
            eq.append((i, eqi))
        for ineqi in op.get_inequality():
            ineq.append((i, ineqi))
    assert ob

    def up(x):
        for xi, vi in zip(np.asarray(x)*s, variables):
            vi.set(xi)

    @functools.lru_cache(maxsize=len(variables) + 1)
    def ex(*x):
        up(x)
        return [op.get() for op in operands]

    def fun(x):
        v = ex(*x)
        o = np.concatenate([obi(v[i]) for i, obi in ob])
        return np.square(o).sum()

    def feq(x):
        v = ex(*x)
        return np.concatenate([eqi(v[i]) for i, eqi in eq])

    def fineq(x):
        v = ex(*x)
        return np.concatenate([ineqi(v[i]) for i, ineqi in ineq])

    cons = []
    if eq:
        cons.append({"type": "eq", "fun": feq})
    if ineq:
        cons.append({"type": "ineq", "fun": fineq})

    xi, vi, fi = [], [], []

    def cb(x):
        if trace:
            v = ex(*x)
            xi.append(np.asarray(x)*s)
            vi.append(v)
            fi.append([obi(v[i]) for i, obi in ob])
        if callback:
            return callback(x)

    opts = dict(maxiter=100, eps=1e-5)
    opts.update(options)
    r = minimize(fun, x1, bounds=bounds, constraints=cons, callback=cb,
                 tol=tol, options=opts, **kwargs)
    r.accept = lambda: up(r.x)
    r.reject = lambda: up(x0)
    r.trace_x = np.array(xi)
    r.trace_v = vi
    r.trace_f = [(i, np.array([fj[j] for fj in fi]))
                 for j, (i, obi) in enumerate(ob)]
    return r
