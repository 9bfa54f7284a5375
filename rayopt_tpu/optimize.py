"""Merit-function optimization (scipy-compatible wrapper).

API parity with reference optimize.py:24-161: Variables get/set values
on the System (with bounds and scaling), Operands turn measured values
into objective / equality / inequality residuals, and `optimize`
minimizes the weighted sum of squares with scipy.

The TPU-native path — jax.grad through the trace with optax — lives in
rayopt_tpu.parallel.grad (optimize_grad / optimize_system); this module
exists so merit definitions written against the reference keep working.
"""

import functools

import numpy as np
from scipy.optimize import minimize


class Variable:
    """A free parameter: subclasses implement get/set."""

    def __init__(self, system, bounds=(-np.inf, np.inf), scale=None,
                 init=None):
        self.system = system
        self.bounds = bounds
        if scale is None:
            span = bounds[1] - bounds[0]
            assert np.isfinite(span), \
                "give either finite bounds or an explicit scale"
            scale = span
        self.scale = scale
        self.init = self.get() if init is None else init

    def get(self):
        raise NotImplementedError

    def set(self, value):
        raise NotImplementedError


class PathVariable(Variable):
    """Variable addressed by a System path, e.g. (1, "curvature")."""

    def __init__(self, system, path, *args, **kwargs):
        self.path = path
        super().__init__(system, *args, **kwargs)

    def get(self):
        return self.system.get_path(self.path)

    def set(self, value):
        self.system.set_path(self.path, value)


class Operand:
    """A measured quantity with weight/offset/min/max semantics:
    weight -> least-squares objective term, min == max -> equality,
    min/max alone -> inequality constraints."""

    def __init__(self, system, weight=None, offset=0, min=None,
                 max=None):
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
    """Operand wrapping an arbitrary callable of the system."""

    def __init__(self, system, func, *args, **kwargs):
        super().__init__(system, *args, **kwargs)
        self.func = func

    def get(self):
        return np.atleast_1d(self.func(self.system)).ravel()


class _Problem:
    """Assembled closures for one optimization run."""

    def __init__(self, variables, operands):
        self.variables = variables
        self.operands = operands
        self.scales = np.array([v.scale for v in variables])
        self.x_current = np.array([v.get() for v in variables])
        self.x_init = np.array([v.init for v in variables])
        self.bounds = (np.array([v.bounds for v in variables]) /
                       self.scales[:, None])
        self.terms = {"objective": [], "equality": [], "inequality": []}
        for i, op in enumerate(operands):
            for fn in op.get_objective():
                self.terms["objective"].append((i, fn))
            for fn in op.get_equality():
                self.terms["equality"].append((i, fn))
            for fn in op.get_inequality():
                self.terms["inequality"].append((i, fn))
        assert self.terms["objective"], "no weighted objective terms"
        # one evaluation per distinct x (scipy probes repeatedly)
        self._evaluate = functools.lru_cache(maxsize=len(variables) + 1)(
            self._evaluate_impl)

    def apply(self, x):
        for value, var in zip(np.asarray(x)*self.scales,
                              self.variables):
            var.set(value)

    def _evaluate_impl(self, *x):
        self.apply(x)
        return [op.get() for op in self.operands]

    def residuals(self, kind, x):
        vals = self._evaluate(*x)
        return np.concatenate([fn(vals[i])
                               for i, fn in self.terms[kind]])

    def objective(self, x):
        return np.square(self.residuals("objective", x)).sum()


def optimize(variables, operands, callback=None, tol=1e-4, options={},
             trace=False, **kwargs):
    """Minimize the weighted merit subject to the operand constraints;
    returns the scipy result augmented with accept()/reject() and the
    iteration trace (reference optimize.py:93-161)."""
    assert variables and operands
    prob = _Problem(variables, operands)

    constraints = []
    if prob.terms["equality"]:
        constraints.append({
            "type": "eq",
            "fun": lambda x: prob.residuals("equality", x)})
    if prob.terms["inequality"]:
        constraints.append({
            "type": "ineq",
            "fun": lambda x: prob.residuals("inequality", x)})

    trail = {"x": [], "v": [], "f": []}

    def on_step(x):
        if trace:
            trail["x"].append(np.asarray(x)*prob.scales)
            vals = prob._evaluate(*x)
            trail["v"].append(vals)
            trail["f"].append([fn(vals[i])
                               for i, fn in prob.terms["objective"]])
        if callback:
            return callback(x)

    opts = dict(maxiter=100, eps=1e-5)
    opts.update(options)
    x0 = prob.x_current/prob.scales
    result = minimize(prob.objective, prob.x_init/prob.scales,
                      bounds=prob.bounds, constraints=constraints,
                      callback=on_step, tol=tol, options=opts,
                      **kwargs)
    result.accept = lambda: prob.apply(result.x)
    result.reject = lambda: prob.apply(x0)
    result.trace_x = np.array(trail["x"])
    result.trace_v = trail["v"]
    result.trace_f = [
        (i, np.array([step[j] for step in trail["f"]]))
        for j, (i, fn) in enumerate(prob.terms["objective"])]
    return result
