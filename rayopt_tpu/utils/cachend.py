"""N-D solver caches with interpolated initial guesses.

Parity with reference cachend.py:27-105.  Used by System.pupil to reuse
earlier pupil-aiming solutions as starting points for nearby field
points (the radial PolarCacheND is what the reference uses).
"""

import numpy as np


class CacheND:
    def __init__(self, solver, guess=None, **kwargs):
        self.solver = solver
        self.interpolator = None
        self.kwargs = kwargs
        self.cache = {}
        self.clear(guess)

    def clear(self, guess=None):
        self.cache.clear()
        self.guess = None

    def __call__(self, *args):
        try:
            return self.cache[args]
        except KeyError:
            pass
        guess = self.guess
        if self.interpolator:
            guess = self.interpolator(*args)
            if np.any(np.isnan(guess)):
                guess = self.guess
        value = self.solver(*args, guess=guess, **self.kwargs)
        self.cache[args] = value
        self._update()
        return value

    def _update(self):
        raise NotImplementedError


class NearestCacheND(CacheND):
    def _update(self):
        from scipy.interpolate import NearestNDInterpolator
        xy = list(self.cache.items())
        x = np.array([_[0] for _ in xy])
        y = np.array([_[1] for _ in xy])
        self.interpolator = NearestNDInterpolator(x, y)


class LinearCacheND(CacheND):
    def _update(self):
        if len(self.cache) < 4:
            return
        from scipy.interpolate import LinearNDInterpolator
        xy = list(self.cache.items())
        x = np.array([_[0] for _ in xy])
        y = np.array([_[1] for _ in xy])
        try:
            self.interpolator = LinearNDInterpolator(x, y)
        except Exception:
            self.interpolator = None


class PolarCacheND(CacheND):
    """1-D radial linear interpolation over cached solutions."""

    def _update(self):
        xy = list(self.cache.items())
        x = np.array([_[0] for _ in xy])
        y = np.array([_[1] for _ in xy])
        r = np.sqrt(np.square(x).sum(1))
        i = np.argsort(r)
        self.r = r.take(i)
        self.y = y.take(i, axis=0)
        self.interpolator = self._interpolator

    def _interpolator(self, xo, yo):
        r = np.sqrt(xo**2 + yo**2)
        if r <= self.r[0]:
            return self.y[0]
        if r >= self.r[-1]:
            return self.y[-1]
        i = np.searchsorted(self.r, r)
        ra, rb = self.r[i - 1], self.r[i]
        ya, yb = self.y[i - 1], self.y[i]
        return ya + (yb - ya)*(r - ra)/(rb - ra)
