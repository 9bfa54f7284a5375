"""Conjugate aiming tests (mirrors reference test_conjugates.py):
aim() must hit the prescribed pupil coordinates."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu import FiniteConjugate, InfiniteConjugate
from rayopt_tpu.utils.math import tanarcsin, sinarctan


def assert_hits(y, u, z, yp):
    y1 = y[:, :2] + (z - y[:, 2])*tanarcsin(u)
    nptest.assert_allclose(y1, yp, atol=1e-14, rtol=1e-2)


def assert_aims(c, yo, yp):
    yo, yp = np.broadcast_arrays(*np.atleast_2d(yo, yp))
    y, u = c.aim(yo, yp)
    nptest.assert_allclose(1., np.square(u).sum(-1))
    p = np.arctan2(yo[0, 0], yo[0, 1])
    r = np.array([[np.cos(p), -np.sin(p)], [np.sin(p), np.cos(p)]])
    y1 = np.dot(yp*c.pupil.radius, r)
    assert_hits(y, u, c.pupil.distance, y1)


def some_aims(c):
    ys, ps = [], []
    for i in 0, 1, -1:
        for j in 0, 1, -1:
            ys.extend([(0, i), (i, 0), (0, i), (i, 0)])
            ps.extend([(0, j), (0, j), (j, 0), (0, j)])
    for a, b in zip(ys, ps):
        assert_aims(c, a, b)


def test_finite():
    c = FiniteConjugate(
        radius=.1, pupil=dict(type="slope", distance=6., slope=2./6))
    assert np.isclose(c.pupil.na,
                      sinarctan(c.pupil.radius/c.pupil.distance))
    some_aims(c)


def test_infinite():
    c = InfiniteConjugate(
        angle=.1, pupil=dict(type="radius", distance=6., radius=2/6.))
    some_aims(c)


def test_projections():
    for proj in ("rectilinear", "stereographic", "equisolid",
                 "orthographic", "equidistant"):
        c = InfiniteConjugate(
            angle=.3, projection=proj,
            pupil=dict(type="radius", distance=6., radius=1.))
        y, u = c.aim(np.array([[0., 1.]]), np.array([[0., 0.]]))
        nptest.assert_allclose(np.square(u).sum(-1), 1, atol=1e-12)
        # all projections agree on the small-angle axis behavior
        assert u[0, 2] > .9


def test_projections_hit_pupil():
    """Wide-angle: every projection's aim still hits the prescribed
    pupil coordinates."""
    for proj in ("rectilinear", "stereographic", "equisolid",
                 "orthographic", "equidistant"):
        c = InfiniteConjugate(
            angle=.6, projection=proj,
            pupil=dict(type="radius", distance=5., radius=1.))
        for yo in ((0., 1.), (0., .5), (.3, .4)):
            for yp in ((0., 0.), (0., .7), (-.5, .2)):
                y, u = c.aim(np.atleast_2d(yo), np.atleast_2d(yp))
                nptest.assert_allclose(np.square(u).sum(-1), 1,
                                       atol=1e-12)
                # parallel rays (infinite conjugate): the perpendicular
                # separation from the chief ray equals the pupil offset
                y0, u0 = c.aim(np.atleast_2d(yo))
                nptest.assert_allclose(u, u0, atol=1e-12)
                delta = (y - y0)[0]
                perp = delta - np.dot(delta, u[0])*u[0]
                want = np.linalg.norm(np.asarray(yp))*c.pupil.radius
                nptest.assert_allclose(np.linalg.norm(perp), want,
                                       atol=1e-9)
