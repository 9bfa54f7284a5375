"""Element-level tests (mirrors reference test_elements.py), including
the cross-engine oracle: near-axis real rays must match the paraxial
trace to O(eps^2)."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu import Spheroid, ModelMaterial, mirror
from rayopt_tpu.utils.math import sinarctan, tanarcsin


class TestTransform:
    def setup_method(self):
        self.s = Spheroid(distance=2., direction=(1, 3, 4.),
                          angles=(.3, .2, .1))

    def test_offset(self):
        nptest.assert_allclose(self.s.offset,
                               self.s.distance*self.s.direction)

    def test_from_to_axis(self, n=10):
        x = np.random.RandomState(0).randn(n, 3)
        x1 = self.s.to_axis(x)
        x2 = self.s.from_axis(x1)
        nptest.assert_allclose(x, x2)

    def test_from_to_normal(self, n=10):
        x = np.random.RandomState(1).randn(n, 3)
        x1 = self.s.to_normal(x)
        x2 = self.s.from_normal(x1)
        nptest.assert_allclose(x, x2)

    def test_rot(self):
        self.s.angles = 0, 0, 0
        x = np.array([0., 0, 3])
        x1 = self.s.from_normal(x)
        nptest.assert_allclose(x1, self.s.direction*3)
        self.s.direction = 0, 0, 1.
        self.s.angles = .1, 0, 0
        x1 = self.s.from_normal(x)
        nptest.assert_allclose(x1, (0, 3*np.sin(.1), 3*np.cos(.1)))


class TestParaxial:
    def setup_method(self):
        self.mat = mat = ModelMaterial(n=1.5)
        self.s0 = Spheroid(curvature=0., distance=0., material=mat)
        self.s = Spheroid(curvature=.1, distance=0, material=mat)
        self.sm0 = Spheroid(curvature=0, distance=0, material=mirror)
        self.sm = Spheroid(curvature=.1, distance=0, material=mirror)

    def test_offset(self):
        nptest.assert_allclose(self.s.direction, (0, 0, 1))
        nptest.assert_allclose(self.s.distance, 0)
        nptest.assert_allclose(self.s.offset, 0)

    def test_snell_paraxial(self):
        y0, u0 = (1, 2), (.2, .1)
        yu, n = self.s0.propagate_paraxial(np.hstack((y0, u0)), 1., 1.)
        y, u = np.hsplit(yu, 2)
        nptest.assert_allclose(y, y0)
        nptest.assert_allclose(u, u0)

    def test_snell_paraxial_mirror(self):
        y0, u0 = (1, 2), (.2, .1)
        yu, n = self.sm0.propagate_paraxial(np.hstack((y0, u0)), 1., 1.)
        y, u = np.hsplit(yu, 2)
        nptest.assert_allclose(y, y0)
        nptest.assert_allclose(u, u0)

    def test_curved_power(self):
        # refraction power phi = c*(n - n0)
        y0, u0 = (1., 0), (0., 0)
        yu, n = self.s.propagate_paraxial(np.hstack((y0, u0)), 1., 1.)
        y, u = np.hsplit(yu, 2)
        nptest.assert_allclose(u[0], -.1*(1.5 - 1))

    def test_align(self):
        d = np.array((0, -.1, 1))
        d /= np.linalg.norm(d)
        mu = 1/self.s0.material.n
        self.s0.align(d, mu)
        e = self.s0.from_normal(self.s0.excidence(mu))
        nptest.assert_allclose(e, d)
        y0, u0 = (1, 2), (.2, .0)
        yu, n = self.s0.propagate_paraxial(np.hstack((y0, u0)), 1., 1.)
        y, u = np.hsplit(yu, 2)
        nptest.assert_allclose(y[0], y0[0])
        nptest.assert_allclose(u[0], u0[0])
        nptest.assert_allclose(u[1], d[0])


class TestParaxToReal:
    """Random near-axis real rays through a tilted, decentered spheroid
    must match the paraxial 4x4 propagation to O(eps^2) -- the
    cross-engine oracle (reference test_elements.py:109-134)."""

    def setup_method(self):
        rng = np.random.RandomState(3)
        self.mat = mat = ModelMaterial(n=1.5)
        d = rng.randn(3)*1e-1 + (0, 0, 1.)
        a = rng.randn(3)*1e-8
        a[1:] = 0
        self.s = Spheroid(curvature=.1, distance=.2, material=mat,
                          direction=d, angles=a)
        de = self.s.excidence(1/self.s.material.n)
        self.sa = Spheroid(direction=de)

    def test_real_similar_to_parax(self, n=100, e=1e-3):
        rng = np.random.RandomState(4)
        y0p = rng.randn(n, 2)*e
        u0p = rng.randn(n, 2)*e
        y0r = np.hstack((y0p, np.ones((n, 1))*-self.s.distance))
        u0r = np.hstack((sinarctan(u0p), np.zeros((n, 1))))
        u0r[:, 2] = np.sqrt(1 - np.square(u0p).sum(1))
        yup, np_ = self.s.propagate_paraxial(
            np.hstack((y0p, u0p)).T, 1., 1.)
        yp, up = np.hsplit(yup.T, 2)
        yr, ur, nr, tr = self.s.propagate(y0r, u0r, 1., 1.)
        yr, ur = self.sa.to_axis(yr, ur)
        nptest.assert_allclose(nr, np_, rtol=e**2, atol=3e-8)
        nptest.assert_allclose(yr[:, :2], yp, rtol=e**2, atol=3e-8)
        nptest.assert_allclose(tanarcsin(ur), up/np_, rtol=e**2,
                               atol=3e-8)


class TestSurfaceKernels:
    """Sag/normal/intercept consistency for conics and aspherics."""

    def test_conic_intercept_on_surface(self):
        s = Spheroid(curvature=1/30., conic=-.5)
        rng = np.random.RandomState(5)
        y = rng.randn(50, 3)*2
        y[:, 2] = -10
        u = np.zeros((50, 3))
        u[:, :2] = rng.randn(50, 2)*.05
        u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
        t = s.intercept(y, u)
        p = y + t[:, None]*u
        nptest.assert_allclose(s.surface_sag(p), 0, atol=1e-12)

    def test_aspheric_intercept_on_surface(self):
        s = Spheroid(curvature=1/50., conic=-1.,
                     aspherics=[1e-5, 1e-8])
        rng = np.random.RandomState(6)
        y = rng.randn(50, 3)*3
        y[:, 2] = -10
        u = np.zeros((50, 3))
        u[:, :2] = rng.randn(50, 2)*.05
        u[:, 2] = np.sqrt(1 - np.square(u[:, :2]).sum(1))
        t = s.intercept(y, u)
        p = y + t[:, None]*u
        nptest.assert_allclose(s.surface_sag(p), 0, atol=1e-9)

    def test_paraboloid_axial_ray(self):
        # exactly-axial ray on a paraboloid: the quadratic degenerates;
        # must still intercept (stable conjugate-root form)
        s = Spheroid(curvature=-1/200., conic=-1.)
        y = np.array([[0., 0, 0]])
        u = np.array([[0., 0, 1]])
        t = s.intercept(y, u)
        nptest.assert_allclose(t, 0, atol=1e-12)
        y = np.array([[0., 1e-9, -5]])
        t = s.intercept(y, u)
        nptest.assert_allclose(t, 5, atol=1e-8)

    def test_snell_reflection(self):
        s = Spheroid(curvature=0.)
        u0 = np.array([[0, .1, np.sqrt(1 - .01)]])
        y = np.array([[0., 0, 0]])
        u = s.refract(y, u0, -1.)
        nptest.assert_allclose(u, [[0, .1, -np.sqrt(1 - .01)]])

    def test_snell_refraction_snells_law(self):
        s = Spheroid(curvature=0.)
        th0 = .3
        u0 = np.array([[0, np.sin(th0), np.cos(th0)]])
        y = np.zeros((1, 3))
        mu = 1/1.5
        u = s.refract(y, u0, mu)
        nptest.assert_allclose(np.linalg.norm(u), 1, atol=1e-13)
        th1 = np.arcsin(u[0, 1])
        nptest.assert_allclose(np.sin(th0), 1.5*np.sin(th1), atol=1e-13)

    def test_tir_nan(self):
        s = Spheroid(curvature=0.)
        th0 = 1.2  # beyond critical angle for n=1.5 -> 1
        u0 = np.array([[0, np.sin(th0), np.cos(th0)]])
        y = np.zeros((1, 3))
        u = s.refract(y, u0, 1.5)
        assert np.isnan(u).any()

    def test_clip_nan(self):
        s = Spheroid(curvature=0., radius=1.)
        y = np.array([[0, .5, 0], [0, 1.5, 0.]])
        u = np.tile([0, 0, 1.], (2, 1))
        u1 = s.clip(y, u)
        assert np.isfinite(u1[0]).all()
        assert np.isnan(u1[1]).all()
