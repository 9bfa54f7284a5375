"""Element/Interface/Spheroid: the serializable surface front-end.

API parity with reference elements.py (TransformMixin:30, Element:179,
Interface:276, Spheroid:413).  These objects are a thin, host-side
description layer: `System` lowers a list of them into the
struct-of-arrays `SurfaceTable` (rayopt_tpu.ops.tables) that the jitted
trace engines consume.  The per-element numeric methods here exist for
API compatibility and as single-surface oracles for the batched kernels;
they call the same jnp kernels (rayopt_tpu.ops.surfaces) so both paths
share one implementation of the physics.
"""

import numpy as np

from .utils.registry import NameMixin
from .utils.geometry import rotation_matrix, euler_matrix, euler_from_matrix
from .materials import Material
from .ops import surfaces as _ops
from .utils.jaxtools import on_host


def _np(x):
    return np.asarray(x)


class TransformMixin:
    """Position/orientation of an element relative to the previous one
    (reference elements.py:30-175): offset = distance*direction in the
    lab frame, plus intrinsic-xyz tilt angles."""

    def __init__(self, distance=0., direction=(0, 0, 1.), angles=(0, 0, 0),
                 offset=None):
        self.update(distance, direction, angles)
        if offset is not None:
            self.offset = offset

    def dict(self):
        dat = {}
        if self.distance:
            dat["distance"] = float(self.distance)
        if not self.straight:
            dat["direction"] = list(map(float, self.direction))
        if not self.normal:
            dat["angles"] = list(map(float, self.angles))
        return dat

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, offset):
        d = np.linalg.norm(offset)
        direction = offset/d if d else (0, 0, 1.)
        self.update(d, direction, self._angles)

    @property
    def angles(self):
        return self._angles

    @angles.setter
    def angles(self, angles):
        self.update(self._distance, self._direction, angles)

    @property
    def distance(self):
        return self._distance

    @distance.setter
    def distance(self, distance):
        self.update(distance, self._direction, self._angles)

    @property
    def direction(self):
        return self._direction

    @direction.setter
    def direction(self, direction):
        self.update(self._distance, direction, self._angles)

    def update(self, distance, direction, angles):
        dlen = np.linalg.norm(direction)
        if not dlen:
            direction, dlen = (0, 0, 1.), 1.
        u = np.array(direction, dtype=float)/dlen
        if distance < 0:
            distance, u = -distance, -u
        self._distance = distance
        self._direction = u
        self._offset = distance*u
        self._angles = a = np.asarray(angles, dtype=float)
        self.straight = np.allclose(u, (0, 0, 1.))
        self.normal = np.allclose(a, 0.)
        self.rotated = not (self.straight and self.normal)
        if not self.rotated:
            self.rot_axis = self.rot_normal = None
            return
        r = np.eye(3)
        if not self.straight:
            rdir = np.cross(u, (0, 0, 1.))
            rang = np.arcsin(np.linalg.norm(rdir))
            if u[2] < 0:
                rang = np.pi - rang
            if np.allclose(rdir, 0):
                rdir = 1., 0, 0
            self.rot_axis = r1 = rotation_matrix(rang, rdir)
            r = r @ r1
        else:
            self.rot_axis = None
        if not self.normal:
            r = r @ euler_matrix(*tuple(a), axes="rxyz")
        self.rot_normal = r

    @property
    def incidence(self):
        """Optical-axis direction in surface-normal coordinates."""
        return self.to_normal(self._direction)

    def excidence(self, mu):
        """Axial-ray direction after refraction with ratio mu
        (reference elements.py:93)."""
        i = self.incidence
        if mu == 1:
            return i
        r = np.array([0., 0, 1])
        a = abs(mu)*i[2]
        g = -a + np.sign(mu)*np.sqrt(a**2 - mu**2 + 1)
        return abs(mu)*i + g*r

    def align(self, direction, mu):
        """Tilt the surface so `direction` is the excidence direction
        (reference elements.py:103)."""
        i = self.direction
        r = mu*i - np.asarray(direction, dtype=float)
        if mu < 1:
            r = -r
        if np.allclose(r, 0):
            r = np.array([0., 0, 1])
        r = r/np.linalg.norm(r)
        rdir = np.cross(i, r)
        rang = np.arcsin(np.linalg.norm(rdir))
        if np.allclose(rdir, 0):
            rdir = 1., 0, 0
        rot = rotation_matrix(rang, rdir).T
        angles = euler_from_matrix(rot, "rxyz")
        self.update(self.distance, self.direction, angles)

    def _rotate(self, rotation, inverse, flag, ys):
        if flag:
            if inverse:
                rotation = rotation.T
            ys = tuple(np.dot(yi, rotation) for yi in ys)
        if len(ys) == 1:
            return ys[0]
        return ys

    def from_axis(self, *y):
        return self._rotate(self.rot_axis, False, not self.straight, y)

    def to_axis(self, *y):
        return self._rotate(self.rot_axis, True, not self.straight, y)

    def from_normal(self, *y):
        return self._rotate(self.rot_normal, False, self.rotated, y)

    def to_normal(self, *y):
        return self._rotate(self.rot_normal, True, self.rotated, y)


class Element(NameMixin, TransformMixin):
    """A bare reference plane with an aperture
    (reference elements.py:179)."""

    _default_type = "spheroid"

    def __init__(self, radius=np.inf, diameter=None, **kwargs):
        super().__init__(**kwargs)
        if diameter is not None:
            radius = diameter/2
        self.radius = radius

    def dict(self):
        dat = NameMixin.dict(self)
        dat.update(TransformMixin.dict(self))
        if np.isfinite(self.radius):
            dat["radius"] = float(self.radius)
        return dat

    def intercept(self, y, u):
        return -y[:, 2]/u[:, 2]

    def refract(self, y, u0, mu):
        return u0

    def clip(self, y, u):
        with on_host():
            return _np(_ops.clip_aperture(y, u, self.radius))

    def propagate_paraxial(self, yu0, n0, l):
        n, m = self.paraxial_matrix(n0, l)
        return np.dot(m, yu0), n

    def propagate_gaussian(self, q0i, n0, l):
        n, m = self.paraxial_matrix(n0, l)
        a, b = m[:2, :2], m[:2, 2:]
        c, d = m[2:, :2], m[2:, 2:]
        qi = np.dot(c + np.dot(d, q0i), np.linalg.inv(a + np.dot(b, q0i)))
        return qi, n

    def paraxial_matrix(self, n0, l):
        # 4x4 block matrix [[A, B], [C, D]], sagittal/tangential
        # interleaved; free propagation (reference elements.py:223)
        m = np.eye(4)
        m[0, 2] = m[1, 3] = self.distance/n0
        return n0, m

    def propagate(self, y0, u0, n0, l, clip=True):
        t = self.intercept(y0, u0)
        y = y0 + t[:, None]*u0
        if clip:
            u0 = self.clip(y, u0)
        return y, u0, n0, t*n0

    def reverse(self):
        pass

    def rescale(self, scale):
        self.distance *= scale
        self.radius *= scale

    def surface_cut(self, axis, points):
        xyz = np.zeros((2, 3))
        xyz[:, axis] = -self.radius, self.radius
        return xyz

    def aberration(self, *args):
        return 0

    def dispersion(self, *args):
        return 0

    # polynomial-trace hooks (reference elements.py:238-253); the
    # implementations live in trace/poly.py and dispatch on the table,
    # these exist for subclass API parity.
    def propagate_poly(self, state, l):
        raise NotImplementedError


class Interface(Element):
    """An optical interface carrying a material
    (reference elements.py:276)."""

    def __init__(self, material=None, **kwargs):
        super().__init__(**kwargs)
        if material:
            material = Material.make(material)
        self.material = material

    def dict(self):
        dat = super().dict()
        if self.material is not None:
            dat["material"] = str(self.material)
        return dat

    def get_n_mu(self, n0, l):
        """(index after, refraction ratio) -- mu = n0/n, -1 for mirrors
        (reference elements.py:283)."""
        if self.material is None:
            return n0, 1.
        if self.material.mirror:
            return n0, -1.
        n = self.refractive_index(l)
        return n, n0/n

    def refractive_index(self, wavelength):
        return self.material.refractive_index(wavelength)

    def paraxial_matrix(self, n0, l):
        n, m = super().paraxial_matrix(n0, l)
        if self.material is not None:
            n = self.refractive_index(l)
        return n, m

    def propagate(self, y0, u0, n0, l, clip=True):
        t = self.intercept(y0, u0)
        y = y0 + t[:, None]*u0
        if clip:
            u0 = self.clip(y, u0)
        u = u0
        n, mu = self.get_n_mu(n0, l)
        if mu:
            u = self.refract(y, u0, mu)
        return y, u, n, t*n0

    def dispersion(self, lmin, lmax):
        if self.material is None:
            return 0.
        return self.material.delta_n(lmin, lmax)

    def surface_sag(self, p):
        raise NotImplementedError

    def surface_normal(self, p):
        raise NotImplementedError

    def edge_sag(self, axis=1):
        r = np.zeros(3)
        r[axis] = self.radius
        return self.surface_sag(r)

    def surface_cut(self, axis, points):
        if self.material is None:
            return super().surface_cut(axis, points)
        xyz = np.zeros((points, 3))
        xyz[:, axis] = np.linspace(-self.radius, self.radius, points)
        xyz[:, 2] = -self.surface_sag(xyz)
        return xyz


@Element.register
class Spheroid(Interface):
    """Conic surface with even aspheric terms
    (reference elements.py:413)."""

    def __init__(self, curvature=0., conic=0., aspherics=None, roc=None,
                 alternate_intersection=False, **kwargs):
        super().__init__(**kwargs)
        if roc is not None:
            curvature = 1./roc
        self.alternate_intersection = alternate_intersection
        self.curvature = curvature
        self.conic = conic
        if aspherics is not None:
            aspherics = list(aspherics)
        self.aspherics = aspherics
        if self.curvature and np.isfinite(self.radius) and self.conic > -1:
            assert self.radius**2 <= 1/((1 + self.conic)*self.curvature**2)

    def dict(self):
        dat = super().dict()
        if self.curvature:
            dat["curvature"] = float(self.curvature)
        if self.conic:
            dat["conic"] = float(self.conic)
        if self.aspherics is not None:
            dat["aspherics"] = list(map(float, self.aspherics))
        if self.alternate_intersection:
            dat["alternate_intersection"] = True
        return dat

    @property
    def _aspheric_arr(self):
        if self.aspherics is None:
            return np.zeros(0)
        return np.asarray(self.aspherics, dtype=float)

    def surface_sag(self, xyz):
        with on_host():
            return _np(_ops.surface_sag(np.asarray(xyz, dtype=float),
                                        self.curvature, self.conic,
                                        self._aspheric_arr))

    def surface_normal(self, xyz):
        with on_host():
            return _np(_ops.surface_normal(np.asarray(xyz, dtype=float),
                                           self.curvature, self.conic,
                                           self._aspheric_arr))

    def intercept(self, y, u):
        with on_host():
            return _np(_ops.intercept(
                np.asarray(y, dtype=float), np.asarray(u, dtype=float),
                self.curvature, self.conic, self._aspheric_arr,
                alternate=1. if self.alternate_intersection else 0.))

    def refract(self, y, u0, mu):
        with on_host():
            return _np(_ops.refract(np.asarray(y, dtype=float),
                                    np.asarray(u0, dtype=float), mu,
                                    self.curvature, self.conic,
                                    self._aspheric_arr))

    def paraxial_matrix(self, n0, l):
        # Massey & Siegman, Appl. Opt. 8, 975 (1969): refraction /
        # reflection at tilted surfaces (reference elements.py:503-541)
        n, md = super().paraxial_matrix(n0, l)
        c = self.curvature
        if self.aspherics is not None and len(self.aspherics):
            c = c + 2*self.aspherics[0]
        theta = self.angles[0] if self.angles is not None else 0.
        costheta = np.cos(theta)
        m = np.eye(4)
        if self.material is not None:
            if self.material.mirror:
                m[2, 0] = 2*c*costheta
                m[3, 1] = 2*c/costheta
            else:
                mu = n/n0
                p = np.sqrt(mu**2 + costheta**2 - 1)
                m[1, 1] = p/(mu*costheta)
                m[2, 0] = n0*c*(costheta - p)
                m[3, 1] = mu*m[2, 0]/(costheta*p)
                m[3, 3] = 1/m[1, 1]
        m = np.dot(m, md)
        if self.angles is not None and self.angles[2]:
            phi = self.angles[2]
            cphi, sphi = np.cos(phi), np.sin(phi)
            r1 = np.array([[cphi, -sphi], [sphi, -cphi]])
            r = np.eye(4)
            r[:2, :2] = r[2:, 2:] = r1
            m = np.dot(r, np.dot(m, r.T))
        return n, m

    def reverse(self):
        super().reverse()
        self.curvature *= -1
        if self.aspherics is not None:
            self.aspherics = [-ai for ai in self.aspherics]

    def rescale(self, scale):
        super().rescale(scale)
        self.curvature /= scale
        if self.aspherics is not None:
            self.aspherics = [ai/scale**(2*i + 1) for i, ai
                              in enumerate(self.aspherics)]

    def aberration(self, y, u0, u, n0, n, v0, v):
        """Per-surface third-order (Seidel) transverse contributions
        plus axial/lateral chromatic (reference elements.py:556-587).

        y: (marginal, chief) heights; u0/u: n*u slopes before/after;
        v0/v: dispersion delta-n before/after.
        """
        c = self.curvature
        k = self.conic*c**3/8
        if self.aspherics:
            a2, a4 = (self.aspherics + [0., 0.])[:2]
            k += a4 - a2/4*(4*a2**2 + 6*c*a2 + 3*c**2)
            c = c + 2*a2
        if self.material and self.material.mirror:
            n = -n
        mu = n0/n
        i = c*y + u0/n0                      # incidence
        lag = u[0]*y[1] - u[1]*y[0]          # Lagrange invariant
        s = .5*y*n0*(1 - mu)/lag*(i + u/n)
        w = 4*k*n*(1 - mu)/lag
        tsc = s[0]*i[0]**2 + w*y[0]**4       # transverse spherical
        cc = s[0]*i[0]*i[1] + w*y[0]**3*y[1]  # sagittal coma
        tac = s[0]*i[1]**2 + w*y[0]**2*y[1]**2  # transverse astigmatism
        tpc = -(mu - 1)/n0*c*lag/2           # transverse Petzval
        dc = (s[1]*i[0]*i[1] +
              .5*(u[1]**2/n**2 - u0[1]**2/n0**2) +
              w*y[0]*y[1]**3)                # distortion
        tachc, tchc = -y[0]*i/lag*(v0 - mu*v)  # axial/lateral chromatic
        return tsc, cc, tac, tpc, dc, tachc, tchc
