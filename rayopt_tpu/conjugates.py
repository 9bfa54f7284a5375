"""Object/image side specification and ray aiming seeds.

Parity with reference conjugates.py:40-255: a Conjugate owns a Pupil
and produces ray origins/directions for fractional (field, pupil)
coordinates.  InfiniteConjugate supports the five field projections
(rectilinear, stereographic, equisolid, orthographic, equidistant).
"""

import numpy as np

from .utils.math import sagittal_meridional, normalize
from .utils.registry import NameMixin
from .pupils import Pupil, RadiusPupil


class Conjugate(NameMixin):
    _default_type = "infinite"
    finite = None

    def __init__(self, pupil=None, projection="rectilinear",
                 update_radius=False):
        if pupil is None:
            self.pupil = RadiusPupil(radius=0.)
        else:
            self.pupil = Pupil.make(pupil)
        self.projection = projection
        self.update_radius = update_radius

    def text(self):
        if self.projection != "rectilinear":
            yield "Projection: %s" % self.projection
        if self.update_radius:
            yield "Update Radius: %s" % self.update_radius
        yield "Pupil:"
        for line in self.pupil.text():
            yield "  %s" % line

    def dict(self):
        dat = super().dict()
        dat["pupil"] = self.pupil.dict()
        if self.projection != "rectilinear":
            dat["projection"] = self.projection
        return dat

    @property
    def wideangle(self):
        return self.projection != "rectilinear"

    def rescale(self, scale):
        self.pupil.rescale(scale)

    def aim(self, xy, pq, z=None, a=None):
        """Return ray origins y and unit directions u for fractional
        object coordinate xy and fractional sagittal/meridional pupil
        coordinate pq.  Aiming is aplanatic (solid-angle grid in object
        space), see reference conjugates.py:77-93."""
        raise NotImplementedError


@Conjugate.register
class FiniteConjugate(Conjugate):
    _type = "finite"
    finite = True

    def __init__(self, radius=0., **kwargs):
        super().__init__(**kwargs)
        self.radius = radius

    @property
    def point(self):
        return not self.radius

    def dict(self):
        dat = super().dict()
        if self.radius:
            dat["radius"] = float(self.radius)
        return dat

    def text(self):
        yield "Radius: %.3g" % self.radius
        yield from super().text()

    def update(self, radius, pupil_distance, pupil_radius):
        self.pupil.update(pupil_distance, pupil_radius)
        if self.update_radius:
            self.radius = radius

    def rescale(self, scale):
        super().rescale(scale)
        self.radius *= scale

    @property
    def slope(self):
        return self.radius/self.pupil.distance

    @slope.setter
    def slope(self, c):
        self.radius = self.pupil.distance*c

    def aim(self, yo, yp=None, z=None, a=None, surface=None, filter=True):
        """Ray seeds from the (possibly curved) object surface through
        pupil coordinates (reference conjugates.py:137-166)."""
        if z is None:
            z = self.pupil.distance
        yo = np.atleast_2d(yo)
        if yp is not None:
            if a is None:
                a = self.pupil.radius
                a = np.array(((-a, -a), (a, a)))
            a = np.arctan2(a, z)
            yp = np.atleast_2d(yp)
            yp = self.pupil.map(yp, a, filter)
            yp = z*np.tan(yp)
            yo, yp = np.broadcast_arrays(yo, yp)

        y = np.zeros((yo.shape[0], 3))
        y[..., :2] = -yo*self.radius
        if surface is not None:
            y[..., 2] = -surface.surface_sag(y)
        uz = (0, 0, z)
        if self.pupil.telecentric:
            u = np.array(uz, dtype=float) + np.zeros_like(y)
        else:
            u = uz - y
        if yp is not None:
            s, m = sagittal_meridional(u, uz)
            u += yp[..., 0, None]*s + yp[..., 1, None]*m
        normalize(u)
        if z < 0:
            u *= -1
        return y, u


@Conjugate.register
class InfiniteConjugate(Conjugate):
    _type = "infinite"
    finite = False

    def __init__(self, angle=0., angle_deg=None, **kwargs):
        super().__init__(**kwargs)
        if angle_deg is not None:
            angle = np.deg2rad(angle_deg)
        self.angle = angle

    @property
    def point(self):
        return not self.angle

    def dict(self):
        dat = super().dict()
        if self.angle:
            dat["angle"] = float(self.angle)
        return dat

    def update(self, radius, pupil_distance, pupil_radius):
        self.pupil.update(pupil_distance, pupil_radius)
        if self.update_radius:
            self.angle = np.arctan2(radius, pupil_distance)

    def text(self):
        yield "Semi-Angle: %.3g deg" % np.rad2deg(self.angle)
        yield from super().text()

    @property
    def slope(self):
        return np.tan(self.angle)

    @slope.setter
    def slope(self, c):
        self.angle = np.arctan(c)

    def map(self, yo, a):
        """Fractional field -> unit direction under the projection
        (reference conjugates.py:208-234)."""
        p = self.projection
        n = yo.shape[0]
        if p == "rectilinear":
            y = yo*np.tan(a)
            u = np.hstack((y, np.ones((n, 1))))
            u /= np.sqrt(np.square(u).sum(-1))[:, None]
        elif p == "stereographic":
            y = yo*(2*np.tan(a/2))
            r = np.square(y).sum(-1)[:, None]/4
            u = np.hstack((y, 1 - r))/(r + 1)
        elif p == "equisolid":
            y = yo*(2*np.sin(a/2))
            r = np.square(y).sum(-1)[:, None]
            u = np.hstack((y*np.sqrt(1 - r/4), 1 - r/2))
        elif p == "orthographic":
            y = yo*np.sin(a)
            r = np.square(y).sum(-1)[:, None]
            u = np.hstack((y, np.sqrt(1 - r)))
        elif p == "equidistant":
            # |yo|*a is the field angle itself; beyond pi/2 the ray
            # points backwards.  (The reference sets z to |sin| --
            # a non-unit direction, reference conjugates.py:227-233;
            # fixed here to z = +-sqrt(1 - sin^2).)
            y = yo*a
            b = np.square(y).sum(-1) > (np.pi/2)**2
            y = np.sin(y)
            z = np.sqrt(np.maximum(0., 1 - np.square(y).sum(-1)))
            z = np.where(b, -z, z)[:, None]
            u = np.hstack((y, z))
        else:
            raise ValueError("unknown projection %r" % p)
        return u

    def aim(self, yo, yp=None, z=None, a=None, surface=None, filter=True):
        """Ray seeds back-projected from the entrance pupil plane
        (reference conjugates.py:236-255)."""
        if z is None:
            z = self.pupil.distance
        yo = np.atleast_2d(yo)
        if yp is not None:
            if a is None:
                a = self.pupil.radius
                a = np.array(((-a, -a), (a, a)))
            yp = np.atleast_2d(yp)
            yp = self.pupil.map(yp, a, filter)
            yo, yp = np.broadcast_arrays(yo, yp)
        u = self.map(yo, self.angle)
        yz = (0, 0, z)
        y = yz - z*u
        if yp is not None:
            s, m = sagittal_meridional(u, yz)
            y += yp[..., 0, None]*s + yp[..., 1, None]*m
        if surface is not None:
            y += surface.intercept(y, u)[..., None]*u
        return y, u
