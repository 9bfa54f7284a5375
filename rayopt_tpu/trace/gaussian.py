"""Astigmatic gaussian beam trace and resonator analysis.

Behavioral parity with reference gaussian_trace.py:28-291: the beam is
carried as a complex 2x2 inverse-q matrix through the 4x4 ABCD chain;
beam properties (spot/waist/curvature), general-astigmatic freespace
interpolation, and cavity analysis (eigenmodes, Nemes symplectic
checks, |Tr/2| < 1 stability).

The q-matrix algebra lives in module-level functions; the class holds
per-surface state and the user-facing property set.
"""

import itertools

import numpy as np

from .base import Trace


# -- inverse-q algebra --------------------------------------------------

def qi_from_waist(wavelength, n, waist, position=(0., 0.), angle=0.,
                  scale=1e-3):
    """Inverse-q matrix for an elliptical waist, optionally rotated
    (reference gaussian_trace.py:42).  1/q = 1/R - i lam/(pi n w^2)."""
    rayleigh = np.pi*np.asarray(waist)**2*scale/wavelength
    z = np.asarray(position)/n
    qq = np.eye(2)/(z + 1j*rayleigh)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    return rot.T @ qq @ rot


def _rot2(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s], [s, c]])


def qi_complete(wavelength, n, spot, curvature=None, spot_angle=0.,
                curvature_angle=None, scale=1e-3):
    """General-astigmatic inverse-q from measured beam data at a
    plane: principal spot radii (+ their axes angle) and principal
    phase-front curvature radii (+ their own, possibly different,
    axes angle).

    Completes the reference's "make_complete"/"angled" TODO
    (reference gaussian_trace.py:233): intensity and phase ellipses
    with independent orientations form the general-astigmatic beam a
    plain waist constructor cannot express.  Conventions match the
    trace: Im(1/q) = -lam/(pi w^2 scale), Re(1/q) = n/R; curvature
    None means a flat phase front (beam waist in both axes).
    """
    spot = np.broadcast_to(np.asarray(spot, float), (2,))
    rw = _rot2(spot_angle)
    imag = -wavelength/(np.pi*scale*spot**2)
    qi = 1j*(rw.T @ np.diag(imag) @ rw)
    if curvature is not None:
        curvature = np.broadcast_to(np.asarray(curvature, float), (2,))
        if curvature_angle is None:
            curvature_angle = spot_angle
        rc = _rot2(curvature_angle)
        qi = qi + rc.T @ np.diag(n/curvature) @ rc
    return qi


def is_general_astigmatic(qi):
    """True when intensity and phase ellipses are not simultaneously
    diagonalizable (their principal axes differ): the commutator of
    Re(qi) and Im(qi) is nonzero."""
    a, b = qi.real, qi.imag
    return not np.allclose(a @ b - b @ a, 0, atol=1e-12)


def qi_propagate_free(qi, dz):
    """General-astigmatic freespace step on a batch of inverse-q
    matrices (reference gaussian_trace.py:93-102)."""
    xx, xy, yy = qi[:, 0, 0], qi[:, 0, 1], qi[:, 1, 1]
    xy2 = xy**2
    det = 1/((1 + dz*xx)*(1 + dz*yy) - dz**2*xy2)
    out = np.empty_like(qi)
    out[:, 0, 0] = det*(xx*(1 + dz*yy) - dz*xy2)
    out[:, 0, 1] = out[:, 1, 0] = det*xy
    out[:, 1, 1] = det*(yy*(1 + dz*xx) - dz*xy2)
    return out


def principal_angle(qi):
    """Rotation angle of the principal axes, wrapped to (-pi/4, pi/4]
    (reference gaussian_trace.py:104)."""
    xx, xy, yy = qi[:, 0, 0], qi[:, 0, 1], qi[:, 1, 1]
    if np.iscomplexobj(qi):
        ang = np.arctan(2*xy/(xx - yy))/2
    else:
        ang = np.arctan2(2*xy, xx - yy)/2
    return (ang + np.pi/4) % (np.pi/2) - np.pi/4


def to_principal(qi):
    """Diagonalize each matrix; returns (diagonals, angles)."""
    ang = principal_angle(qi)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s], [s, c]])
    diag = np.einsum("jki,ikl,lmi->ijm", rot, qi, rot)
    assert np.allclose(diag[:, 0, 1], 0), diag
    assert np.allclose(diag[:, 1, 0], 0), diag
    return np.diagonal(diag, 0, 1, 2), ang


def abcd_blocks(m):
    return m[:2, :2], m[:2, 2:], m[2:, :2], m[2:, 2:]


def symplectic_check(m):
    """Nemes consistency relations of a 4x4 ray matrix
    (reference gaussian_trace.py:201)."""
    a, b, c, d = abcd_blocks(m)
    checks = [
        (a @ d.T - b @ c.T, np.eye(2)),
        (a @ b.T, b @ a.T),
        (c @ d.T, d @ c.T),
    ]
    for i, (lhs, rhs) in enumerate(checks):
        assert np.allclose(lhs, rhs), (i, lhs, rhs)


def is_stigmatic(m):
    return np.allclose(m[::2, ::2], m[1::2, 1::2])


def is_simple_astigmatic(m):
    """True when the matrix does not couple the x and y planes."""
    cross = m[(0, 0, 1, 1, 2, 2, 3, 3), (1, 3, 0, 2, 1, 3, 0, 2)]
    return np.allclose(cross, 0)


class GaussianTrace(Trace):
    # qi[i] holds the inverse-q matrix after element i, in the frame
    # perpendicular to the excidence direction (aligned systems).

    def __init__(self, system):
        super().__init__(system)
        self.allocate()
        self.rays()
        self.propagate()

    def allocate(self):
        super().allocate()
        self.qi = np.empty((self.length, 2, 2), dtype=complex)
        self.n = np.empty(self.length)

    def make_qi(self, l, n, waist, position=(0, 0.), angle=0.):
        return qi_from_waist(l, n, waist, position, angle,
                             self.system.scale)

    def make_complete(self, spot, curvature=None, spot_angle=0.,
                      curvature_angle=None, l=None, n=None):
        """Input beam from measured data at the object plane (the
        reference's make_complete TODO): principal spot radii and
        phase curvatures with independent axes angles."""
        l = self.system.wavelengths[0] if l is None else l
        if n is None:
            n = self.system.refractive_index(l, 0)
        return qi_complete(l, n, spot, curvature, spot_angle,
                           curvature_angle, self.system.scale)

    @property
    def general_astigmatic(self):
        """Per-surface flag: beam cross-section and phase ellipses
        rotated against each other (general astigmatism)."""
        return np.array([is_general_astigmatic(q) for q in self.qi])

    def _seed_from_object(self, l, n):
        """Default input beam: waist at a finite object, or a waist of
        the pupil radius back at the entrance pupil."""
        obj = self.system.object
        if obj.finite:
            return self.make_qi(l, n, obj.radius)
        pd = obj.pupil.distance
        return self.make_qi(l, n, obj.pupil.radius, (-pd, -pd))

    def rays(self, qi=None, l=None):
        l = self.system.wavelengths[0] if l is None else l
        n = self.system.refractive_index(l, 0)
        if qi is None:
            qi = self._seed_from_object(l, n)
        assert np.allclose(qi.T, qi), qi
        self.wavelength = l
        self.n[0] = n
        self.qi[0] = qi

    def propagate(self, start=1, stop=None):
        super().propagate()
        j = start
        for qi, n in self.system.propagate_gaussian(
                self.qi[start - 1], self.n[start - 1],
                self.wavelength, start, stop):
            self.qi[j] = qi
            self.n[j] = n
            j += 1

    def qin_at(self, z=None):
        """Inverse-q and index sampled at axial positions z (after the
        owning element; reference gaussian_trace.py:81)."""
        if z is None:
            return self.qi, self.n
        idx = np.maximum(np.searchsorted(self.path, z) - 1, 0)
        qi = self.qi[idx, :]
        ni = self.n[idx, ]
        dz = (z - self.path[idx, ])/ni
        return qi_propagate_free(qi, dz), ni

    # -- beam properties --------------------------------------------------

    def angle(self, qi):
        return principal_angle(qi)

    def normal(self, qi):
        return to_principal(qi)

    @staticmethod
    def _axes_of(part, normal):
        """Per-axis values of a symmetric 2x2 batch: principal-frame
        diagonal (+angles) or the raw diagonal."""
        if normal:
            return to_principal(part)
        return np.diagonal(part, 0, 1, 2), None

    def spot_radius_at(self, z=None, normal=False):
        qi, n = self.qin_at(z)
        c = self.wavelength/(self.system.scale*np.pi)
        vals, ang = self._axes_of(-qi.imag, normal)
        radii = np.sqrt(c/vals)
        return (radii, ang) if normal else radii

    def curvature_radius_at(self, z=None, normal=False):
        qi, n = self.qin_at(z)
        vals, ang = self._axes_of(qi.real, normal)
        radii = n[:, None]/vals
        return (radii, ang) if normal else radii

    @property
    def spot_radius(self):
        return self.spot_radius_at()

    @property
    def curvature_radius(self):
        return self.curvature_radius_at()

    @property
    def waist_position(self):
        return -(1/np.diagonal(self.qi, 0, 1, 2)).real*self.n[:, None]

    @property
    def rayleigh_range(self):
        return (1/np.diagonal(self.qi, 0, 1, 2)).imag*self.n[:, None]

    @property
    def waist_radius(self):
        zr = self.rayleigh_range/self.n[:, None]
        return np.sqrt(zr*self.wavelength/np.pi/self.system.scale)

    @property
    def diverging(self):
        return self.curvature_radius > 0

    @property
    def confined(self):
        return self.rayleigh_range > 0

    def intensity_max(self):
        return (2/np.pi)**.5/self.waist_radius

    # -- resonator analysis -----------------------------------------------

    def is_stigmatic(self, m):
        return is_stigmatic(m)

    def is_simple_astigmatic(self, m):
        return is_simple_astigmatic(m)

    def is_proper(self):
        n, m = self.system.paraxial_matrix(self.wavelength)
        symplectic_check(m)

    def _round_trip(self):
        n, m = self.system.paraxial_matrix(self.wavelength)
        assert is_simple_astigmatic(m)
        return m

    @property
    def eigenmodes(self):
        """Self-consistent cavity q per mode and axis (simple
        astigmatic matrices only; reference gaussian_trace.py:189):
        the fixed points q of the per-axis Moebius map, i.e. the roots
        of c q^2 + (d - a) q - b."""
        m = self._round_trip()
        per_axis = [np.roots((m[2 + ax, ax],
                              m[2 + ax, 2 + ax] - m[ax, ax],
                              -m[ax, 2 + ax]))
                    for ax in (0, 1)]
        return np.eye(2)[None, :]/np.array(per_axis).T[:, :, None]

    @property
    def m(self):
        """Half-trace per axis of the round-trip matrix."""
        diag = np.diag(self._round_trip())
        return (diag[:2] + diag[2:])/2

    @property
    def eigenvalues(self):
        half_trace = self.m
        root = (half_trace**2 - 1 + 0j)**.5
        return half_trace + root, half_trace - root

    @property
    def real(self):
        return (self.m**2).imag == 0

    @property
    def stable(self):
        return (self.m**2).real < 1

    # -- edits / output ----------------------------------------------------

    def resize(self, waists=3):
        w, ang = self.spot_radius_at(z=None, normal=True)
        for e, r in zip(self.system[1:], w.max(1)[1:]):
            e.radius = r*waists

    def refocus(self, axis=1):
        self.system[-1].distance += self.waist_position[-1, axis]
        self.system.update()
        self.propagate()

    def print_trace(self):
        spot, ang = self.spot_radius_at(z=None, normal=True)
        cols = np.column_stack((self.path, spot, np.rad2deg(ang),
                                self.waist_position, self.waist_radius))
        return self.print_coeffs(
            cols, "path/spot a/spot b/spot ang/waistx dz/waisty dz/"
            "waist x/waist y".split("/"), sum=False)

    def __str__(self):
        return "\n".join(itertools.chain(self.print_trace(), ("",)))

    def _beam_envelopes(self, npoints, scale):
        """(npoints, 4, 3) axial polylines: +-x and +-y beam edges,
        sign-flipped through mirror segments so folds draw correctly."""
        z = np.linspace(self.path[0], self.path[-1], npoints)
        flip = self.mirrored[np.searchsorted(self.path, z) - 1, ]
        wx, wy = self.spot_radius_at(z).T*scale*flip
        edges = np.array([
            [wx, wx, z], [wy, wy, z], [-wx, -wx, z], [-wy, -wy, z],
        ]).transpose(2, 0, 1)
        return self.from_axis(edges)

    def _waist_marks(self, ax, plot_axis, line_axis, style, scale,
                     **kwargs):
        """Waist bars plus Rayleigh-range ticks inside each gap."""
        root2 = 2**.5
        for j, (el, oi) in enumerate(zip(self.system[1:],
                                         self.origins[1:])):
            wp = self.waist_position[j, line_axis]
            wr = self.waist_radius[j, line_axis]*scale
            zr = self.rayleigh_range[j, line_axis]
            for dz, h, ls in ((0, wr, style),
                              (zr, root2*wr, ":"),
                              (-zr, root2*wr, ":")):
                v = wp + dz - el.distance
                if -el.distance <= v <= 0:
                    seg = el.from_axis(
                        np.array([[h, h, v], [-h, -h, v]])) + oi
                    ax.plot(seg[:, 2], seg[:, plot_axis], ls, **kwargs)

    def plot(self, ax, axis=1, npoints=5001, waist=True, scale=10,
             **kwargs):
        kwargs.setdefault("color", "red")
        edges = self._beam_envelopes(npoints, scale)
        for i, ls in zip((axis, 0 if axis else 1), ("-", "--")):
            ax.plot(edges[:, i::2, 2], edges[:, i::2, axis], ls,
                    **kwargs)
            if waist:
                self._waist_marks(ax, axis, i, ls, scale, **kwargs)
