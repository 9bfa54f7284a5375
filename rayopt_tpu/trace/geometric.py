"""GeometricTrace: exact real-ray trace front-end.

API parity with reference geometric_trace.py:30-265.  The per-surface
Python hot loop of the reference runs as one jitted `lax.scan`/fused
kernel over the SurfaceTable (rayopt_tpu.ops.geometric); this class
holds the resulting (nsurf, nrays, 3) history and provides analysis
primitives (refocus, OPD, PSF, RMS, Zernike) and bundle factories
(rays_point/clipping/line).
"""

import itertools

import numpy as np

from ..utils.math import sinarctan, tanarcsin
from ..utils.distributions import pupil_distribution
from .base import Trace


class GeometricTrace(Trace):
    """
    y[i]: intercept at surface i
    i[i]: incidence direction before surface i
    u[i]: excidence direction after surface i
    all in surface-normal coordinates relative to the vertex.
    """

    def allocate(self, nrays):
        super().allocate()
        self.nrays = nrays
        shape = (self.length, nrays, 3)
        self.n = np.empty(self.length)
        self.y = np.empty(shape)
        self.u = np.empty(shape)
        self.i = np.empty(shape)
        self.t = np.empty(shape[:2])
        self.w = None
        self.ref = None
        self.l = 1.

    # -- seeding and propagation -----------------------------------------

    def rays_given(self, y, u, l=None, w=None, ref=0):
        """Store a seed bundle; short vectors are zero-padded and
        forward z components completed (reference
        geometric_trace.py:49)."""
        y, u = np.atleast_2d(y, u)
        y, u = np.broadcast_arrays(y, u)
        nrays, ncomp = y.shape
        if getattr(self, "y", None) is None or \
                self.y.shape[1] != nrays:
            self.allocate(nrays)
        self.l = self.system.wavelengths[0] if l is None else l
        self.w = np.ones(nrays)/nrays if w is None else w
        self.ref = ref
        self.y[0] = 0
        self.y[0, :, :ncomp] = y
        self.u[0, :, :ncomp] = u
        if ncomp < 3:  # forward rays
            u2 = np.square(self.u[0, :, :2]).sum(-1)
            self.u[0, :, 2] = np.sqrt(1 - u2)
        self.i[0] = self.u[0]
        self.n[0] = self.system.refractive_index(self.l, 0)
        self.t[0] = 0

    def propagate(self, start=1, stop=None, clip=False):
        super().propagate()
        first = start - 1
        ys, us, iis, ts = self.system.trace_table(
            self.y[first], self.u[first], self.l, start, stop, clip)
        sl = slice(first + 1, first + ys.shape[0])
        self.y[sl], self.u[sl] = ys[1:], us[1:]
        self.i[sl], self.t[sl] = iis[1:], ts[1:]
        n = self.n[first]
        for j, e in enumerate(self.system[start:stop]):
            if hasattr(e, "get_n_mu"):
                n, _ = e.get_n_mu(n, self.l)
            self.n[start + j] = n

    # -- analysis primitives ----------------------------------------------

    def _weights(self, mask=None):
        w = self.w if self.w is not None else \
            np.ones(self.nrays)/self.nrays
        return w if mask is None else w[mask]

    def refocus(self, at=-1):
        """Weighted least-squares focus shift from the transverse
        spread (reference geometric_trace.py:82)."""
        pos = self.y[at, :, :2]
        slope = tanarcsin(self.i[at])
        alive = np.all(np.isfinite(slope), axis=1)
        pos, slope = pos[alive], slope[alive]
        w = self._weights(alive)
        pos = pos - pos.mean(0)
        slope = slope - slope.mean(0)
        num = np.dot((w[:, None]*pos).ravel(), slope.ravel())
        den = np.dot((w[:, None]*slope).ravel(), slope.ravel())
        self.system[at].distance -= num/den
        self.propagate()

    def opd(self, radius=None, after=-2, image=-1, resample=4):
        """Optical path difference on the exit-pupil reference sphere
        (reference geometric_trace.py:101); resample > 0 grids the
        samples for contouring."""
        from ..elements import Spheroid
        ref = self.ref
        t = (self.t[:after + 1] - self.t[:after + 1, (ref,)]).sum(0)
        if not self.system.object.finite:
            # input reference: the plane normal to the chief ray
            t -= self.n[0]*np.dot(self.u[0, ref],
                                  (self.y[0, ref] - self.y[0]).T)
        if radius is None:
            if self.system.image.pupil.telecentric:
                radius = self.track[image] - self.track[after]
            else:
                radius = -self.system.image.pupil.distance
        # express the after-surface rays in the image frame, centered
        # on the reference sphere
        ea, ei = self.system[after], self.system[image]
        pos = ei.to_normal(ea.from_normal(self.y[after]) +
                           (self.origins[after] - self.origins[image]))
        pos = pos - self.y[image, ref]
        direc = ei.to_normal(ea.from_normal(self.u[after]))
        pos[:, 2] += radius
        ti = Spheroid(curvature=1./radius).intercept(pos, direc)
        t += (ti - ti[ref])*self.n[after]
        t = -t/(self.l/self.system.scale)
        hit = pos + ti[:, None]*direc
        hit[:, 2] -= radius
        hit -= hit[ref]
        x, y = hit[:, 0], hit[:, 1]
        if not resample:
            return x, y, t
        from scipy.interpolate import griddata
        keep = np.all(np.isfinite(np.vstack((x, y, t))), axis=0)
        if not keep.any():
            raise ValueError("no rays made it through")
        x, y, t = x[keep], y[keep], t[keep]
        npts = int(resample*self.nrays**.5)
        h = max(np.fabs(x).max(), np.fabs(y).max())
        gx, gy = np.mgrid[-1:1:1j*npts, -1:1:1j*npts]*h
        gt = griddata((x, y), t, (gx, gy), method="linear",
                      fill_value=np.nan)
        return gx, gy, gt

    def psf(self, pad=4, resample=4, **kwargs):
        """Point spread function: FFT of the pupil function
        exp(-2 pi i OPD) (reference geometric_trace.py:146)."""
        radius = self.system[-1].distance
        x, y, o = self.opd(resample=resample, radius=radius, **kwargs)
        if not resample:
            raise NotImplementedError
        good = np.isfinite(o)
        amp = np.where(good, np.exp(-2j*np.pi*o), 0)
        amp /= np.count_nonzero(good)**.5
        shape = tuple(pad*s for s in amp.shape)
        field = np.fft.fft2(amp, shape)
        psf = (field*field.conj()).real/field.size
        dx = x[1, 0] - x[0, 0]
        waves_per_len = 1/(self.l/self.system.scale)
        freq = np.fft.fftfreq(shape[0], dx*waves_per_len/radius)
        p, q = np.broadcast_arrays(freq[:, None], freq)
        return p, q, psf

    def zernike(self, nterms=15, **kwargs):
        """Noll-Zernike decomposition of the exit-pupil wavefront (in
        waves): returns (coefficients, residual RMS)."""
        from ..utils.zernike import fit_zernike
        x, y, o = self.opd(resample=0, **kwargs)
        h = np.nanmax(np.hypot(x, y))
        return fit_zernike(x/h, y/h, o, nterms=nterms, w=self.w)

    def rms(self, i=-1, ref=None):
        """Weighted transverse spot RMS about the centroid (or a
        reference ray) (reference geometric_trace.py:171)."""
        pts = self.y[i, :, :2]
        center = pts.mean(0) if ref is None else pts[ref]
        r2 = np.square(pts - center).sum(1)
        return np.sqrt((r2*self._weights()).sum())

    # -- bundle factories ---------------------------------------------

    def rays_paraxial(self, paraxial=None):
        """Seed from the paraxial marginal/chief pair (reference
        geometric_trace.py:185)."""
        if paraxial is None:
            paraxial = self.system.paraxial
        ax = paraxial.axis
        y = np.zeros((2, 2))
        u = np.zeros((2, 2))
        y[:, ax] = paraxial.y[0]
        u[:, ax] = sinarctan(paraxial.u[0])
        self.rays_given(y, u)
        self.propagate()

    def rays(self, yo, yp, wavelength, stop=None, filter=None,
             clip=False, weight=None, ref=0):
        if filter is None:
            filter = not clip
        z, p = self.system.pupil(yo, l=wavelength, stop=stop)
        y, u = self.system.aim(yo, yp, z, p, filter=filter)
        self.rays_given(y, u, wavelength, weight, ref)
        self.propagate(clip=clip)

    def rays_point(self, yo, wavelength=None, nrays=11,
                   distribution="meridional", filter=None, stop=None,
                   clip=False):
        ref, yp, weight = pupil_distribution(distribution, nrays)
        self.rays(yo, yp, wavelength, filter=filter, stop=stop,
                  clip=clip, weight=weight, ref=ref)

    def rays_clipping(self, yo, wavelength=None, axis=1):
        """Chief plus the two rim rays found by the vignetting solve
        (reference geometric_trace.py:211)."""
        z, p = self.system.pupil(yo, l=wavelength, stop=-1)
        yp = np.zeros((3, 2))
        yp[1:, axis] = p[:, axis]/np.fabs(p).max()
        self.rays(yo, yp, wavelength, stop=-1, filter=False)

    def rays_line(self, yo, wavelength=None, nrays=21, eps=1e-2):
        """Chief/meridional/sagittal triplets along a field line
        (reference geometric_trace.py:217)."""
        fractions = np.linspace(0, 1, nrays)[:, None]
        points = fractions*np.atleast_2d(yo)
        eps_grid = np.zeros((3, 2))
        eps_grid[(1, 2), (1, 0)] = eps
        z, p = self.system.pupil((0, 0), l=wavelength)
        y = np.empty((3, nrays, 3))
        u = np.empty_like(y)
        for i, pt in enumerate(points):
            z = self.system.aim_chief(pt, z, np.fabs(p).max(),
                                      l=wavelength)
            y[:, i], u[:, i] = self.system.aim(pt, eps_grid, z, p)
        self.rays_given(y.reshape(-1, 3), u.reshape(-1, 3), wavelength)
        self.propagate()

    # -- edits / output -------------------------------------------------

    def resize(self, fn=lambda a, b: a):
        """Set element radii from traced ray heights
        (reference geometric_trace.py:231)."""
        heights = np.hypot(self.y[:, :, 0], self.y[:, :, 1])
        for e, hi in zip(self.system[1:], heights[1:]):
            e.radius = fn(np.nanmax(hi), e.radius)

    def plot(self, ax, axis=1, **kwargs):
        kwargs.setdefault("color", "green")
        pts = np.array([el.from_normal(yi) + oi for el, yi, oi
                        in zip(self.system, self.y, self.origins)])
        ax.plot(pts[:, :, 2], pts[:, :, axis], **kwargs)

    def print_trace(self):
        rel = np.cumsum(self.t, axis=0) - self.path[:, None]
        labels = ("n/track z/rel path/height x/height y/height z/"
                  "angle x/angle y/angle z").split("/")
        for i in range(self.nrays):
            yield "ray %i" % i
            cols = np.concatenate((
                self.n[:, None], self.path[:, None], rel[:, i, None],
                self.y[:, i, :], self.u[:, i, :]), axis=1)
            yield from self.print_coeffs(cols, labels, sum=False)
            yield ""

    def text(self):
        return itertools.chain(self.print_trace())

    def __str__(self):
        return "\n".join(self.text())


class FullTrace(GeometricTrace):
    pass
