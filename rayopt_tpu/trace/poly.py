"""PolyTrace: aberration-polynomial trace to arbitrary order.

After T. B. Andersen, Appl. Opt. 19, 3800 (1980) (automatic computation
of aberration coefficients), with the finite-object / telecentric
extensions of Bociort, Andersen, Beckmann, Appl. Opt. 47, 5691 (2008).
Parity with reference poly_trace.py:33-216 and the per-element
polynomial updates of reference elements.py:238-252, 383-408, 589-620.

The polynomial state (PolyState) is propagated surface by surface; each
component is a truncated multinomial in the three rotational invariants
(r, p, k) implemented by rayopt_tpu.ops.simplex.
"""

import itertools
from collections import namedtuple

import numpy as np

from ..ops.simplex import make_simplex, simplex_transform
from .base import Trace

PolyState = namedtuple("PolyState", "f n r p k s t v w o")


def transfer_poly(element, state):
    """Free transfer to the next vertex (reference elements.py:238)."""
    fd = (-state.f).shift(element.offset[2])
    fdp = fd*state.p
    r = state.r + fd*(2*state.k + fdp)
    k = state.k + fdp
    return fd, r, k


def intercept_poly_plane(S, r, p, k):
    """Reference plane intercept (reference elements.py:245)."""
    f = S()
    fr = S()
    g = S().shift(1)
    return r, f, fr, g


def intercept_poly_spheroid(element, S, r, p, k):
    """Conic + aspheric intercept in simplex algebra
    (reference elements.py:589-620, Andersen eqs 44-47 and the
    aspheric fixed-point iteration of eq 28)."""
    u = element.curvature*np.sign(element.offset[2])
    if u == 0.:
        r, f, fr, g = intercept_poly_plane(S, r, p, k)
    else:
        p1 = p.copy().shift(1)
        a = (-u*k).shift(1)
        a -= (a*a - p1*r*u**2)**.5
        a = a*p1**-1                      # (44)
        f = a/u
        r = a*(-a).shift(2)               # (45)
        g = (-a).shift(1)                 # (47)
        fr = .5*u*g**-1.                  # (46)
    if element.aspherics:
        asp = element.aspherics
        sgn = np.sign(element.offset[2])
        r0 = r
        for _ in range(len(asp)):         # fixed-point iterations (28)
            df = S()
            for uj in reversed(asp):
                df = df.shift(uj*sgn)*r
            r = r0 + df*(2*k + df*p)
        dfr = S()
        for i in reversed(range(len(asp))):
            dfr = (dfr*r).shift((i + 1)*asp[i]*sgn)
        f += df
        fr += dfr
        g = (4*r*dfr*dfr).shift(1)**-.5
    return r, f, fr, g


def propagate_poly_element(element, state, wavelength):
    """Per-surface polynomial update (reference elements.py:383-408,
    Andersen eqs 30-40, 57)."""
    if not hasattr(element, "get_n_mu"):
        raise NotImplementedError(
            "polynomial trace requires Interface elements")
    S = state.r.__class__
    fd, rt, kt = transfer_poly(element, state)
    if hasattr(element, "curvature"):
        r, f, fr, g = intercept_poly_spheroid(element, S, rt,
                                              state.p, kt)
    else:
        r, f, fr, g = intercept_poly_plane(S, rt, state.p, kt)
    n, mu = element.get_n_mu(state.n, wavelength)

    p1 = state.p.copy().shift(1)
    mun = mu*p1**-.5                                  # (30)
    ct = g*mun*(-2*(kt + f*state.p)*fr).shift(1)      # (31)
    gdct = g*((ct*ct).shift(1 - mu**2)**.5 - ct)      # (32)
    n1i = (mun + gdct)**-1.                           # (33)
    a = f + fd
    b = -2*n1i*gdct*fr                                # (34)
    c = mun*n1i
    ap = a*state.p

    r = state.r + a*(2*state.k + ap)                  # (35)
    p = (n1i*n1i).shift(-1)                           # (40)
    k = b*r + c*(state.k + ap)

    s = state.s + a*state.v                           # (39)
    t = state.t + a*state.w
    v = b*s + c*state.v
    w = b*t + c*state.w
    o = state.o + state.n*a*p1**.5                    # (57)
    return PolyState(f=f, n=n, r=r, k=k, p=p, s=s, t=t, v=v, w=w, o=o)


class PolyTrace(Trace):
    def __init__(self, system, kmax=3, wavelength=0):
        super().__init__(system)
        self.kmax = kmax
        self.l = self.system.wavelengths[wavelength]
        self.allocate()
        self.rays()
        self.propagate()
        if self.system.object.finite:
            self.bst = self.transform()

    def allocate(self):
        super().allocate()
        self.Simplex = make_simplex(3, self.kmax)
        n = self.length
        self.n = np.empty(n)
        self.stvwof = np.empty((n, 6, self.Simplex.q))

    def telecentric(self):
        if not self.system.object.finite:
            return False
        if self.system.object.pupil.telecentric:
            return True
        return (abs(self.system.object.pupil.slope) >
                abs(self.system.object.slope))

    def rays(self):
        """Seed the polynomial state (reference poly_trace.py:72)."""
        self.n[0] = self.system.refractive_index(self.l, 0)
        pos = 0 if self.telecentric() else \
            self.system.object.pupil.distance
        S = self.Simplex
        state = PolyState(
            f=S().shift(pos), n=self.n[0],
            r=S(), p=S(), k=S(),
            s=S().shift(1), t=S(), v=S(), w=S().shift(1), o=S())
        state.r[1], state.p[2], state.k[3] = 1, 1, 1
        self._state = state

    def propagate(self, start=1, stop=None):
        super().propagate()
        state = self._state
        self.stvwof[start - 1] = (state.s, state.t, state.v, state.w,
                                  state.o, state.f)
        for j, state in enumerate(self.system.propagate_poly(
                state, self.l, start, stop)):
            j += start
            self.stvwof[j] = (state.s, state.t, state.v, state.w,
                              state.o, state.f)
            self.n[j] = state.n

    def transform(self, i=-1):
        """Convert to field/pupil-normalized coordinates
        (reference poly_trace.py:97)."""
        assert self.system.object.finite
        r = self.system.object.pupil.radius
        a = self.system.object.pupil.slope
        c = self.system.object.slope
        telecentric = abs(a) > abs(c)
        if telecentric:
            r = -self.system.object.radius
            a, c = c, a
        m = np.array([[r**2, 0, 0], [a**2, c**2, 2*a*c],
                      [r*a, 0, r*c]])
        st = np.dot([[r, a], [0, c]], self.stvwof[i, :2])
        bst = simplex_transform(self.Simplex.i.ravel(), self.Simplex.j,
                                st, m)
        if telecentric:
            i, j, k = self.Simplex.j.T
            ii = self.Simplex.i[j, i, k]
            bst = bst[::-1, ii].copy()
        return bst[0].view(self.Simplex), bst[1].view(self.Simplex)

    def st(self, i=-1):
        if self.system.object.finite:
            if i == -1:
                return self.bst
            return self.transform(i)
        s, t = self.stvwof[i, :2, :]
        return s.view(self.Simplex), t.view(self.Simplex)

    def evaluate(self, xy, ab, i=-1):
        """Transverse aberration at one-normalized field xy and pupil ab
        (reference poly_trace.py:125)."""
        xy, ab = np.atleast_2d(xy, ab)
        xy, ab = np.broadcast_arrays(xy, ab)
        if not self.system.object.finite:
            xy = xy*self.system.object.pupil.radius
            ab = ab*self.system.object.angle
        r = (xy**2).sum(1)
        p = (ab**2).sum(1)
        k = (xy*ab).sum(1)
        s, t = self.st(i)
        return s(r, p, k)[..., None]*xy + t(r, p, k)[..., None]*ab

    def buchdahl(self, s, t):
        """Buchdahl-style naming of the 3rd/5th order coefficients
        (reference poly_trace.py:140)."""
        n = "Ap Cp Bp S1p S3p S2p S6p S5p S4p".split()
        n.extend("_" + _ for _ in n)
        v = list(s[1:10]) + list(-t[1:10])
        for i in (0, 1, 3, 4, 6, 8):
            v[i] *= -1
            v[i + 9] *= -1
        return list(zip(n, v))

    def seidel(self, s, t):
        """Seidel s1..s5 plus the twelve 5th-order mu coefficients
        (reference poly_trace.py:150)."""
        n = ("s1 s2 s3 s4 s5 m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12"
             .split())
        v = [s[1], -t[1], t[3]/2, s[2] - t[3]/2, -t[2],
             s[4], -t[4] - s[6]/2, -s[6]/2, t[6] + s[5], s[5], s[9],
             -t[5] - t[9]/2 - s[8]/2, -t[9]/2 - s[8]/2, s[8]/2,
             s[7] + t[8], s[7], -t[7]]
        return list(zip(n, v))

    def print_seidel(self):
        for n, v in self.seidel(*self.st()):
            yield f"{n:3s}: {v:12.5e}"

    names = [
        ("spherical aberration", "sagittal coma"),
        ("field curvature", "distortion"),
        ("meridional coma", "field curvature"),
        ("spherical aberration", "circular coma"),
        ("sagittal oblique spherical aberration",
         "meridional elliptical coma"),
        ("circular coma", "oblique spherical aberration"),
        ("field curvature", "distortion"),
        ("sagittal elliptical coma", "meridional field curvature"),
        ("sagittal oblique spherical aberration",
         "meridional elliptical coma"),
    ]

    def print_names(self):
        s, t = self.st()
        for (ns, nt), si, ti, (i, j, k) in zip(self.names, s[1:], t[1:],
                                               self.Simplex.j[1:]):
            yield "s{:1d}{:1d}{:1d}{:1d}: {:37s}: {:12.5e}".format(
                self.Simplex.i[i, j, k], i, j, k, ns, si)
            yield "t{:1d}{:1d}{:1d}{:1d}: {:37s}: {:12.5e}".format(
                self.Simplex.i[i, j, k], i, j, k, nt, ti)

    def print_params(self):
        yield f"maximum order: {self.Simplex.n:d}"
        yield "wavelength: {:g}".format(self.l/1e-9)

    def print_trace(self, components="stvwof", elements=None,
                    cutoff=None, width=12):
        for n in components:
            a = self.stvwof[:, "stvwof".index(n), :].T
            if elements is None:
                elements = range(1, a.shape[1])
            if cutoff is None:
                idx = slice(None)
            else:
                idx = self.Simplex.j.sum(1) < cutoff
            yield f"{n.upper():s}"
            yield "  n  i  j  k " + " ".join(
                f"{i:12d}" for i in elements)
            for (i, j, k), ai in zip(self.Simplex.j[idx],
                                     a[idx][:, elements]):
                lbl = "{:3d}{:3d}{:3d}{:3d}".format(
                    self.Simplex.i[i, j, k], i, j, k)
                yield lbl + " " + " ".join(f"{v:12.5e}" for v in ai)
            yield ""

    def __str__(self):
        return "\n".join(itertools.chain(
            self.print_params(), ("",),
            self.print_seidel(), ("",),
            self.print_names(), ("",),
        ))
