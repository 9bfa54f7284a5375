"""PolyTrace: aberration-polynomial trace to arbitrary order.

After T. B. Andersen, Appl. Opt. 19, 3800 (1980), with the
finite-object / telecentric extensions of Bociort, Andersen, Beckmann,
Appl. Opt. 47, 5691 (2008).  Behavioral parity with reference
poly_trace.py:33-216 and the per-element updates of reference
elements.py:238-252, 383-408, 589-620; the jittable/differentiable
twin lives in rayopt_tpu.ops.poly_jax.

The polynomial state is a namedtuple of truncated multinomials in the
three rotational invariants (r, p, k); coefficient extraction
(Seidel s1..s5, the twelve 5th-order mu terms, Buchdahl names) is
table-driven.
"""

import itertools
from collections import namedtuple

import numpy as np

from ..ops.simplex import make_simplex
from .base import Trace

PolyState = namedtuple("PolyState", "f n r p k s t v w o")

#: Seidel & 5th-order coefficients as weighted sums of s/t entries
#: (reference poly_trace.py:150-156)
SEIDEL_COMBOS = (
    ("s1", (("s", 1, 1),)),
    ("s2", (("t", 1, -1),)),
    ("s3", (("t", 3, .5),)),
    ("s4", (("s", 2, 1), ("t", 3, -.5))),
    ("s5", (("t", 2, -1),)),
    ("m1", (("s", 4, 1),)),
    ("m2", (("t", 4, -1), ("s", 6, -.5))),
    ("m3", (("s", 6, -.5),)),
    ("m4", (("t", 6, 1), ("s", 5, 1))),
    ("m5", (("s", 5, 1),)),
    ("m6", (("s", 9, 1),)),
    ("m7", (("t", 5, -1), ("t", 9, -.5), ("s", 8, -.5))),
    ("m8", (("t", 9, -.5), ("s", 8, -.5))),
    ("m9", (("s", 8, .5),)),
    ("m10", (("s", 7, 1), ("t", 8, 1))),
    ("m11", (("s", 7, 1),)),
    ("m12", (("t", 7, -1),)),
)

#: Buchdahl-style names; indices 0,1,3,4,6,8 flip sign
#: (reference poly_trace.py:140-148)
BUCHDAHL_NAMES = "Ap Cp Bp S1p S3p S2p S6p S5p S4p".split()
BUCHDAHL_FLIP = (0, 1, 3, 4, 6, 8)

#: human-readable names of the first s/t coefficient pairs
#: (reference poly_trace.py:162-175)
COEFF_NAMES = (
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
)


# -- per-element polynomial updates ---------------------------------------

def transfer_poly(element, state):
    """Free transfer to the next vertex (reference elements.py:238)."""
    fd = (-state.f).shift(element.offset[2])
    fdp = fd*state.p
    return fd, state.r + fd*(2*state.k + fdp), state.k + fdp


def intercept_poly_plane(S, r, p, k):
    """Reference-plane intercept (reference elements.py:245)."""
    return r, S(), S(), S().shift(1)


def intercept_poly_spheroid(element, S, r, p, k):
    """Conic + aspheric intercept in simplex algebra
    (reference elements.py:589-620, Andersen eqs 44-47 plus the
    aspheric fixed-point iteration of eq 28)."""
    if getattr(element, "aspherics_odd", None):
        raise NotImplementedError(
            "odd aspherics (|r| powers) are not analytic at the axis "
            "and cannot be represented in the aberration-polynomial "
            "basis; use the geometric trace")
    if (getattr(element, "curvature_x", element.curvature)
            != element.curvature or
            getattr(element, "conic_x", element.conic)
            != element.conic or
            hasattr(element, "curvature_rotation") or
            getattr(element, "grating_frequency", 0.)):
        raise NotImplementedError(
            "anamorphic (biconic) surfaces break the rotational "
            "symmetry of the aberration-polynomial basis; use the "
            "geometric trace")
    if getattr(element, "phase_coefficients", None):
        raise NotImplementedError(
            "diffractive (binary2) kicks are not implemented in the "
            "aberration-polynomial basis; use transverse_expansion "
            "(AD jets) or the geometric trace")
    if np.any(np.asarray(getattr(element, "_xy_arr", ())) != 0):
        raise NotImplementedError(
            "freeform (XY-polynomial / Zernike-sag) figures break "
            "the rotational symmetry of the aberration-polynomial "
            "basis; use transverse_expansion (AD jets) or the "
            "geometric trace")
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
        sgn = np.sign(element.offset[2])
        asp = element.aspherics
        r0 = r
        for _ in asp:                     # fixed-point iterations (28)
            df = S()
            for coeff in reversed(asp):
                df = df.shift(coeff*sgn)*r
            r = r0 + df*(2*k + df*p)
        dfr = S()
        for i in reversed(range(len(asp))):
            dfr = (dfr*r).shift((i + 1)*asp[i]*sgn)
        f += df
        fr += dfr
        g = (4*r*dfr*dfr).shift(1)**-.5
    return r, f, fr, g


def propagate_poly_element(element, state, wavelength):
    """One surface of the Andersen recursion
    (reference elements.py:383-408, eqs 30-40 and 57)."""
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

    r_new = state.r + a*(2*state.k + ap)              # (35)
    s_new = state.s + a*state.v                       # (39)
    t_new = state.t + a*state.w
    return PolyState(
        f=f, n=n,
        r=r_new,
        p=(n1i*n1i).shift(-1),                        # (40)
        k=b*r_new + c*(state.k + ap),
        s=s_new,
        t=t_new,
        v=b*s_new + c*state.v,
        w=b*t_new + c*state.w,
        o=state.o + state.n*a*p1**.5,                 # (57)
    )


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
        self.n = np.empty(self.length)
        self.stvwof = np.empty((self.length, 6, self.Simplex.q))

    def telecentric(self):
        obj = self.system.object
        if not obj.finite:
            return False
        if obj.pupil.telecentric:
            return True
        return abs(obj.pupil.slope) > abs(obj.slope)

    def rays(self):
        """Seed the polynomial state (reference poly_trace.py:72):
        r, p, k are the three invariants, s/w start at unity."""
        self.n[0] = self.system.refractive_index(self.l, 0)
        pos = (0 if self.telecentric()
               else self.system.object.pupil.distance)
        S = self.Simplex
        state = PolyState(
            f=S().shift(pos), n=self.n[0],
            r=S(), p=S(), k=S(),
            s=S().shift(1), t=S(), v=S(), w=S().shift(1), o=S())
        state.r[1], state.p[2], state.k[3] = 1, 1, 1
        self._state = state

    def _store(self, j, state):
        self.stvwof[j] = (state.s, state.t, state.v, state.w,
                          state.o, state.f)
        self.n[j] = state.n

    def propagate(self, start=1, stop=None):
        super().propagate()
        self._store(start - 1, self._state)
        for j, state in enumerate(self.system.propagate_poly(
                self._state, self.l, start, stop)):
            self._store(start + j, state)

    def transform(self, i=-1):
        """Convert to field/pupil-normalized coordinates
        (reference poly_trace.py:97)."""
        assert self.system.object.finite
        obj = self.system.object
        r, a, c = obj.pupil.radius, obj.pupil.slope, obj.slope
        telecentric = abs(a) > abs(c)
        if telecentric:
            r = -obj.radius
            a, c = c, a
        # fast path: the transform matrix [[r^2,0,0],[a^2,c^2,2ac],
        # [ra,0,rc]] has closed-form expansion coefficients
        # (reference simplex_accel.pyx:185 finite_object_fast)
        from ..ops.simplex import finite_object_table, finite_object_np
        tab = finite_object_table(self.Simplex.d, self.Simplex.n)
        bst = finite_object_np(tab, r, -a, -c,
                               np.asarray(self.stvwof[i, 0]),
                               np.asarray(self.stvwof[i, 1]))
        if telecentric:
            ii, jj, kk = self.Simplex.j.T
            perm = self.Simplex.i[jj, ii, kk]
            bst = bst[::-1, perm].copy()
        return (bst[0].view(self.Simplex),
                bst[1].view(self.Simplex))

    def st(self, i=-1):
        if self.system.object.finite:
            return self.bst if i == -1 else self.transform(i)
        s, t = self.stvwof[i, :2, :]
        return s.view(self.Simplex), t.view(self.Simplex)

    def evaluate(self, xy, ab, i=-1):
        """Transverse aberration at one-normalized field xy and pupil
        ab coordinates (reference poly_trace.py:125)."""
        xy, ab = np.atleast_2d(xy, ab)
        xy, ab = np.broadcast_arrays(xy, ab)
        if not self.system.object.finite:
            xy = xy*self.system.object.pupil.radius
            ab = ab*self.system.object.angle
        invariants = ((xy**2).sum(1), (ab**2).sum(1),
                      (xy*ab).sum(1))
        s, t = self.st(i)
        return (s(*invariants)[..., None]*xy +
                t(*invariants)[..., None]*ab)

    # -- coefficient extraction (table-driven) ---------------------------

    def seidel(self, s, t):
        """s1..s5 plus the twelve 5th-order mu coefficients."""
        st = {"s": s, "t": t}
        return [(name, sum(w*st[which][idx]
                           for which, idx, w in combo))
                for name, combo in SEIDEL_COMBOS]

    def buchdahl(self, s, t):
        names = BUCHDAHL_NAMES + ["_" + n for n in BUCHDAHL_NAMES]
        vals = list(s[1:10]) + list(-t[1:10])
        for i in BUCHDAHL_FLIP:
            vals[i] *= -1
            vals[i + 9] *= -1
        return list(zip(names, vals))

    # -- output ------------------------------------------------------------

    def print_seidel(self):
        for name, value in self.seidel(*self.st()):
            yield f"{name:3s}: {value:12.5e}"

    def print_names(self):
        s, t = self.st()
        for (ns, nt), si, ti, (i, j, k) in zip(COEFF_NAMES, s[1:],
                                               t[1:],
                                               self.Simplex.j[1:]):
            order = self.Simplex.i[i, j, k]
            yield "s{:1d}{:1d}{:1d}{:1d}: {:37s}: {:12.5e}".format(
                order, i, j, k, ns, si)
            yield "t{:1d}{:1d}{:1d}{:1d}: {:37s}: {:12.5e}".format(
                order, i, j, k, nt, ti)

    def print_params(self):
        yield f"maximum order: {self.Simplex.n:d}"
        yield "wavelength: {:g}".format(self.l/1e-9)

    def print_trace(self, components="stvwof", elements=None,
                    cutoff=None, width=12):
        for comp in components:
            block = self.stvwof[:, "stvwof".index(comp), :].T
            cols = (range(1, block.shape[1]) if elements is None
                    else elements)
            rows = (slice(None) if cutoff is None
                    else self.Simplex.j.sum(1) < cutoff)
            yield comp.upper()
            yield "  n  i  j  k " + " ".join(
                f"{c:12d}" for c in cols)
            for (i, j, k), vals in zip(self.Simplex.j[rows],
                                       block[rows][:, list(cols)]):
                tag = "{:3d}{:3d}{:3d}{:3d}".format(
                    self.Simplex.i[i, j, k], i, j, k)
                yield tag + " " + " ".join(
                    f"{v:12.5e}" for v in vals)
            yield ""

    def __str__(self):
        return "\n".join(itertools.chain(
            self.print_params(), ("",),
            self.print_seidel(), ("",),
            self.print_names(), ("",),
        ))
