"""Automatic-differentiation aberration expansion.

The classical per-surface Seidel formulas (elements.py:497, reference
elements.py:556-587) exist only for rotationally-symmetric figures;
this module obtains the transverse aberration polynomial of ANY
traceable system -- biconic, toroid, grating, tilted -- by Taylor-
expanding the real ray trace itself: nested `jax.jacfwd` through the
differentiable table engine (ops/geometric.py) gives the exact
derivative tensors of the image-plane intersection with respect to
normalized pupil (px, py) and field (hx, hy) coordinates around the
axial ray.  No aberration theory is hand-derived; the chain rule
through the actual intercept/refraction kernels IS the theory.

Convention notes.  The expansion is taken at the paraxial image
plane with the linear part of the launcher fixed by the paraxial
pupil (distance/radius from System.update).  Third-order transverse
coefficients are invariant under smooth launcher reparameterizations
with the same linear part: a cubic remap of the pupil coordinate
feeds through the pupil->image *linear* map, which vanishes at the
image plane, so only the distortion term (pure h^3) keeps a field-
parameterization convention -- the standard one (fractional object
height / tan of the field angle) is used.  Coefficients are reported
in image-space length units per unit fractional pupil/field, i.e.
directly comparable to real-ray transverse aberrations at full
aperture/field.

TPU note: the expansion evaluates one ray and its forward-mode jet
(4 -> 16 -> 64 tangents to third order; 256 -> 1024 for the optional
fifth-order jets); this is host-scale work on the CPU backend like
the aiming front-end, run EAGERLY through the statically-specialized
unrolled surface graph (nested-jacfwd trace bodies are pathological
for XLA:CPU's compiler in both scan and jitted-unrolled form) while
reusing the exact same surface kernels as the bulk engines.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .ops import geometric as G

__all__ = ["TransverseExpansion", "transverse_expansion",
           "ChromaticExpansion", "chromatic_expansion"]


def _paraxial_seed(system):
    """Marginal/chief launcher constants at the SYSTEM REFERENCE
    wavelength (frozen -- one pupil parameterization for all colors):
    heights at surface 1, slopes before it, and the first gap."""
    from .trace.paraxial import ParaxialTrace

    p = ParaxialTrace(system)
    ym1, yc1 = (float(v) for v in p.y[1])
    sm, sc = (float(v) for v in p.u[0]/p.n[0])
    d1 = float(system[1].distance)
    return ym1, yc1, sm, sc, d1


def _launcher(system, wavelength):
    """A smooth jax function v = (px, py, hx, hy) -> (x, y) at the
    image surface whose linear part is EXACTLY the paraxial marginal/
    chief decomposition: the real seed with pupil coordinate p and
    field h osculates p * marginal + h * chief (heights at surface 1,
    slopes before it, from ParaxialTrace), which is the normalization
    classical Seidel sums assume.  Completing the direction with
    normalize((sx, sy, 1)) adds only cubic input terms, which cannot
    move third-order image-plane coefficients (they ride the
    pupil->image linear map, zero at the image plane)."""
    # paraxial normalization at the system reference wavelength (the
    # classical convention); the traced table is at `wavelength`
    ym1, yc1, sm, sc, d1 = _paraxial_seed(system)
    table = system.table(wavelength)
    from .ops.kernels import specialize
    # the statically-specialized unrolled engine: nested jacfwd of the
    # lax.scan body compiles pathologically slowly on XLA:CPU (~100 s
    # per jet set even on a 3-row system); the specialized unroll
    # builds the same jets ~11x faster with identical tensors
    specs = specialize(table)

    def f(v):
        px, py, hx, hy = v
        sx = px*sm + hx*sc
        sy = py*sm + hy*sc
        x1 = px*ym1 + hx*yc1
        y1 = py*ym1 + hy*yc1
        origin = jnp.stack([x1 - d1*sx, y1 - d1*sy, 0.*px])
        u = jnp.stack([sx, sy, 1. + 0.*px])
        u = u/jnp.linalg.norm(u)
        y, _, _ = G.trace_rays_final(table, origin[None], u[None],
                                     specs=specs, unroll=True)
        return y[0, :2]

    return f


class TransverseExpansion:
    """Taylor tensors of the image-plane transverse ray coordinates.

    j1: (2, 4) linear map; j3: (2, 4, 4, 4) symmetric third-derivative
    tensor.  v-axis order is (px, py, hx, hy).  evaluate(v) applies
    the cubic model; named third-order coefficients come from
    `coefficients` / `seidel_like`.
    """

    _V = "px py hx hy".split()

    def __init__(self, system, wavelength=None, order=3):
        if order not in (3, 5):
            raise ValueError("order must be 3 or 5")
        self.order = order
        self.system = system
        if wavelength is None:
            wavelength = system.wavelengths[0]
        self.wavelength = wavelength
        f = _launcher(system, wavelength)
        v0 = jnp.zeros(len(self._V))
        # ALL jets build eagerly: XLA:CPU compiles nested-jacfwd trace
        # bodies pathologically slowly (the scan form costs ~100 s of
        # compile even on a 3-row system, the jitted unrolled form
        # blows up combinatorially past ~6 rows), while eager
        # forward-mode through the specialized unrolled graph -- the
        # tangents ride one vmapped batch per op -- builds the cubic
        # jets of every zoo system in 4-20 s and the quintic ones in
        # about a minute
        with jax.disable_jit():
            self.offset = np.asarray(f(v0))
            jf = jax.jacfwd(f)
            self.j1 = np.asarray(jf(v0))
            jf = jax.jacfwd(jf)
            self.j2 = np.asarray(jf(v0))
            jf = jax.jacfwd(jf)
            self.j3 = np.asarray(jf(v0))
            if order >= 5:
                jf = jax.jacfwd(jf)
                self.j4 = np.asarray(jf(v0))
                self.j5 = np.asarray(jax.jacfwd(jf)(v0))

    def _jets(self):
        """(degree, tensor, 1/degree!) of every computed jet."""
        from math import factorial
        for d in range(2, self.order + 1):
            j = getattr(self, "j%d" % d, None)
            if j is not None:
                yield d, j, 1./factorial(d)

    def evaluate(self, v):
        """Model transverse coordinates at v = (px, py, hx, hy)
        (absolute, including the linear/gaussian part)."""
        v = np.asarray(v, float)
        return self.offset + self.j1 @ v + self.aberration(v)

    def aberration(self, v):
        """Model transverse ABERRATION (gaussian part removed):
        all computed jets (cubic for order=3, quintic for order=5)."""
        v = np.asarray(v, float)
        out = np.zeros(2)
        for d, j, w in self._jets():
            for _ in range(d):
                j = j @ v
            out = out + w*j
        return out

    def coefficient(self, comp, *axes):
        """Monomial coefficient of the degree-len(axes) aberration
        term: coefficient('y', 'py', 'py', 'hy') is the py^2 hy term
        of the y-aberration (the multinomial weight is included, so
        evaluate() equals the sum of coefficient * monomial).
        Degrees 2..order are available."""
        i = {"x": 0, "y": 1}[comp]
        ia = [self._V.index(ax) for ax in axes]
        from math import factorial
        from collections import Counter
        deg = len(axes)
        jet = getattr(self, "j%d" % deg)
        mult = factorial(deg)
        for n in Counter(ia).values():
            mult //= factorial(n)
        return jet[(i, *ia)]*mult/factorial(deg)

    def coefficients(self, degree=3):
        """All distinct degree-`degree` monomial coefficients >=
        1e-14 of both components, {('y', ('py','py','hy')): value,
        ...}."""
        import itertools
        out = {}
        for comp in "xy":
            for axes in itertools.combinations_with_replacement(
                    self._V, degree):
                c = self.coefficient(comp, *axes)
                if abs(c) > 1e-14:
                    out[(comp, axes)] = c
        return out

    def seidel_like(self):
        """Named third-order sums for a meridionally-symmetric system
        (field along y), transverse measure at full aperture/field:

        spherical: marginal-ray aberration, py^3 term.
        coma_sagittal / coma_tangential: px^2 hy and py^2 hy terms.
        astigmatism: tangential minus sagittal field focus split,
            (c_y[py hy^2] - c_x[px hy^2]).
        sagittal_field_curv: c_x[px hy^2] (sagittal defocus slope).
        distortion: pure hy^3 term.

        For anamorphic systems the x/y entries differ; use
        coefficients() for the full table.
        """
        c = self.coefficient
        return {
            "spherical": c("y", "py", "py", "py"),
            "coma_sagittal": c("y", "px", "px", "hy"),
            "coma_tangential": c("y", "py", "py", "hy"),
            "astigmatism": (c("y", "py", "hy", "hy")
                            - c("x", "px", "hy", "hy")),
            "sagittal_field_curv": c("x", "px", "hy", "hy"),
            "tangential_field_curv": c("y", "py", "hy", "hy"),
            "distortion": c("y", "hy", "hy", "hy"),
            "spherical_x": c("x", "px", "px", "px"),
        }

    def fifth_order(self):
        """Named fifth-order sums (meridional symmetry, field along
        y), transverse measure at full aperture/field -- the analog
        of the Buchdahl/poly-trace mu set for ANY traceable figure.
        Requires order=5."""
        c = self.coefficient
        return {
            "spherical5": c("y", *["py"]*5),
            "coma5_tangential": c("y", "py", "py", "py", "py", "hy"),
            "coma5_sagittal": c("y", "px", "px", "px", "px", "hy"),
            "oblique_spherical": c("y", "py", "py", "py", "hy", "hy"),
            "elliptical_coma": c("y", "py", "py", "hy", "hy", "hy"),
            "astigmatism5": (c("y", "py", *["hy"]*4)
                             - c("x", "px", *["hy"]*4)),
            "field_curv5_sagittal": c("x", "px", *["hy"]*4),
            "distortion5": c("y", *["hy"]*5),
        }

    def text(self):
        yield ("AD transverse third-order expansion "
               "(image units, full aperture/field)")
        for name, val in self.seidel_like().items():
            yield "  %-22s % .6e" % (name, val)
        extra = {k: v for k, v in self.coefficients().items()
                 if abs(v) > 1e-12}
        yield "  %d nonzero third-order monomials" % len(extra)
        if self.order >= 5:
            yield "AD fifth-order terms:"
            for name, val in self.fifth_order().items():
                yield "  %-22s % .6e" % (name, val)


class ChromaticExpansion:
    """Chromatic aberration expansion of the real ray trace.

    The pupil/field jets are pure AD (TransverseExpansion); their
    wavelength dependence is taken by a five-point central stencil
    over the trace wavelength with the launcher normalization FROZEN
    at the reference wavelength (the classical convention: one pupil
    parameterization, many colors).  Sampling the whole jet tensors
    reuses the single compiled monochromatic program per wavelength --
    dispersion formulas are host-side numpy (materials.py), so an
    outer stencil loses nothing over differentiating through them,
    and every wavelength-baked table entry (indices, mu, the grating
    `grating_dy` term, thermal models) is captured exactly.

    The classical paraxial chromatic sums (elements.py:531, reference
    elements.py:584) are first-order in the endpoint index difference
    and exist only for rotationally-symmetric refracting surfaces;
    this expansion handles anamorphics, gratings, tilted systems, and
    yields the chromatic variation of every third-order coefficient
    (sphero-chromatism et al.) -- cross terms Seidel theory stops
    short of.

    w is the normalized chromatic coordinate: lambda = lambda0 +
    w*bandwidth, w = +-1 at the band edges (`bandwidth` defaults to
    half the system's wavelength span).  d1_*/d2_* are d/dw and
    d^2/dw^2 of offset/j1/j2/j3 at w=0; the gaussian terms
    (offset/j1) additionally carry d3_* for the band-edge cubic.
    """

    _H = 0.05           # stencil step in w units (lambda shifts of
    #                     ~h*bandwidth: tiny vs dispersion scales, far
    #                     above the ~1e-12 jet noise floor)

    def __init__(self, system, wavelength=None, bandwidth=None):
        self.system = system
        if wavelength is None:
            wavelength = system.wavelengths[0]
        self.wavelength = wavelength
        if bandwidth is None:
            wls = system.wavelengths
            span = (max(wls) - min(wls))/2.
            bandwidth = span if span > 0 else wavelength/50.
        self.bandwidth = bandwidth
        h = self._H
        E = [TransverseExpansion(system, wavelength + i*h*bandwidth)
             for i in (-2, -1, 0, 1, 2)]
        self.base = E[2]
        for name in ("offset", "j1", "j2", "j3"):
            t = [getattr(e, name) for e in E]
            d1 = (t[0] - 8*t[1] + 8*t[3] - t[4])/(12*h)
            d2 = (-t[0] + 16*t[1] - 30*t[2] + 16*t[3] - t[4])/(12*h**2)
            setattr(self, "d1_" + name, d1)
            setattr(self, "d2_" + name, d2)
        for name in ("offset", "j1"):
            # cubic-in-w gaussian terms: glass dispersion is strongly
            # nonlinear over a full visible band, so the band-edge
            # axial/lateral color needs the w^3 term
            t = [getattr(e, name) for e in E]
            d3 = (-t[0] + 2*t[1] - 2*t[3] + t[4])/(2*h**3)
            setattr(self, "d3_" + name, d3)

    def evaluate(self, v, w):
        """Transverse image coordinates of the cubic-in-(pupil,field)
        model at v = (px, py, hx, hy), lambda = lambda0 +
        w*bandwidth: quadratic in w for the aberration jets, cubic in
        w for the gaussian (offset/j1) terms -- glass dispersion is
        strongly nonlinear over a full visible band."""
        v = np.asarray(v, float)
        out = np.zeros(2)
        for dw, fac in ((0, 1.), (1, w), (2, w*w/2.), (3, w**3/6.)):
            pre = "" if dw == 0 else "d%d_" % dw
            src = self.base if dw == 0 else self
            off = getattr(src, pre + "offset")
            j1 = getattr(src, pre + "j1")
            j2 = getattr(src, pre + "j2", None)
            j3 = getattr(src, pre + "j3", None)
            out = out + fac*(off + j1 @ v)
            if j2 is not None:
                out = out + fac*(
                    np.einsum("iab,a,b->i", j2, v, v)/2.
                    + np.einsum("iabc,a,b,c->i", j3, v, v, v)/6.)
        return out

    def _named(self, j3, j1=None, offset=None):
        ix = TransverseExpansion._V.index
        ipx, ipy, ihx, ihy = (ix(a) for a in ("px", "py", "hx", "hy"))
        out = {}
        if offset is not None:
            out["dispersion_x"] = offset[0]
            out["dispersion"] = offset[1]
        if j1 is not None:
            out["axial_color"] = j1[1, ipy]
            out["lateral_color"] = j1[1, ihy]
            out["axial_color_x"] = j1[0, ipx]
            out["lateral_color_x"] = j1[0, ihx]
        out.update(
            spherochromatism=j3[1, ipy, ipy, ipy]/6.,
            coma_chromatic=j3[1, ipy, ipy, ihy]/2.,
            astigmatism_chromatic=(j3[1, ipy, ihy, ihy]/2.
                                   - j3[0, ipx, ihy, ihy]/2.),
            field_curv_chromatic=j3[0, ipx, ihy, ihy]/2.,
            distortion_chromatic=j3[1, ihy, ihy, ihy]/6.,
        )
        return out

    def chromatic(self):
        """Named chromatic coefficients, transverse image units at
        full aperture/field per unit w (multiply by the band-edge
        separation in w, e.g. 2, for edge-to-edge F-to-C values):

        dispersion: image shift of the reference ray with w (the
            spectrometer dispersion; zero without gratings/tilts).
        axial_color / lateral_color: the classical PAC/PLC analogs
            (d/dw of the linear pupil/field response).
        *_2nd: the quadratic-in-w (secondary-spectrum) parts.
        spherochromatism / coma_chromatic / astigmatism_chromatic /
        field_curv_chromatic / distortion_chromatic: d/dw of the
            named third-order coefficients.
        """
        out = self._named(self.d1_j3, self.d1_j1, self.d1_offset)
        ix = TransverseExpansion._V.index
        out["axial_color_2nd"] = self.d2_j1[1, ix("py")]/2.
        out["lateral_color_2nd"] = self.d2_j1[1, ix("hy")]/2.
        out["dispersion_2nd"] = self.d2_offset[1]/2.
        out["axial_color_3rd"] = self.d3_j1[1, ix("py")]/6.
        out["lateral_color_3rd"] = self.d3_j1[1, ix("hy")]/6.
        return out

    def text(self):
        yield ("AD chromatic expansion (image units, full "
               "aperture/field, per w; w = +-1 at lambda0 +- %.1f nm)"
               % (self.bandwidth*1e9))
        for name, val in self.chromatic().items():
            yield "  %-24s % .6e" % (name, val)


def transverse_expansion(system, wavelength=None, order=3):
    """AD Taylor expansion of `system`'s real-ray transverse image
    coordinates to third (or fifth, order=5) order in pupil and
    field.  See TransverseExpansion."""
    return TransverseExpansion(system, wavelength, order=order)


def chromatic_expansion(system, wavelength=None, bandwidth=None):
    """AD chromatic aberration expansion (axial/lateral color,
    secondary spectrum, sphero-chromatism) of `system`'s real ray
    trace, valid for any traceable figure incl. gratings.  See
    ChromaticExpansion."""
    return ChromaticExpansion(system, wavelength, bandwidth)
