"""Two-reflection ghost analysis (beyond the reference).

Every ordered pair (a < b) of index-changing refractive surfaces
creates a ghost path: forward to b, Fresnel-reflect, back to a,
reflect again, then forward to the image.  The ghost path is built as
an *unfolded* System -- the surfaces keep their true geometry, the
double-back is represented by two mirror rows and negative gaps, which
the trace engines already handle (fold-mirror machinery; see
tests/test_more_parity.py).  Focus position and blur are then read off
a small-aperture real-ray trace (paraxial limit of the exact engine),
so conics/aspherics and finite conjugates are respected.

The relative ghost strength is the product of the two Fresnel
(normal-incidence) reflectances.
"""

import numpy as np

from .elements import Spheroid
from .system import System
from .materials import Material


def _index(material, wavelength):
    if material is None:
        return 1.
    if getattr(material, "mirror", False):
        return None
    return float(material.refractive_index(wavelength))


def _fresnel(n0, n1):
    """Normal-incidence intensity reflectance."""
    return ((n0 - n1)/(n0 + n1))**2


def ghost_pairs(system, wavelength=None, reflectances=None):
    """Yield (a, b, reflectance_product) for every surface pair that
    produces a nonzero two-reflection ghost (both surfaces refractive
    with an index step).

    reflectances: optional {surface index: R} overriding the
    normal-incidence Fresnel value -- e.g. measured AR-coating
    residuals (a typical broadband AR is R ~ 0.005 instead of the
    ~0.04 of bare glass)."""
    if wavelength is None:
        wavelength = system.wavelengths[0]
    n = [_index(getattr(e, "material", None), wavelength)
         for e in system]
    refl = {}
    for k in range(1, len(system) - 1):
        if n[k] is None or n[k - 1] is None:
            continue
        r = _fresnel(n[k - 1], n[k])
        if r <= 0:
            # no index step, no interface: an override cannot make a
            # bare aperture reflective
            continue
        if reflectances is not None and k in reflectances:
            r = reflectances[k]
            if hasattr(r, "reflectance"):
                # a coatings.CoatingStack: evaluate at normal
                # incidence for the ghost-strength estimate
                import numpy as _np
                r = float(_np.asarray(r.reflectance(
                    n[k - 1], n[k], 1., wavelength)))
        if r > 0:
            refl[k] = r
    for b in sorted(refl):
        for a in sorted(refl):
            if a < b:
                yield a, b, refl[a]*refl[b]


def _row(e, distance, material, flip=False):
    """A ghost-system surface row copying e's figure.

    flip=True expresses the figure in the pi-rotated local frame that
    TransformMixin assigns to rows with a negative gap (backward
    travel): the sag sign inverts, i.e. curvature and aspheric
    coefficients negate (exactly Spheroid.reverse)."""
    cx = getattr(e, "curvature_x", None)
    kx = getattr(e, "conic_x", None)
    if hasattr(e, "curvature_rotation") or hasattr(
            e, "grating_frequency") or (
            cx is not None and (
                cx != getattr(e, "curvature", 0.)
                or (kx or 0.) != getattr(e, "conic", 0.))):
        raise NotImplementedError(
            "ghost unfolding of anamorphic/grating surfaces "
            "is not supported")
    sgn = -1. if flip else 1.
    return Spheroid(
        curvature=sgn*getattr(e, "curvature", 0.),
        conic=getattr(e, "conic", 0.),
        aspherics=([sgn*a for a in e.aspherics]
                   if getattr(e, "aspherics", None) else None),
        aspherics_odd=([sgn*a for a in e.aspherics_odd]
                       if getattr(e, "aspherics_odd", None) else None),
        radius=e.radius, distance=distance, material=material)


def ghost_system(system, a, b):
    """The unfolded System of the (a, b) two-reflection ghost path:
    object .. b (mirrored), back through b-1 .. a+1, a (mirrored),
    then a+1 .. image as usual.  Negative gaps encode the reversed
    travel; the engines trace them exactly."""
    assert 1 <= a < b < len(system) - 1
    if any(getattr(e, "rotated", False) for e in system):
        raise NotImplementedError(
            "ghost unfolding currently assumes an axial system "
            "(no tilts/decenters)")
    mat = [getattr(e, "material", None) for e in system]
    g = System(description="ghost (%d, %d) of %s"
               % (a, b, system.description))
    g.wavelengths = list(system.wavelengths)
    g.object = system.object
    g.image = system.image
    g.stop = system.stop
    g.append(_row(system[0], 0., mat[0]))
    for k in range(1, b):
        g.append(_row(system[k], system[k].distance, mat[k]))
    g.append(_row(system[b], system[b].distance, "mirror"))
    for k in range(b - 1, a, -1):
        g.append(_row(system[k], -system[k + 1].distance, mat[k - 1],
                      flip=True))
    g.append(_row(system[a], -system[a + 1].distance, "mirror",
                  flip=True))
    for k in range(a + 1, len(system)):
        g.append(_row(system[k], system[k].distance, mat[k]))
    return g


def _marginal_seed(system, eps=1e-4):
    """A near-axis marginal ray (paraxial limit): parallel at
    eps*pupil_radius for infinite conjugates, sloped from the axial
    object point for finite ones."""
    pupil = system.object.pupil
    if getattr(system.object, "finite", False):
        slope = pupil.radius/abs(pupil.distance)
        u = np.array([[0., eps*slope, 1.]])
        u /= np.linalg.norm(u)
        return np.zeros((1, 3)), u
    y = np.array([[0., eps*pupil.radius, 0.]])
    return y, np.array([[0., 0., 1.]])


def ghost_trace(system, a, b, wavelength=None, eps=1e-4):
    """(z_offset, blur) of ghost (a, b): focus position relative to
    the image plane and the marginal-ray blur radius on it, both in
    lens units (linear/paraxial in the aperture)."""
    if wavelength is None:
        wavelength = system.wavelengths[0]
    g = ghost_system(system, a, b)
    y0, u0 = _marginal_seed(system, eps)
    ys, us, iis, ts = g.trace_table(y0, u0, wavelength, clip=False)
    yi = ys[-1, 0, 1]
    ui = us[-1, 0, 1]/us[-1, 0, 2]
    if ui == 0:
        return np.inf, abs(yi)/eps
    return -yi/ui, abs(yi)/eps


def ghost_table(system, wavelength=None, limit=None,
                reflectances=None):
    """Rows (a, b, z_offset, blur, strength) for every ghost pair,
    sorted by hazard (reflectance product / blur area -- small, bright
    ghost foci near the image plane rank first)."""
    if wavelength is None:
        wavelength = system.wavelengths[0]
    rows = []
    for a, b, strength in ghost_pairs(system, wavelength,
                                      reflectances):
        z, blur = ghost_trace(system, a, b, wavelength)
        rows.append((a, b, z, blur, strength))
    rows.sort(key=lambda r: -r[4]/(max(r[3], 1e-12)**2))
    if limit:
        rows = rows[:limit]
    return rows


def ghost_text(system, wavelength=None, limit=10, reflectances=None):
    """Formatted ghost report block."""
    rows = ghost_table(system, wavelength, limit, reflectances)
    out = ["ghost analysis (two-reflection, normal-incidence "
           "reflectances):",
           " %3s %3s %10s %10s %10s" % ("a", "b", "dz", "blur", "R1*R2")]
    for a, b, z, blur, r in rows:
        out.append(" %3d %3d %10.4g %10.4g %10.3g" % (a, b, z, blur, r))
    return "\n".join(out)
