"""Thermal analysis: re-derive a System at a different temperature
(beyond the reference, which carries the Schott dn/dT model --
reference material.py:54 -- but never applies it system-wide).

Two effects are modeled:

* index change: materials with a `Thermal` record get
  dn_thermal(t, n, wavelength) added to every refractive index
  (the Schott D/E polynomial, relative to the material's tref);
* expansion: every length of a glass element (thickness, radius of
  curvature, aperture, aspheric figure) scales with its glass CTE,
  air gaps with the housing CTE, exactly like Element.rescale.

Air-index pressure/temperature dependence (Kohlrausch) is not
modeled; indices in catalogs are relative to air at the reference
conditions, which is the dominant convention for these catalogs.
"""

import copy

import numpy as np

from .materials import Material


#: default CTEs (1/K) when the material record carries none
GLASS_TCE = 7e-6
HOUSING_TCE = 23.6e-6   # aluminium


class ThermalMaterial(Material):
    """A material whose refractive index is shifted to temperature t
    via the base material's Thermal record (delegates everything
    else)."""

    _type = "thermal-adjusted"

    def __init__(self, base, t):
        self.base = base
        self.t = t
        self.name = getattr(base, "name", "-")
        self.catalog = getattr(base, "catalog", None)
        self.solid = base.solid
        self.mirror = base.mirror
        self.thermal = base.thermal

    def refractive_index(self, wavelength):
        n = self.base.refractive_index(wavelength)
        if self.thermal is not None:
            n = n + self.thermal.dn_thermal(self.t, n, wavelength)
        return n

    def delta_n(self, lmin, lmax):
        return (self.refractive_index(lmin)
                - self.refractive_index(lmax))

    def dict(self):
        return self.base.dict()

    def __str__(self):
        return "%s@%gC" % (self.base, self.t)


def material_tce(material, default=GLASS_TCE):
    """CTE of a glass in 1/K: the AGF ED record stores alpha(-30..70)
    in 1e-6/K (kept as `alpham3070` by the importer)."""
    alpha = getattr(material, "alpham3070", None)
    if alpha is None or not np.isfinite(alpha):
        return default
    return float(alpha)*1e-6


def at_temperature(system, t, tref=20., housing_tce=HOUSING_TCE,
                   default_glass_tce=GLASS_TCE):
    """A deep-copied System re-derived at temperature t (degC).

    Each element's figure scales with the CTE of the medium that
    precedes it (glass thicknesses grow with the glass, air gaps with
    the housing); materials with thermal data get their dn/dT shift.
    Update/trace the returned system as usual.
    """
    s = copy.deepcopy(system)
    dt = t - tref
    prev_mat = None
    for e in s:
        mat = getattr(e, "material", None)
        # the gap *before* e lies in the previous medium
        if prev_mat is not None and getattr(prev_mat, "solid", False) \
                and not getattr(prev_mat, "mirror", False):
            alpha = material_tce(prev_mat, default_glass_tce)
        else:
            alpha = housing_tce
        grow = 1. + alpha*dt
        d = e.distance
        # rescale handles curvature/aspherics/radius; it also scales
        # the distance, so feed it the gap's own growth first
        e.distance = d*grow
        own_alpha = (material_tce(mat, default_glass_tce)
                     if mat is not None and mat.solid and
                     not mat.mirror else housing_tce)
        figure_grow = 1. + own_alpha*dt
        dist = e.distance
        e.rescale(figure_grow)
        e.distance = dist  # figure scales with its own glass; the
        # axial gap was already grown with the preceding medium
        if mat is not None and getattr(mat, "thermal", None) is not None:
            e.material = ThermalMaterial(mat, t)
        # bare (None) and mirror rows leave the surrounding medium
        # unchanged (a stop plane inside a glass block, a Mangin
        # mirror's return pass) -- same propagation as thermal_model
        prev_mat = (prev_mat if mat is None
                    or getattr(mat, "mirror", False) else mat)
    return s


def thermal_model(system, t, tref=20., wavelength=None,
                  housing_tce=HOUSING_TCE,
                  default_glass_tce=GLASS_TCE):
    """Per-surface thermal arrays for `heat_table`: gap CTE (the
    medium before each surface), figure CTE (the element's own
    glass), and the exact index shifts at temperature t for the media
    before/after each surface.  Host-side; arrays are constants of
    the differentiable transform."""
    if wavelength is None:
        wavelength = system.wavelengths[0]
    s = len(system)
    alpha_gap = np.full(s, housing_tce)
    alpha_elem = np.full(s, housing_tce)
    dn_before = np.zeros(s)
    dn_after = np.zeros(s)
    prev_mat = None
    for j, e in enumerate(system):
        mat = getattr(e, "material", None)
        if prev_mat is not None and getattr(prev_mat, "solid", False) \
                and not getattr(prev_mat, "mirror", False):
            alpha_gap[j] = material_tce(prev_mat, default_glass_tce)
        if mat is not None and mat.solid and not mat.mirror:
            alpha_elem[j] = material_tce(mat, default_glass_tce)

        def shift(m):
            if m is None or getattr(m, "thermal", None) is None \
                    or getattr(m, "mirror", False):
                return 0.
            n = m.refractive_index(wavelength)
            return float(m.thermal.dn_thermal(t, n, wavelength))
        dn_before[j] = shift(prev_mat)
        # bare (None) and mirror rows leave the medium unchanged
        eff_after = (prev_mat if mat is None
                     or getattr(mat, "mirror", False) else mat)
        dn_after[j] = shift(eff_after)
        prev_mat = eff_after
    return alpha_gap, alpha_elem, dn_before, dn_after


def heat_table(table, dt, alpha_gap, alpha_elem, dn_before,
               dn_after):
    """Differentiable thermal transform of a SurfaceTable: gaps grow
    with their medium's CTE, figures (curvature, aspherics, aperture)
    with the element's glass, indices shift by the given per-surface
    deltas, and the refraction ratios are rebuilt.  Pure jnp over the
    table pytree, so `jax.grad` flows through it -- the basis for
    athermalization merits.  Mirrors keep mu = -1."""
    import jax.numpy as jnp
    gap_grow = 1. + alpha_gap*dt
    fig_grow = 1. + alpha_elem*dt
    curvature = table.curvature/fig_grow
    conic = table.conic
    k_even = jnp.arange(table.aspherics.shape[1])
    aspherics = table.aspherics/fig_grow[:, None]**(2*k_even + 1)
    k_odd = jnp.arange(table.aspherics_odd.shape[1])
    aspherics_odd = table.aspherics_odd/fig_grow[:, None]**(2*k_odd)
    offset = table.offset*gap_grow[:, None]
    distance = table.distance*gap_grow
    radius = table.radius*fig_grow
    n_before = table.n_before + dn_before
    n_after = table.n_after + dn_after
    mirror = table.mu == -1.
    mu = jnp.where(mirror, -1., n_before/n_after)
    extra = {}
    # extended-vocabulary columns scale with the figure too:
    # anamorphic curvature split like a curvature, the grating term
    # with the (stretching) line spacing, the diffractive kick
    # potential with its r**(2i+2) powers
    if getattr(table, "curvature_dx", None) is not None:
        extra["curvature_dx"] = table.curvature_dx/fig_grow
    if getattr(table, "grating_dy", None) is not None:
        extra["grating_dy"] = table.grating_dy/fig_grow
    doe = getattr(table, "doe", None)
    if doe is not None and doe.shape[1]:
        k_doe = jnp.arange(doe.shape[1])
        extra["doe"] = doe/fig_grow[:, None]**(2*k_doe + 2)
    xyp = getattr(table, "xy_poly", None)
    if xyp is not None and xyp.shape[1]:
        # a monomial coefficient of total degree d carries units
        # length**(1-d): under homothety it scales as g**(1-d)
        from .ops.kernels import _xy_terms, xy_degree
        degs = jnp.asarray([i + j for i, j in _xy_terms(
            xy_degree(xyp.shape[1]))])
        extra["xy_poly"] = xyp/fig_grow[:, None]**(degs - 1)
    return table.replace(
        curvature=curvature, conic=conic, aspherics=aspherics,
        aspherics_odd=aspherics_odd, offset=offset,
        distance=distance, radius=radius, n_before=n_before,
        n_after=n_after, mu=mu, **extra)


def thermal_defocus(system, temps, wavelength=None):
    """Paraxial defocus (image-side focal point minus the image
    plane, both in the heated system) per temperature.  Differences
    across the returned array are the thermally-induced focus drift;
    the value at tref is the design's own nominal defocus."""
    from .trace.paraxial import ParaxialTrace
    if wavelength is None:
        wavelength = system.wavelengths[0]
    shifts = []
    for t in np.atleast_1d(temps):
        st = at_temperature(system, t)
        st.update()
        p = ParaxialTrace(st)
        shifts.append(p.focal_distance[1] - st[-1].distance)
    return np.atleast_1d(temps), np.asarray(shifts)


def thermal_text(system, temps=(0., 20., 40., 60.)):
    """Formatted thermal report: EFL and focus shift per temperature."""
    from .trace.paraxial import ParaxialTrace
    out = ["thermal analysis (glass CTE from catalog data, "
           "housing %.3g/K):" % HOUSING_TCE,
           " %8s %12s %12s" % ("T (C)", "EFL", "focus shift")]
    base = None
    for t in temps:
        st = at_temperature(system, t)
        st.update()
        p = ParaxialTrace(st)
        bfd = p.focal_distance[1]
        if base is None:
            base = bfd
        out.append(" %8g %12.6g %12.4g"
                   % (t, p.focal_length[1], bfd - base))
    return "\n".join(out)
