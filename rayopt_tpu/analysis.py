"""Aberration analysis report.

Produces the same report as the reference Analysis class
(reference analysis.py:40-410): system/paraxial text, a layout plot
with clipping rays, transverse ray fans, through-focus spot diagrams,
wavefront panels (OPD contours, PSF, encircled energy, MTF), and
longitudinal field curves.

Organization differs from the reference: each report panel is a
module-level function over (system, axes); the `Analysis` class is a
thin driver that owns flags, text, and figures.  Matplotlib stays at
the edge; all ray work runs on the jitted engines.
"""

import numpy as np

from .trace.geometric import GeometricTrace
from .trace.gaussian import GaussianTrace
from .utils.math import tanarcsin
from .utils.special_sums import polar_sum

COLORS = "grbcmyk"


# -- axis cosmetics ----------------------------------------------------

def _style_axes(ax, xlabel=None, ylabel=None, title=None, xzero=True,
                yzero=True):
    import matplotlib as mpl

    class _Fmt(mpl.ticker.ScalarFormatter):
        def __call__(self, value, pos=None):
            return "" if value == 0 else super().__call__(value, pos)

    for side in ("right", "top"):
        ax.spines[side].set_visible(False)
    if yzero:
        ax.spines["left"].set_position("zero")
        ax.yaxis.set_major_formatter(_Fmt())
    if xzero:
        ax.spines["bottom"].set_position("zero")
        ax.xaxis.set_major_formatter(_Fmt())
    ax.tick_params(bottom=True, top=False, left=True, right=False,
                   labeltop=False, labelright=False, labelleft=True,
                   labelbottom=True, direction="out", axis="both")
    ax.locator_params(tight=True, nbins=5)
    if xlabel:
        ax.set_xlabel(xlabel, horizontalalignment="right",
                      verticalalignment="bottom", rotation="horizontal")
    if ylabel:
        ax.set_ylabel(ylabel, horizontalalignment="left",
                      verticalalignment="top", rotation="horizontal")
    if title:
        ax.set_title(title)


def _finish_axes(ax):
    ax.relim()
    xl, xu = ax.get_xlim()
    yl, yu = ax.get_ylim()
    if ax.spines["left"].get_position() == "zero":
        xl = 0
    if ax.spines["bottom"].get_position() == "zero":
        yl = 0
    ax.xaxis.set_label_coords(xu, yl, transform=ax.transData)
    ax.yaxis.set_label_coords(xl, yu, transform=ax.transData)


def _xy_axes(ax, **kwargs):
    _style_axes(ax, **kwargs)
    ax.set_aspect("equal")
    ax.spines["left"].set_visible(False)
    ax.spines["bottom"].set_visible(False)
    ax.tick_params(bottom=False, left=False, labelbottom=False,
                   labelleft=False)


def _fan_grid(fig, nrows):
    """Fan-plot axes grid: one (meridional | sag-x | sag-y) row per
    field height, shared scales."""
    from matplotlib import gridspec
    gs = gridspec.GridSpec(nrows, 4)
    shared = {"px": None, "py": None, "e": None}
    rows = []
    for i in range(nrows):
        axm = fig.add_subplot(gs.new_subplotspec((i, 0), 1, 2),
                              sharex=shared["py"], sharey=shared["e"])
        shared["py"] = shared["py"] or axm
        shared["e"] = shared["e"] or axm
        axsm = fig.add_subplot(gs.new_subplotspec((i, 2), 1, 1),
                               sharex=shared["px"], sharey=shared["e"])
        shared["px"] = shared["px"] or axsm
        axss = fig.add_subplot(gs.new_subplotspec((i, 3), 1, 1),
                               sharex=shared["px"], sharey=shared["e"])
        for axi, xl, yl in ((axm, "PY", "EY"), (axsm, "PX", "EY"),
                            (axss, "PX", "EX")):
            _style_axes(axi, xl, yl)
        rows.append((axm, axsm, axss))
    return rows[::-1]


def _label_row(ax, text, vertical=True):
    if vertical:
        ax.text(-.1, .5, text, rotation="vertical",
                transform=ax.transAxes, verticalalignment="center")
    else:
        ax.text(.5, -.1, text, transform=ax.transAxes,
                horizontalalignment="center")


# -- report panels ------------------------------------------------------

def plot_transverse_fans(system, fig, heights=(0., .707, 1.),
                         wavelengths=None, nrays=152, colors=COLORS):
    """Transverse aberration fans: image error vs entrance-pupil
    coordinate, per field and wavelength (reference analysis.py:219)."""
    if wavelengths is None:
        wavelengths = system.wavelengths
    rows = _fan_grid(fig, len(heights))
    pd = system.object.pupil.distance
    for hi, (axm, axsm, axss) in zip(heights, rows):
        _label_row(axm, "OY=%s" % hi)
        for wi, ci in zip(wavelengths, colors):
            t = GeometricTrace(system)
            t.rays_point((0, hi), wi, nrays=nrays,
                         distribution="tee", clip=True)
            err = t.y[-1, :, :2] - t.y[-1, t.ref, :2]
            pup = t.y[0, :, :2] + pd*tanarcsin(t.u[0])
            pup -= pup[t.ref]
            axm.plot(pup[:t.ref, 1], err[:t.ref, 1], "-" + ci,
                     label="%s" % wi)
            axsm.plot(pup[t.ref:, 0], err[t.ref:, 1], "-" + ci,
                      label="%s" % wi)
            axss.plot(pup[t.ref:, 0], err[t.ref:, 0], "-" + ci,
                      label="%s" % wi)
    for row in rows:
        for ax in row:
            _finish_axes(ax)


def plot_spot_grid(system, ax, heights=(1., .707, 0.),
                   wavelengths=None, nrays=150, colors=COLORS):
    """Through-focus spot diagrams with the Airy circle overlay
    (reference analysis.py:250).  ax: (nfields, ndefocus) array."""
    import matplotlib as mpl
    paraxial = system.paraxial
    if wavelengths is None:
        wavelengths = system.wavelengths
    for axi in ax.flat:
        _xy_axes(axi)
    nz = ax.shape[1]
    rr = paraxial.rayleigh_range[1]
    if not np.isfinite(rr):
        rr = 0.  # degenerate NA: all panels at nominal focus
    dz = (np.arange(nz) - nz//2)*rr
    for hi, axi in zip(heights, ax[:, 0]):
        _label_row(axi, "OY=%s" % hi)
    for zi, axi in zip(dz, ax[-1, :]):
        _label_row(axi, "DZ=%.1g" % zi, vertical=False)
    for hi, row in zip(heights, ax):
        for wi, ci in zip(wavelengths, colors):
            airy = paraxial.airy_radius[1]/paraxial.wavelength*wi
            t = GeometricTrace(system)
            t.rays_point((0, hi), wi, nrays=nrays,
                         distribution="hexapolar", clip=True)
            spot = t.y[-1, :, :2] - t.y[-1, t.ref, :2]
            slope = tanarcsin(t.i[-1])
            for axij, zi in zip(row, dz):
                axij.add_patch(mpl.patches.Circle(
                    (0, 0), airy, edgecolor=ci, facecolor="none"))
                pts = spot + zi*slope
                axij.plot(pts[:, 0], pts[:, 1], "." + ci, markersize=1,
                          markeredgewidth=1, label="%s" % wi)
    for row in ax:
        for axi in row:
            _finish_axes(axi)


def plot_wavefront_panels(system, ax, heights=(0., .707, 1.),
                          wavelength=None, nrays=1000, colors=COLORS):
    """OPD contours, PSF with encircled energy, and MTF per field
    (reference analysis.py:285).  ax: (nfields, 4) array."""
    import matplotlib as mpl
    import matplotlib.pyplot as plt
    paraxial = system.paraxial
    if wavelength is None:
        wavelength = system.wavelengths[0]
    levels = None
    rmax = None
    for hi, axi in zip(heights, ax[:, 0]):
        _label_row(axi, "OY=%s" % hi)
    for hi, (axo, axp, axe, axm) in reversed(list(zip(heights, ax))):
        _xy_axes(axo)
        _xy_axes(axp)
        _style_axes(axe, "R", "E")
        _style_axes(axm, "F", "C")
        t = GeometricTrace(system)
        t.rays_point((0, hi), wavelength, nrays=nrays,
                     distribution="hexapolar", clip=True)
        try:
            gx, gy, opd = t.opd()
        except ValueError:
            continue
        finite = opd[np.isfinite(opd)]
        if levels is None:
            vmax = np.fabs(finite).max()
            levels = np.linspace(-vmax, vmax, 21)
        axo.contour(gx, gy, opd, levels, cmap=plt.cm.RdBu_r)
        _label_row(axo, "PTP: %.3g" % np.ptp(finite), vertical=False)
        airy = paraxial.airy_radius[1]/paraxial.wavelength*wavelength
        axp.add_patch(mpl.patches.Circle(
            (0, 0), airy, edgecolor="green", facecolor="none"))
        px, py, psf = map(np.fft.fftshift, t.psf())
        cx = (psf*px).sum()
        cy = (psf*py).sum()
        px, py = px - cx, py - cy
        step = px[1, 0] - px[0, 0]
        with np.errstate(divide="ignore"):
            logpsf = np.log10(psf)
        axp.contour(px, py, logpsf,
                    (logpsf.max() - 1 - np.arange(4))[::-1],
                    cmap=plt.cm.Reds, alpha=.2)
        axp.contour(px, py, psf, np.linspace(0, psf.max(), 21),
                    cmap=plt.cm.Greys)
        ee = np.cumsum(polar_sum(psf, (psf.shape[0]/2 + cx/step,
                                       psf.shape[1]/2 + cy/step),
                                 "azimuthal"))
        if rmax is None:
            rmax = np.searchsorted(ee, .9)*1.5*step
        axp.set_xlim(-rmax, rmax)
        axp.set_ylim(-rmax, rmax)
        axe.plot(np.arange(ee.size)*step, ee, "k-")
        axe.set_xlim(0, rmax)
        axe.set_ylim(0, 1)
        axe.set_aspect("auto")
        for axis, ls in ((0, "-"), (1, "--")):
            otf = np.fft.ifft(np.fft.ifftshift(psf.sum(axis)) *
                              psf.size**.5)
            freq = np.fft.fftfreq(otf.size, step)
            half = otf.size//2
            axm.plot(freq[:half], np.absolute(otf)[:half], "k" + ls)
        axm.set_xlim(0, 1/airy)
        axm.set_ylim(0, 1)
    for row in ax:
        for axi in row:
            _finish_axes(axi)


def plot_field_curves(system, ax, height=1., wavelengths=None,
                      nrays=21, colors=COLORS):
    """Distortion, lateral color, astigmatism, spherical, and
    longitudinal color curves (reference analysis.py:354).
    ax: 5 axes."""
    if wavelengths is None:
        wavelengths = system.wavelengths
    axd, axc, axf, axs, axa = ax
    for axi, xl, yl, tl in (
            (axd, "EY", "REY", "DIST"), (axc, "EY", "DEY", "TCOLOR"),
            (axf, "EY", "DEZ", "ASTIG"), (axs, "PY", "DEZ", "SPHA"),
            (axa, "L", "DEZ", "LCOLOR")):
        _style_axes(axi, xl, yl, tl, yzero=False, xzero=False)
    radius = system.image.radius
    if not np.isfinite(radius) or radius == 0:
        # unbounded image conjugate (e.g. a bare doublet): reference
        # the distortion curve to the paraxial image height instead
        radius = system.paraxial.height[1]
    if not np.isfinite(radius) or radius == 0:
        # still degenerate (no off-axis field, or afocal): there is
        # no meaningful field scale -- skip the panel instead of
        # plotting all-NaN curves
        return
    href = np.linspace(0, height*radius, nrays)
    href[0] = np.nan
    base = None
    for i, (wi, ci) in enumerate(zip(wavelengths, colors)):
        t = GeometricTrace(system)
        t.rays_line((0, height), wi, nrays=nrays)
        chief, mer, sag = np.split(t.y[-1].T, (nrays, 2*nrays), axis=1)
        uc, um, us = np.split(tanarcsin(t.i[-1]).T, (nrays, 2*nrays),
                              axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            if i == 0:
                dist = (chief[1] - href)/href
                dist[0] = np.nan
                axd.plot(chief[1], dist, ci + "-", label="%s" % wi)
                base = chief
            else:
                axc.plot(chief[1], chief[1] - base[1], ci + "-",
                         label="%s" % wi)
            zt = -(mer[1] - chief[1])/(um[1] - uc[1])
            zs = -(sag[0] - chief[0])/(us[0] - uc[0])
        axf.plot(chief[1], zt, ci + "-", label="EZt %s" % wi)
        axf.plot(chief[1], zs, ci + "--", label="EZs %s" % wi)
        t = GeometricTrace(system)
        t.rays_point((0, 0.), wi, nrays=nrays,
                     distribution="half-meridional", clip=True)
        pd = system.object.pupil.distance
        pup = t.y[0, :, 1] + pd*tanarcsin(t.u[0])[:, 1]
        slope = tanarcsin(t.i[-1])[:, 1]
        slope[t.ref] = np.nan
        with np.errstate(invalid="ignore", divide="ignore"):
            axs.plot(pup, -t.y[-1, :, 1]/slope, ci + "-",
                     label="%s" % wi)
    # longitudinal color: paraxial-ish focus shift vs wavelength
    wl, wu = min(wavelengths), max(wavelengths)
    sweep = np.linspace(wl - (wu - wl)/4, wu + (wu - wl)/4, nrays)
    pd, ph = system.pupil((0, 0), wavelengths[0])
    t = GeometricTrace(system)
    focus = []
    for wwi in np.r_[wavelengths[0], sweep]:
        y, u = system.aim((0, 0), (0, 1e-3), pd, ph)
        t.rays_given(y, u, wwi)
        t.propagate(clip=False)
        focus.append(-t.y[-1, 0, 1]/tanarcsin(t.i[-1, 0])[1])
    axa.plot(sweep, np.array(focus[1:]) - focus[0], "-")
    for axi in ax:
        _finish_axes(axi)


def _mtf_samples(system, field, wavelength, freqs, nrays):
    """Tangential/sagittal MTF of one field point at the requested
    spatial frequencies, from the diffraction PSF of a traced
    hexapolar bundle.  Returns (2, len(freqs)) or NaNs when no rays
    survive."""
    out = np.full((2, len(freqs)), np.nan)
    t = GeometricTrace(system)
    t.rays_point(field, wavelength, nrays=nrays,
                 distribution="hexapolar", clip=True)
    try:
        px, py, psf = map(np.fft.fftshift, t.psf())
    except ValueError:
        return out
    step = px[1, 0] - px[0, 0]
    for axis in (0, 1):
        # tangential sums over x (axis 0 leaves the y profile)
        otf = np.fft.ifft(np.fft.ifftshift(psf.sum(axis)) *
                          psf.size**.5)
        freq = np.fft.fftfreq(otf.size, step)
        half = otf.size//2
        out[axis] = np.interp(freqs, freq[:half],
                              np.absolute(otf)[:half])
    return out


def plot_mtf_vs_field(system, ax, nfields=7, fractions=(.125, .25, .5),
                      wavelength=None, nrays=1000):
    """MTF at fixed spatial frequencies (fractions of the incoherent
    cutoff 1/airy) versus field height; solid = tangential, dashed =
    sagittal.  The through-field summary complements the per-field MTF
    curves of plot_wavefront_panels."""
    paraxial = system.paraxial
    if wavelength is None:
        wavelength = system.wavelengths[0]
    _style_axes(ax, "OY", "MTF", "MTF vs FIELD",
                yzero=False, xzero=False)
    airy = paraxial.airy_radius[1]/paraxial.wavelength*wavelength
    freqs = np.asarray(fractions)/airy
    heights = np.linspace(0, 1, nfields)
    curves = np.full((len(freqs), 2, nfields), np.nan)
    for i, hi in enumerate(heights):
        curves[:, :, i] = _mtf_samples(system, (0, hi), wavelength,
                                       freqs, nrays).T
    for fi, row, frac in zip(freqs, curves, fractions):
        # tangential sums over x (axis 0 leaves the y profile)
        ax.plot(heights, row[0], "-", label="T %.3g/mm" % fi)
        ax.plot(heights, row[1], "--", color=ax.lines[-1].get_color(),
                label="S %.3g/mm" % fi)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize="small", loc="lower left")
    _finish_axes(ax)
    return heights, curves


def plot_layout_3d(system, ax=None, nrad=8, nazi=33, fields=None,
                   wavelength=None, nrays=5, elev=18., azim=-65.):
    """3-D system layout: surface meshes in lab coordinates plus
    clipping-ray bundles for the extreme fields (reference TODO.rst
    "3d plot" -- absent upstream).

    Surfaces render as wireframes on a polar (radius x azimuth) grid
    evaluated through the exact sag (conic + aspherics) and each
    element's pose (offset + rotation), so tilted/decentered systems
    fold correctly.  Returns the Axes3D."""
    import matplotlib.pyplot as plt
    if ax is None:
        fig = plt.figure(figsize=(10, 10))
        ax = fig.add_subplot(projection="3d")
    origins = system.origins
    for k, el in enumerate(system):
        radius = getattr(el, "radius", np.inf)
        if not np.isfinite(radius) or radius <= 0:
            continue
        r = np.linspace(0., radius, nrad)[1:]
        a = np.linspace(0., 2*np.pi, nazi)
        rr, aa = np.meshgrid(r, a)
        x, y = rr*np.cos(aa), rr*np.sin(aa)
        z = np.zeros_like(x)
        try:
            sag = el.surface_sag(
                np.stack([x, y, z], axis=-1).reshape(-1, 3))
            z = -sag.reshape(x.shape)
        except (AttributeError, NotImplementedError):
            pass
        pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
        world = origins[k] + el.from_normal(pts)
        wx, wy, wz = (world[:, i].reshape(x.shape) for i in range(3))
        ax.plot_wireframe(wz, wx, wy, rstride=4, cstride=2,
                          color="black", linewidth=.4)
    if nrays:
        if fields is None:
            fields = (min(system.fields), max(system.fields))
        for h in fields:
            t = GeometricTrace(system)
            t.rays_clipping((0, h), wavelength)
            pts = np.stack([t.origins[k]
                            + system[k].from_normal(t.y[k])
                            for k in range(t.length)])
            for ray in range(pts.shape[1]):
                ax.plot(pts[:, ray, 2], pts[:, ray, 0],
                        pts[:, ray, 1], color="green", linewidth=.7)
    # isotropic axes around the traced volume
    spans = []
    for c in "xyz":
        lo, hi = getattr(ax, "get_%slim" % c)()
        spans.append(hi - lo)
    ax.set_box_aspect(spans)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    return ax


def plot_mtf_through_focus(system, ax, height=1., wavelength=None,
                           fractions=(.125, .25, .5), nrays=1000,
                           nsteps=9, window=2.):
    """MTF at fixed spatial frequencies versus focus shift at one
    field height; solid = tangential, dashed = sagittal (reference
    TODO.rst "analyze mtf through focus plot" -- absent upstream).

    The image plane sweeps +-window Rayleigh ranges; each step
    re-traces the bundle and evaluates the diffraction MTF.  Returns
    (shifts, curves[(freq, T/S, step)])."""
    paraxial = system.paraxial
    if wavelength is None:
        wavelength = system.wavelengths[0]
    _style_axes(ax, "DZ", "MTF", "MTF vs FOCUS (OY=%g)" % height,
                yzero=False, xzero=False)
    airy = paraxial.airy_radius[1]/paraxial.wavelength*wavelength
    freqs = np.asarray(fractions)/airy
    span = window*paraxial.rayleigh_range[1]
    if not np.isfinite(span):
        span = 0.  # degenerate NA: no meaningful focus sweep
    shifts = np.linspace(-span, span, nsteps)
    curves = np.full((len(freqs), 2, nsteps), np.nan)
    image = system[-1]
    base = image.distance
    try:
        for i, dz in enumerate(shifts):
            image.distance = base + dz
            curves[:, :, i] = _mtf_samples(
                system, (0, height), wavelength, freqs, nrays).T
    finally:
        image.distance = base
    for fi, row in zip(freqs, curves):
        ax.plot(shifts, row[0], "-", label="T %.3g/mm" % fi)
        ax.plot(shifts, row[1], "--", color=ax.lines[-1].get_color(),
                label="S %.3g/mm" % fi)
    ax.set_ylim(0, 1)
    ax.legend(fontsize="small", loc="lower left")
    _finish_axes(ax)
    return shifts, curves


def plot_footprint(system, ax, surface, wavelengths=None,
                   nrays=150, colors=COLORS):
    """Beam footprint on one surface: local hit coordinates of a
    hexapolar bundle per field, with the surface's clear aperture
    circle.  The classic element-sizing diagnostic."""
    import matplotlib as mpl
    if wavelengths is None:
        wavelengths = system.wavelengths[:1]
    _xy_axes(ax)
    surface = surface % len(system)
    radius = system[surface].radius
    if np.isfinite(radius):
        ax.add_patch(mpl.patches.Circle((0, 0), radius,
                                        edgecolor="black",
                                        facecolor="none"))
    for fi, hi in enumerate(system.fields):
        ci = colors[fi % len(colors)]
        for wi in wavelengths:
            t = GeometricTrace(system)
            t.rays_point((0, hi), wi, nrays=nrays,
                         distribution="hexapolar", clip=True)
            # filter on the local hit (a ray vignetted downstream
            # still has a valid footprint here)
            pts = t.y[surface, :, :2]
            good = np.isfinite(pts).all(1)
            ax.plot(pts[good, 0], pts[good, 1], "." + ci,
                    markersize=2, label="OY=%s" % hi)
    _label_row(ax, "surface %d" % surface, vertical=False)
    _finish_axes(ax)


def plot_vignetting(system, ax, nfields=16, wavelength=None):
    """Relative meridional/sagittal aperture vs field height: the
    vignetting diagram, from the batched rim solve (System.pupils,
    stop=-1 -- one device dispatch for all field points)."""
    _style_axes(ax, "OY", "rel. aperture", "VIGNETTING",
                yzero=False, xzero=False)
    heights = np.linspace(0, 1, nfields)
    fields = np.stack([np.zeros(nfields), heights], 1)
    z, boxes = system.pupils(fields, l=wavelength, stop=-1)
    full = np.abs(boxes[0]).max()
    ax.plot(heights, boxes[:, 1, 1]/full, "k-", label="+mer")
    ax.plot(heights, -boxes[:, 0, 1]/full, "k--", label="-mer")
    ax.plot(heights, boxes[:, 1, 0]/full, "k:", label="sag")
    ax.set_xlim(0, 1)
    ax.legend(fontsize="small", loc="lower left")
    _finish_axes(ax)


# -- the report driver --------------------------------------------------

class Analysis:
    """One-call report generator (flags as class attributes,
    overridable per instance; reference analysis.py:41-69)."""

    figwidth = 12.
    run = True
    update = True
    print = True
    plot = True
    trace_gaussian = False
    print_gaussian = False
    print_system = True
    print_paraxial = True
    resize_full = False
    refocus_full = True
    print_full = False
    plot_paraxial = False
    plot_gaussian = False
    plot_full = False
    plot_rays = 3
    plot_transverse = True
    plot_spots = True
    defocus = 5
    plot_opds = True
    plot_longitudinal = True
    plot_vignetting = False
    plot_mtf_field = False
    plot_mtf_focus = False
    plot_3d = False
    plot_image = False
    image_scene = None
    image_width = None
    image_patches = 3
    image_rays = 500
    plot_footprints = False
    print_zernike = False
    print_ad_expansion = False
    print_ghosts = False
    print_polarization = False
    print_thermal = False
    thermal_temps = (0., 20., 40., 60.)
    ghost_limit = 10
    zernike_terms = 15

    def __init__(self, system, **kwargs):
        self.system = system
        self.text = []
        self.figures = []
        for k, v in kwargs.items():
            if not hasattr(self, k):
                raise ValueError("no such option %s" % k)
            setattr(self, k, v)
        if self.run:
            self.generate()
        if self.print:
            for block in self.text:
                print(block)

    def generate(self):
        import matplotlib.pyplot as plt
        s = self.system
        if self.update:
            s.update()
        if self.resize_full:
            t = GeometricTrace(s)
            t.rays_paraxial()
            t.resize()
            s.resize_convex()
        if self.refocus_full:
            t = GeometricTrace(s)
            t.rays_point((0, 0.), nrays=13, distribution="radau",
                         clip=False, filter=False)
            t.refocus()
        if self.print_system:
            self.text.append(str(s))
        if self.print_paraxial:
            self.text.append(str(s.paraxial))
        gauss = GaussianTrace(s)
        if self.print_gaussian:
            self.text.append(str(gauss))
        t = GeometricTrace(s)
        t.rays_paraxial()
        if self.print_full:
            self.text.append(str(t))
        if self.print_zernike:
            self.text.append("\n".join(self.zernike_text()))
        if self.print_ad_expansion:
            from .expansion import transverse_expansion
            self.text.append(
                "\n".join(transverse_expansion(s).text()))
        if self.print_ghosts:
            from .ghosts import ghost_text
            try:
                self.text.append(ghost_text(s, limit=self.ghost_limit))
            except NotImplementedError as exc:
                self.text.append("ghost analysis skipped: %s" % exc)
        if self.print_polarization:
            from .polarization import PolarizationTrace
            blocks = []
            for h in (min(s.fields), max(s.fields)):
                p = PolarizationTrace(s, (0., h), nrays=16)
                blocks.append("OY=%g  %s" % (h, p.text()))
            self.text.append("\n".join(blocks))
        if self.print_thermal:
            from .thermal import thermal_text
            self.text.append(thermal_text(s, temps=self.thermal_temps))

        if not self.plot:
            return

        fig, ax = plt.subplots(figsize=(self.figwidth, self.figwidth))
        self.figures.append(fig)
        s.plot(ax)
        if self.plot_paraxial:
            s.paraxial.plot(ax)
        if self.plot_gaussian:
            gauss.plot(ax)
        if self.plot_full:
            t.plot(ax)
        for h in (min(s.fields), max(s.fields)):
            t = GeometricTrace(s)
            t.rays_clipping((0, h))
            t.plot(ax)

        if self.plot_transverse:
            fig = plt.figure(figsize=(
                self.figwidth, self.figwidth*len(s.fields)/5))
            self.figures.append(fig)
            plot_transverse_fans(s, fig, s.fields)

        if self.plot_longitudinal:
            fig, ax = plt.subplots(
                1, 5, figsize=(self.figwidth, self.figwidth/5))
            self.figures.append(fig)
            plot_field_curves(s, ax, max(s.fields))

        if self.plot_spots:
            fig, ax = plt.subplots(
                len(s.fields), self.defocus,
                figsize=(self.figwidth,
                         self.figwidth*len(s.fields)/self.defocus),
                sharex=True, sharey=True, squeeze=False)
            self.figures.append(fig)
            plot_spot_grid(s, ax[::-1], s.fields)

        if self.plot_opds:
            fig, ax = plt.subplots(
                len(s.fields), 4,
                figsize=(self.figwidth,
                         self.figwidth*len(s.fields)/4),
                squeeze=False)
            self.figures.append(fig)
            plot_wavefront_panels(s, ax[::-1], s.fields)

        if self.plot_vignetting:
            fig, ax = plt.subplots(
                figsize=(self.figwidth/2, self.figwidth/2))
            self.figures.append(fig)
            plot_vignetting(s, ax)

        if self.plot_mtf_field:
            fig, ax = plt.subplots(
                figsize=(self.figwidth/2, self.figwidth/2))
            self.figures.append(fig)
            plot_mtf_vs_field(s, ax)

        if self.plot_3d:
            ax3 = plot_layout_3d(s)
            self.figures.append(ax3.figure)

        if self.plot_image:
            from .imaging import simulate_image, star_target
            from .trace.paraxial import ParaxialTrace
            scene = (star_target() if self.image_scene is None
                     else np.asarray(self.image_scene, dtype=float))
            width = self.image_width
            if width is None:
                # fresh paraxial: refocus_full may have moved the
                # image plane since s.update()
                width = 2*ParaxialTrace(s).height[1]
            if not np.isfinite(width) or width == 0:
                width = 1.
            img = simulate_image(s, scene, width,
                                 npatches=self.image_patches,
                                 nrays=self.image_rays)
            fig, (axs, axi) = plt.subplots(
                1, 2, figsize=(self.figwidth, self.figwidth/2))
            self.figures.append(fig)
            for axx, data, label in ((axs, scene, "scene"),
                                     (axi, img, "image")):
                axx.imshow(data, cmap="gray", origin="lower")
                axx.set_title(label)
                axx.set_xticks(())
                axx.set_yticks(())

        if self.plot_mtf_focus:
            fig, ax = plt.subplots(
                figsize=(self.figwidth/2, self.figwidth/2))
            self.figures.append(fig)
            plot_mtf_through_focus(s, ax, max(s.fields))

        if self.plot_footprints:
            idx = [j for j in range(1, len(s) - 1)
                   if np.isfinite(s[j].radius)]
            fig, ax = plt.subplots(
                1, max(len(idx), 1),
                figsize=(self.figwidth,
                         self.figwidth/max(len(idx), 1)),
                squeeze=False)
            self.figures.append(fig)
            for axi, j in zip(ax[0], idx):
                plot_footprint(s, axi, j)

        return self.text, self.figures

    def export_html(self, path=None, title=None):
        """Self-contained HTML report: all text blocks and figures
        (PNGs embedded base64).  Returns the HTML string; writes it to
        `path` when given."""
        import base64
        import html as _html
        import io as _io
        title = title or (self.system.description or "rayopt_tpu report")
        parts = ["<!DOCTYPE html><html><head><meta charset='utf-8'>",
                 "<title>%s</title>" % _html.escape(title),
                 "<style>body{font-family:sans-serif;max-width:1100px;"
                 "margin:2em auto}pre{background:#f6f6f6;padding:1em;"
                 "overflow-x:auto}img{max-width:100%}</style>",
                 "</head><body>",
                 "<h1>%s</h1>" % _html.escape(title)]
        for block in self.text:
            parts.append("<pre>%s</pre>" % _html.escape(str(block)))
        for fig in self.figures:
            buf = _io.BytesIO()
            fig.savefig(buf, format="png", dpi=100,
                        bbox_inches="tight")
            b64 = base64.b64encode(buf.getvalue()).decode("ascii")
            parts.append("<img src='data:image/png;base64,%s'>" % b64)
        parts.append("</body></html>")
        doc = "\n".join(parts)
        if path:
            with open(path, "w") as f:
                f.write(doc)
        return doc

    def zernike_text(self, nrays=400):
        """Noll-Zernike wavefront tables per field (in waves)."""
        from .utils.zernike import zernike_table
        out = []
        for h in self.system.fields:
            t = GeometricTrace(self.system)
            t.rays_point((0, h), nrays=nrays,
                         distribution="hexapolar", clip=True)
            try:
                coeff, rms = t.zernike(self.zernike_terms)
            except ValueError:
                continue
            out.append("field %g zernike (waves), residual rms %.3g:"
                       % (h, rms))
            out.extend("  " + line for line in zernike_table(coeff))
        return out

    # method aliases for reference API compatibility
    def transverse(self, fig, heights=(0., .707, 1.), **kw):
        return plot_transverse_fans(self.system, fig, heights, **kw)

    def spots(self, ax, heights=(1., .707, 0.), **kw):
        return plot_spot_grid(self.system, ax, heights, **kw)

    def opds(self, ax, heights=(0., .707, 1.), **kw):
        return plot_wavefront_panels(self.system, ax, heights, **kw)

    def longitudinal(self, ax, height=1., **kw):
        return plot_field_curves(self.system, ax, height, **kw)
