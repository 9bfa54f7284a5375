"""Differentiable diffraction metrics: Strehl ratio, PSF, MTF.

The host path (GeometricTrace.psf) resamples the exit-pupil OPD with
scipy.griddata and FFTs in NumPy -- fine for reports, opaque to
jax.grad.  Here the whole pipeline is jnp: rays scatter their complex
amplitude exp(-2*pi*i W) onto a regular pupil grid with bilinear
(cloud-in-cell) weights -- a differentiable scatter -- and jnp.fft
produces the PSF/MTF on device.  The Strehl ratio needs no grid at
all: it is the squared magnitude of the weighted mean phasor over the
pupil, with the tilt (image-point choice) optionally removed by a
closed-form weighted least-squares fit.

These are merit functions: optimizing Strehl or encircled energy
directly through jax.grad is a capability the reference's
finite-difference optimizer could not offer.
"""

import functools

import jax
import jax.numpy as jnp

from .grad import opd_rays


def _pupil_samples(table, y0, u0, w, **opd_kw):
    """(opd, xy, weights, good): NaN-guarded pupil samples.

    engine="adjoint" (in opd_kw) samples through the per-ray OPD
    Pallas adjoint kernel (ops.pallas_grad.pallas_opd_rays) instead
    of the XLA trace: identical values, in-kernel backward -- Strehl/
    MTF optimization at production ray counts without VJP residuals.
    """
    if opd_kw.pop("engine", "xla") == "adjoint":
        from ..ops.pallas_grad import pallas_opd_rays
        opd_kw.pop("biconic", None)
        opd, xy = pallas_opd_rays(table, y0, u0, with_pupil=True,
                                  **opd_kw)
    else:
        opd, xy = opd_rays(table, y0, u0, with_pupil=True, **opd_kw)
    good = jnp.isfinite(opd) & jnp.all(jnp.isfinite(xy), axis=1)
    if w is None:
        w = jnp.ones(opd.shape[0], opd.dtype)
    wg = jnp.where(good, w, 0.)
    wg = wg/wg.sum()
    opd = jnp.where(good, opd, 0.)
    xy = jnp.where(good[:, None], xy, 0.)
    return opd, xy, wg, good


def _remove_tilt(opd, xy, wg):
    """Subtract the weighted least-squares plane a + b x + c y
    (piston + tilt) from the wavefront -- closed form, differentiable."""
    ones = jnp.ones_like(opd)
    basis = jnp.stack([ones, xy[:, 0], xy[:, 1]], axis=1)
    gram = basis.T @ (wg[:, None]*basis)
    rhs = basis.T @ (wg*opd)
    coef = jnp.linalg.solve(gram + 1e-30*jnp.eye(3), rhs)
    return opd - basis @ coef


def strehl_ratio(table, y0, u0, w=None, remove_tilt=True, **opd_kw):
    """Differentiable Strehl ratio: |sum w exp(-2 pi i W)|^2 over the
    pupil (weights from the pupil quadrature), i.e. the on-axis PSF
    intensity relative to the diffraction limit.  `remove_tilt`
    re-centers on the best image point (piston cancels in the modulus
    automatically)."""
    opd, xy, wg, good = _pupil_samples(table, y0, u0, w, **opd_kw)
    if remove_tilt:
        opd = _remove_tilt(opd, xy, wg)
    phasor = (wg*jnp.exp(-2j*jnp.pi*opd)).sum()
    return jnp.square(jnp.abs(phasor))


def strehl_marechal(table, y0, u0, w=None, **opd_kw):
    """Marechal approximation exp(-(2 pi sigma)^2) from the weighted
    wavefront variance -- cheaper and smoother than the exact phasor
    sum; accurate for Strehl >~ 0.3."""
    opd, xy, wg, good = _pupil_samples(table, y0, u0, w, **opd_kw)
    opd = _remove_tilt(opd, xy, wg)
    var = (wg*jnp.square(opd)).sum()
    return jnp.exp(-jnp.square(2*jnp.pi)*var)


def pupil_grid(table, y0, u0, w=None, ngrid=64, half=None, **opd_kw):
    """Complex pupil function on an (ngrid, ngrid) grid.

    Rays deposit w * exp(-2 pi i W) with bilinear (cloud-in-cell)
    weights; the deposit is normalized by the deposited weight per
    cell, so nonuniform ray densities (hexapolar, quadrature bundles)
    do not imprint on the amplitude.  Returns (grid, cell_size).
    `half` fixes the grid half-width (for summing wavelengths on a
    common grid); default is the bundle's own footprint.
    Fully differentiable (scatter-add only).
    """
    opd, xy, wg, good = _pupil_samples(table, y0, u0, w, **opd_kw)
    if half is None:
        half = jax.lax.stop_gradient(
            jnp.abs(jnp.where(good[:, None], xy, 0.)).max())*1.0001
    pos = (xy/half + 1.)*((ngrid - 1)/2.)   # [0, ngrid-1]
    base = jnp.clip(jnp.floor(pos), 0, ngrid - 2).astype(jnp.int32)
    frac = pos - base
    amp = jnp.where(good, jnp.exp(-2j*jnp.pi*opd), 0.)
    dep = jnp.zeros((ngrid, ngrid), jnp.complex128
                    if opd.dtype == jnp.float64 else jnp.complex64)
    den = jnp.zeros((ngrid, ngrid), opd.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            cell_w = (jnp.abs(1 - di - frac[:, 0])
                      * jnp.abs(1 - dj - frac[:, 1]))*wg
            ii = base[:, 0] + di
            jj = base[:, 1] + dj
            dep = dep.at[ii, jj].add(cell_w*amp)
            den = den.at[ii, jj].add(cell_w)
    lit = den > 1e-12*den.max()
    grid = jnp.where(lit, dep/jnp.where(lit, den, 1.), 0.)
    return grid, 2*half/(ngrid - 1)


def psf_grid(table, y0, u0, w=None, ngrid=64, pad=2, wavelength=None,
             radius=None, scale=1e-3, half=None, **opd_kw):
    """Diffraction PSF on device: FFT of the gridded pupil function.

    Returns (p, q, psf): angular-ish frequency axes (cycles scaled by
    radius, matching GeometricTrace.psf) and the normalized intensity.
    """
    grid, dx = pupil_grid(table, y0, u0, w, ngrid, half=half,
                          wavelength=wavelength, radius=radius,
                          scale=scale, **opd_kw)
    shape = (pad*ngrid, pad*ngrid)
    field = jnp.fft.fft2(grid, shape)
    psf = jnp.square(jnp.abs(field))
    psf = psf/psf.sum()
    cycles = scale/wavelength
    freq = jnp.fft.fftfreq(shape[0], dx*cycles/(radius
                                                if radius is not None
                                                else 1.))
    p, q = jnp.broadcast_arrays(freq[:, None], freq[None, :])
    return p, q, psf


def psf_polychromatic(table, bundles, ngrid=64, pad=2, radius=None,
                      scale=1e-3, spectral_weights=None, half=None,
                      **opd_kw):
    """Spectrally-weighted PSF: per-wavelength PSFs (each bundle is
    (y0, u0, w, chroma) from bundles_from_system, chroma carrying the
    table index overrides and a 'wavelength' key) summed on a common
    pupil grid.  Returns (p, q, psf) on the first bundle's axes."""
    if spectral_weights is None:
        spectral_weights = jnp.ones(len(bundles))/len(bundles)
    if half is None:
        half = max(float(jnp.abs(b[0][:, :2]).max()) for b in bundles)
    total = None
    axes = None
    for sw, bundle in zip(spectral_weights, bundles):
        y0, u0, w, chroma = bundle
        chroma = dict(chroma)
        l = chroma.pop("wavelength")
        tab = table.replace(**chroma)
        p, q, psf = psf_grid(tab, y0, u0, w, ngrid, pad,
                             wavelength=l, radius=radius, scale=scale,
                             half=half, **opd_kw)
        total = psf*sw if total is None else total + psf*sw
        if axes is None:
            axes = (p, q)
    return axes[0], axes[1], total/total.sum()


def mtf_radial(table, y0, u0, w=None, ngrid=64, pad=2, **kw):
    """Modulation transfer function |FFT(PSF)| along the two axes;
    returns (freq_index, mtf_x, mtf_y) normalized to MTF(0) = 1."""
    p, q, psf = psf_grid(table, y0, u0, w, ngrid, pad, **kw)
    otf = jnp.fft.fft2(psf)
    mtf = jnp.abs(otf)/jnp.abs(otf[0, 0])
    n = mtf.shape[0]//2
    return jnp.arange(n), mtf[:n, 0], mtf[0, :n]
