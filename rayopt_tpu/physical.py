"""Physical-optics (wave) propagation: the numerical complement of
the analytic gaussian-beam machinery.

The reference stops at ABCD q-parameter propagation
(reference gaussian_trace.py); this module propagates sampled complex
fields with the band-limited angular-spectrum method -- exact scalar
diffraction between parallel planes, one FFT pair per step, which the
TPU's f32 FFTs chew through -- plus thin-lens/aperture screens and a
pupil phase screen built from the ray trace's OPD, linking the ray
and wave domains: trace the system once, then image coherently.

Conventions: fields are (N, M) complex arrays sampled at `pitch`
(system length units, mm by default), wavelength in meters like the
rest of the package, scale = the system unit in meters.  The time
convention is exp(-i omega t), so propagation multiplies by
exp(+i k_z dz).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_field", "propagate_angular_spectrum", "thin_lens_phase",
    "circular_aperture", "intensity", "beam_radius", "field_power",
    "pupil_phase_screen",
]


def _freqs(n, pitch):
    return np.fft.fftfreq(n, d=pitch)


def gaussian_field(shape, pitch, w0, wavelength=None, scale=1e-3,
                   z=0., dtype=jnp.complex64):
    """A fundamental Gaussian beam field sampled on an (N, M) grid:
    waist w0 at z=0 (grid at distance z from the waist), unit power.

    With z != 0 the analytic beam parameters (width, curvature, Gouy
    phase) are applied -- the oracle for the numerical propagator."""
    ny, nx = shape
    y = (np.arange(ny) - ny/2 + .5)*pitch
    x = (np.arange(nx) - nx/2 + .5)*pitch
    r2 = (y[:, None]**2 + x[None, :]**2)
    if wavelength is None:
        raise TypeError("wavelength is required")
    lam = wavelength/scale
    zr = np.pi*w0**2/lam
    if z == 0.:
        wz = w0
        phase = np.zeros_like(r2)
    else:
        wz = w0*np.sqrt(1 + (z/zr)**2)
        rz = z*(1 + (zr/z)**2)
        gouy = np.arctan(z/zr)
        k = 2*np.pi/lam
        phase = k*r2/(2*rz) - gouy
    amp = np.exp(-r2/wz**2)
    field = amp*np.exp(1j*phase)
    field /= np.sqrt((np.abs(field)**2).sum()*pitch*pitch)
    return jnp.asarray(field, dtype)


def propagate_angular_spectrum(field, pitch, dz, wavelength,
                               scale=1e-3, n_medium=1.):
    """Propagate a sampled complex field by the axial distance dz
    (system units) with the band-limited angular-spectrum method.

    H(fx, fy) = exp(i 2 pi dz (sqrt((n/lam)^2 - f^2) - n/lam));
    evanescent components (negative radicand) decay and are cut.
    Exact scalar diffraction (up to the irrelevant global piston
    exp(i k dz), removed so the phase stays small) for fields sampled
    finely enough -- the numerical twin of the analytic ABCD
    propagation.

    The transfer kernel is built host-side in float64: the absolute
    k_z dz runs to ~1e6 radians, far beyond complex64 phase
    precision, while the piston-removed relative phase is small and
    casts to f32 safely."""
    field = jnp.asarray(field)
    ny, nx = field.shape
    lam = wavelength/scale/n_medium
    fy = _freqs(ny, pitch)[:, None].astype(np.float64)
    fx = _freqs(nx, pitch)[None, :].astype(np.float64)
    arg = (1./lam)**2 - fy*fy - fx*fx
    rel = 2*np.pi*(np.sqrt(np.maximum(arg, 0.)) - 1./lam)*float(dz)
    rel = np.remainder(rel, 2*np.pi)
    prop = np.where(arg > 0, np.exp(1j*rel), 0.)
    prop = jnp.asarray(prop, field.dtype)
    return jnp.fft.ifft2(jnp.fft.fft2(field)*prop)


def thin_lens_phase(shape, pitch, f, wavelength, scale=1e-3,
                    dtype=jnp.complex64):
    """Thin-lens transmission exp(-i k r^2 / 2f) on the field grid."""
    ny, nx = shape
    y = (np.arange(ny) - ny/2 + .5)*pitch
    x = (np.arange(nx) - nx/2 + .5)*pitch
    r2 = y[:, None]**2 + x[None, :]**2
    k = 2*np.pi/(wavelength/scale)
    return jnp.asarray(np.exp(-1j*k*r2/(2.*f)), dtype)


def circular_aperture(shape, pitch, radius, dtype=jnp.complex64):
    """Hard circular aperture mask on the field grid."""
    ny, nx = shape
    y = (np.arange(ny) - ny/2 + .5)*pitch
    x = (np.arange(nx) - nx/2 + .5)*pitch
    r2 = y[:, None]**2 + x[None, :]**2
    return jnp.asarray((r2 <= radius*radius).astype(float), dtype)


def intensity(field):
    """|E|^2 as a real device array.  Fetch THIS to the host, not the
    complex field: some accelerator transports (the axon TPU tunnel)
    cannot transfer complex arrays, while real fetches always work --
    the same convention imaging.py uses for its FFT products."""
    return jnp.abs(jnp.asarray(field))**2


def field_power(field, pitch):
    """Integrated |E|^2 (Parseval-conserved by the propagator).
    Computed on device; only the scalar comes to the host."""
    return float(jnp.sum(intensity(field)))*pitch*pitch


def beam_radius(field, pitch):
    """Second-moment (D4sigma/2-style) beam radius: sqrt(2 <r^2>)
    equals the gaussian 1/e^2 radius w for a fundamental beam.
    Moments are computed on device; only scalars come to the host."""
    inten = intensity(field)
    ny, nx = inten.shape
    y = jnp.asarray((np.arange(ny) - ny/2 + .5)*pitch)
    x = jnp.asarray((np.arange(nx) - nx/2 + .5)*pitch)
    tot = inten.sum()
    cy = (inten.sum(1)*y).sum()/tot
    cx = (inten.sum(0)*x).sum()/tot
    r2 = ((y - cy)[:, None]**2 + (x - cx)[None, :]**2)
    return float(jnp.sqrt(2*(inten*r2).sum()/tot))


def pupil_phase_screen(system, shape, pitch, field=(0., 0.),
                       wavelength=None, nrays=2000):
    """Complex pupil screen of a traced system: amplitude = the
    vignetting indicator, phase = -2 pi OPD(waves), resampled from the
    exit-pupil ray grid onto an (N, M) field grid centered on the
    chief ray.  Multiply a converging reference field by this screen
    to image coherently through the REAL (aberrated) system -- the
    ray-wave bridge the reference never had."""
    from scipy.interpolate import griddata
    from .trace.geometric import GeometricTrace
    if wavelength is None:
        wavelength = system.wavelengths[0]
    t = GeometricTrace(system)
    t.rays_point(field, wavelength, nrays=nrays,
                 distribution="hexapolar", clip=True)
    xp, yp, opd = t.opd(resample=False)
    good = np.isfinite(opd)
    ny, nx = shape
    gy = (np.arange(ny) - ny/2 + .5)*pitch
    gx = (np.arange(nx) - nx/2 + .5)*pitch
    gxx, gyy = np.meshgrid(gx, gy)
    ph = griddata((xp[good], yp[good]), opd[good], (gxx, gyy),
                  method="cubic")
    amp = np.isfinite(ph).astype(float)
    ph = np.where(np.isfinite(ph), ph, 0.)
    return jnp.asarray(amp*np.exp(-2j*np.pi*ph), jnp.complex64)
