"""Extended-scene image simulation (beyond reference): convolve a
scene with the system's field-varying diffraction PSF.

The classic commercial-code feature (image simulation): the field of
view is tiled into patches, the diffraction PSF is evaluated at each
patch center (GeometricTrace.psf: OPD -> pupil function -> |FFT|^2),
resampled onto the scene pixel pitch and energy-normalized, and the
scene is FFT-convolved against every patch PSF with a bilinear
partition-of-unity blend -- a space-variant convolution as a small
batch of space-invariant ones.

The per-patch convolutions run batched on the accelerator (one
vmapped FFT product over the patch axis); the PSF sampling reuses the
existing trace/OPD machinery per patch on the host.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["field_psf", "simulate_image", "simulate_image_poly",
           "star_target"]


def star_target(size=128, spokes=24):
    """A Siemens-star test scene: binary spokes radiating from the
    center (resolution falls off toward the center, so blur is read
    directly off the radius where spokes merge)."""
    ax = np.arange(size) - size/2 + .5
    gy, gx = np.meshgrid(ax, ax, indexing="ij")
    theta = np.arctan2(gy, gx)
    scene = (np.cos(spokes*theta) > 0).astype(float)
    r = np.hypot(gx, gy)
    scene[(r > size/2 - 1) | (r < 2)] = 0.
    return scene


def _resample_psf(p, q, psf, pitch, size):
    """Resample a PSF given on the (p, q) image-plane grid onto a
    (size, size) grid of pixel `pitch`, centered, sum-normalized."""
    from scipy.interpolate import RegularGridInterpolator
    p = np.fft.fftshift(p)[:, 0]
    q = np.fft.fftshift(q)[0, :]
    z = np.fft.fftshift(psf)
    interp = RegularGridInterpolator((p, q), z, bounds_error=False,
                                     fill_value=0.)
    ax = (np.arange(size) - size//2)*pitch
    gx, gy = np.meshgrid(ax, ax, indexing="ij")
    out = interp(np.stack([gx, gy], axis=-1))
    # the pupil/PSF grids carry x on axis 0; scenes are (row=y,
    # col=x), so transpose into scene order
    out = out.T
    total = out.sum()
    if total <= 0:
        out = np.zeros_like(out)
        out[size//2, size//2] = 1.
        total = 1.
    return out/total


def field_psf(system, height, wavelength=None, nrays=1000,
              pitch=None, size=64, pad=4, resample=4):
    """(psf, vignetting) of the field point (0, height): the
    diffraction PSF resampled to `pitch` on a (size, size) grid and
    normalized to unit sum, plus the surviving-ray fraction."""
    from .trace.geometric import GeometricTrace
    t = GeometricTrace(system)
    t.rays_point((0., height), wavelength, nrays=nrays,
                 distribution="hexapolar", clip=True, filter=False)
    good = np.isfinite(t.y[-1][:, :2]).all(1)
    vign = good.mean()
    p, q, psf = t.psf(pad=pad, resample=resample)
    if pitch is None:
        pitch = abs(np.fft.fftshift(p)[1, 0] - np.fft.fftshift(p)[0, 0])
    return _resample_psf(p, q, psf, pitch, size), float(vign)


def simulate_image(system, scene, width, wavelength=None, npatches=3,
                   nrays=1000, psf_size=64, pad=4, resample=4,
                   vignetting=True):
    """Image of `scene` through the system.

    scene: (H, W) radiance sampled on the image plane (pixel pitch =
    width/W system length units), centered on the axis, rows spanning
    the y field.  The y-field is tiled into `npatches` patch rows
    (PSFs vary primarily with field height in a rotationally
    symmetric system); each patch's PSF comes from the matching
    fractional field height.  Returns the (H, W) simulated image.

    All patch convolutions execute as one vmapped FFT batch under
    jit.
    """
    scene = np.asarray(scene, dtype=float)
    H, W = scene.shape
    pitch = width/W
    # image half-height covered by the scene rows, as field fractions
    paraxial = system.paraxial
    img_height = abs(paraxial.height[1]) or width/2
    centers = (np.array([0.]) if npatches == 1
               else np.linspace(-1., 1., npatches))
    psfs = []
    vigns = []
    cache = {}  # mirrored field pairs share one PSF computation
    for c in centers:
        h = c*min(1., (width/2)/img_height) if img_height else 0.
        key = round(abs(h), 12)
        if key not in cache:
            cache[key] = field_psf(system, abs(h), wavelength,
                                   nrays=nrays, pitch=pitch,
                                   size=psf_size, pad=pad,
                                   resample=resample)
        psf, v = cache[key]
        if h < 0:
            psf = psf[::-1]  # mirror the PSF for the lower field (y)
        psfs.append(psf)
        vigns.append(v if vignetting else 1.)
    psfs = jnp.asarray(np.stack(psfs))
    vigns = jnp.asarray(np.array(vigns))

    # bilinear partition of unity over the patch rows
    rows = (np.arange(H) - H/2 + .5)/(H/2)  # -1..1
    weights = np.clip(1. - np.abs(
        rows[None, :] - centers[:, None])/(centers[1] - centers[0]
                                           if npatches > 1 else 1.),
        0., 1.)
    if npatches == 1:
        weights = np.ones((1, H))
    weights = weights/np.maximum(weights.sum(0, keepdims=True), 1e-12)
    weights = jnp.asarray(weights)

    @jax.jit
    def convolve(scene, psfs, vigns, weights):
        # f32: the TPU compiler rejects f64 FFTs (x64 is on by
        # default); single precision is ample for radiometry
        scene = scene.astype(jnp.float32)
        psfs = psfs.astype(jnp.float32)
        vigns = vigns.astype(jnp.float32)
        weights = weights.astype(jnp.float32)
        sf = jnp.fft.rfft2(scene, (H + psf_size, W + psf_size))

        def one(psf):
            # kernel center to the origin of the padded frame so the
            # convolution output aligns with the scene indexing
            kern = jnp.roll(jnp.pad(psf, ((0, H), (0, W))),
                            (-(psf_size//2), -(psf_size//2)), (0, 1))
            kf = jnp.fft.rfft2(kern)
            full = jnp.fft.irfft2(sf*kf, (H + psf_size, W + psf_size))
            return full[:H, :W]

        imgs = jax.vmap(one)(psfs)
        return (weights[:, :, None]*vigns[:, None, None]*imgs).sum(0)

    return np.asarray(convolve(jnp.asarray(scene), psfs, vigns,
                               weights))


def simulate_image_poly(system, scene, width, wavelengths=None,
                        weights=None, **kw):
    """Polychromatic image: the per-wavelength simulated images
    (each with its own dispersion-correct PSF set) combined with
    spectral weights.  scene may be (H, W) -- shared radiance across
    the bands -- or (H, W, B) per-band; returns (H, W) for a shared
    scene with scalar weighting, else (H, W, B)."""
    if wavelengths is None:
        wavelengths = system.wavelengths
    if weights is None:
        weights = np.ones(len(wavelengths))/len(wavelengths)
    scene = np.asarray(scene, dtype=float)
    per_band = scene.ndim == 3
    bands = []
    for b, lam in enumerate(wavelengths):
        sb = scene[..., b] if per_band else scene
        bands.append(simulate_image(system, sb, width,
                                    wavelength=lam, **kw))
    bands = np.stack(bands, axis=-1)
    if per_band:
        return bands*np.asarray(weights)
    return (bands*np.asarray(weights)).sum(-1)


def simulate_image_orders(system, scene, width, orders=None,
                          wavelengths=None, weights=None,
                          incidence_deg=0., cutoff=1e-4,
                          efficiency_model="scalar", **kw):
    """Efficiency-weighted per-order spectrograph image.

    Loops the traced diffraction order of the system's grating
    element over `orders`, simulates each (order, wavelength) image,
    weights it by the blaze efficiency eta_m(lambda) (see
    rayopt_tpu.gratings; an unblazed grating weights the requested
    orders equally) times the spectral weight, and sums.  Orders whose
    efficiency falls below `cutoff` are skipped.  The grating element
    is restored afterwards.  Returns the (H, W) image.

    efficiency_model: "scalar" (sinc^2 blaze) or "rcwa" (rigorous
    electromagnetic efficiencies, rayopt_tpu.rcwa).
    """
    from .gratings import order_weights
    gratings = [e for e in system
                if getattr(e, "grating_frequency", 0.)]
    if not gratings:
        raise ValueError("system has no grating element")
    gr = gratings[0]
    if orders is None:
        orders = (gr.grating_order,)
    if wavelengths is None:
        wavelengths = system.wavelengths
    if weights is None:
        weights = np.ones(len(wavelengths))/len(wavelengths)
    eta = order_weights(gr, wavelengths, orders, incidence_deg,
                        system.scale, model=efficiency_model)
    total = np.zeros(np.asarray(scene).shape[:2])
    orig = gr.grating_order
    try:
        for i, m in enumerate(orders):
            gr.grating_order = int(m)
            system.update()
            for b, lam in enumerate(wavelengths):
                w = float(weights[b])*float(eta[i, b])
                if w < cutoff:
                    continue
                total = total + w*simulate_image(
                    system, scene, width, wavelength=lam, **kw)
    finally:
        gr.grating_order = orig
        system.update()
    return total
