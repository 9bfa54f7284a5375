"""Extended-scene image simulation: PSF placement, energy
conservation, and blur behavior."""

import pytest
import numpy as np
from numpy import testing as nptest

import rayopt_tpu as ro
from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.imaging import simulate_image, field_psf


def _focused_cooke():
    s = cooke_triplet()
    t = ro.GeometricTrace(s)
    t.rays_point((0, 0.), nrays=13, distribution="radau",
                 clip=False, filter=False)
    t.refocus()
    return s


def test_delta_scene_reproduces_psf():
    s = _focused_cooke()
    H = W = 128
    scene = np.zeros((H, W))
    scene[H//2, W//2] = 1.
    img = simulate_image(s, scene, 2., npatches=3, nrays=400,
                         psf_size=64)
    peak = np.unravel_index(np.argmax(img), img.shape)
    assert abs(peak[0] - H//2) <= 1 and abs(peak[1] - W//2) <= 1
    nptest.assert_allclose(img.sum(), 1., rtol=.02)
    # compare against the directly sampled on-axis PSF
    psf, v = field_psf(s, 0., nrays=400, pitch=2./W, size=64)
    lo = H//2 - 32
    block = img[lo:lo + 64, lo:lo + 64]
    corr = (block*psf).sum()/np.sqrt((block**2).sum()*(psf**2).sum())
    assert corr > .95


def test_uniform_scene_stays_uniform():
    s = _focused_cooke()
    H = W = 96
    img = simulate_image(s, np.ones((H, W)), 1.5, npatches=3,
                         nrays=400, psf_size=48, vignetting=False)
    inner = img[24:-24, 24:-24]
    nptest.assert_allclose(inner, 1., rtol=1e-6)


def test_defocus_blurs():
    """Shifting the image plane spreads the simulated point image."""
    H = W = 96
    scene = np.zeros((H, W))
    scene[H//2, W//2] = 1.

    def spread(s):
        img = simulate_image(s, scene, 1., npatches=1, nrays=400,
                             psf_size=64)
        ax = (np.arange(H) - H//2)
        gx, gy = np.meshgrid(ax, ax, indexing="ij")
        return ((gx**2 + gy**2)*img).sum()/img.sum()

    focused = _focused_cooke()
    blurred = _focused_cooke()
    blurred[-1].distance += .5
    assert spread(blurred) > 2*spread(focused)


def test_offaxis_smear_lands_on_y():
    """At the field edge the Cooke triplet's PSF elongates
    tangentially (y); the simulated image must smear along scene
    rows (y), not columns."""
    s = _focused_cooke()
    H = W = 96
    scene = np.zeros((H, W))
    scene[H//4, W//2] = 1.  # off-axis point (upper field)
    img = simulate_image(s, scene, 2., npatches=3, nrays=400,
                         psf_size=64)
    ys, xs = np.mgrid[:H, :W]
    m = img/img.sum()
    cy = (ys*m).sum()
    cx = (xs*m).sum()
    var_y = (((ys - cy)**2)*m).sum()
    var_x = (((xs - cx)**2)*m).sum()
    assert var_y > 1.5*var_x


def test_single_patch_uses_center_field():
    """npatches=1 blurs with the on-axis PSF, not the field edge."""
    s = _focused_cooke()
    H = W = 64
    scene = np.zeros((H, W))
    scene[H//2, W//2] = 1.
    one = simulate_image(s, scene, 1., npatches=1, nrays=400,
                         psf_size=48)
    from rayopt_tpu.imaging import field_psf
    psf0, _ = field_psf(s, 0., nrays=400, pitch=1./W, size=48)
    lo = H//2 - 24
    block = one[lo:lo + 48, lo:lo + 48]
    corr = (block*psf0).sum()/np.sqrt(
        (block**2).sum()*(psf0**2).sum())
    assert corr > .99


@pytest.mark.slow
def test_analysis_image_panel():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from rayopt_tpu import Analysis
    from rayopt_tpu.imaging import star_target
    s = _focused_cooke()
    a = Analysis(s, print=False, plot_image=True, defocus=3,
                 image_scene=star_target(64, 12))
    assert len(a.figures) == 6
    # the panel figure holds the scene/image pair
    assert len(a.figures[-1].axes) == 2
    plt.close("all")


def test_polychromatic_image():
    """Per-band images use their own dispersion; equal-weight sum of
    a shared scene matches the average of single-band runs."""
    from rayopt_tpu.imaging import simulate_image_poly
    s = _focused_cooke()
    H = W = 64
    scene = np.zeros((H, W))
    scene[H//2, W//2] = 1.
    poly = simulate_image_poly(s, scene, 1., npatches=1, nrays=300,
                               psf_size=48)
    singles = [simulate_image(s, scene, 1., wavelength=lam,
                              npatches=1, nrays=300, psf_size=48)
               for lam in s.wavelengths]
    nptest.assert_allclose(poly, np.mean(singles, axis=0),
                           rtol=1e-6, atol=1e-12)
    # chromatic blur: the bands genuinely differ
    assert np.abs(singles[1] - singles[2]).max() > 1e-6
    # per-band scene shape
    rgb = np.stack([scene]*3, axis=-1)
    out = simulate_image_poly(s, rgb, 1., npatches=1, nrays=300,
                              psf_size=48)
    assert out.shape == (H, W, 3)
