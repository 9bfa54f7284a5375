"""Physical-optics propagation: the band-limited angular-spectrum
propagator against the analytic Gaussian-beam oracle (and the
GaussianTrace ABCD machinery), energy conservation, thin-lens
focusing, and the ray-traced pupil phase screen."""

import numpy as np
from numpy import testing as nptest

import rayopt_tpu as ro
from rayopt_tpu import physical as ph

LAM = 632.8e-9
W0 = .25        # mm
SHAPE = (256, 256)
PITCH = .02     # mm -> 5.12 mm window


def _zr():
    return np.pi*W0**2/(LAM/1e-3)


def test_gaussian_free_space_matches_analytic():
    """Numerically propagated Gaussian beam width matches
    w(z) = w0 sqrt(1 + (z/zr)^2) to a fraction of a percent."""
    f = ph.gaussian_field(SHAPE, PITCH, W0, LAM)
    nptest.assert_allclose(ph.beam_radius(f, PITCH), W0, rtol=5e-3)
    zr = _zr()
    for z in (0.5*zr, zr, 2*zr):
        out = ph.propagate_angular_spectrum(f, PITCH, z, LAM)
        want = W0*np.sqrt(1 + (z/zr)**2)
        nptest.assert_allclose(ph.beam_radius(out, PITCH), want,
                               rtol=5e-3)
        # energy conserved (band-limited propagation, no aperture)
        nptest.assert_allclose(ph.field_power(out, PITCH),
                               ph.field_power(f, PITCH), rtol=1e-5)


def test_analytic_seed_at_offset_matches_propagation():
    """gaussian_field(z=z0) equals gaussian_field(0) propagated by
    z0 -- amplitude profile and second moment."""
    zr = _zr()
    z0 = .7*zr
    seeded = ph.gaussian_field(SHAPE, PITCH, W0, LAM, z=z0)
    propagated = ph.propagate_angular_spectrum(
        ph.gaussian_field(SHAPE, PITCH, W0, LAM), PITCH, z0, LAM)
    nptest.assert_allclose(ph.beam_radius(seeded, PITCH),
                           ph.beam_radius(propagated, PITCH),
                           rtol=5e-3)
    a = np.abs(np.asarray(seeded))
    b = np.abs(np.asarray(propagated))
    assert np.abs(a - b).max() < .02*b.max()


def test_thin_lens_focuses_like_gaussian_trace():
    """Collimated beam through a thin lens: the converging beam's
    width along the caustic matches the gaussian-beam lens formulas
    (the same physics GaussianTrace's ABCD carries).  The width is
    sampled midway to focus, where the beam spans many pixels (the
    waist itself is ~2 px; its exact size is grid-limited)."""
    fl = 150.  # mm
    w_in = .8
    pitch = .02
    shape = (512, 512)
    field = ph.gaussian_field(shape, pitch, w_in, LAM)
    field = field*ph.thin_lens_phase(shape, pitch, fl, LAM)
    zr_in = np.pi*w_in**2/(LAM/1e-3)
    t = fl/zr_in
    z_w = fl/(1 + t*t)              # waist position after the lens
    w_f = w_in*t/np.sqrt(1 + t*t)   # focused waist size
    zr_f = np.pi*w_f**2/(LAM/1e-3)
    for z in (z_w/3, 2*z_w/3):
        out = ph.propagate_angular_spectrum(field, pitch, z, LAM)
        want = w_f*np.sqrt(1 + ((z - z_w)/zr_f)**2)
        nptest.assert_allclose(ph.beam_radius(out, pitch), want,
                               rtol=3e-2)
    # near focus the beam is far smaller than at the lens
    at_focus = ph.propagate_angular_spectrum(field, pitch, z_w, LAM)
    assert ph.beam_radius(at_focus, pitch) < .1*w_in


def test_aperture_diffraction_spreads():
    """Hard aperture clips power and far-field spreads beyond the
    geometric shadow."""
    f = ph.gaussian_field(SHAPE, PITCH, W0, LAM)
    mask = ph.circular_aperture(SHAPE, PITCH, W0/2)
    clipped = f*mask
    p0, p1 = ph.field_power(f, PITCH), ph.field_power(clipped, PITCH)
    assert .2 < p1/p0 < .7
    far = ph.propagate_angular_spectrum(clipped, PITCH, 4*_zr(), LAM)
    assert ph.beam_radius(far, PITCH) > ph.beam_radius(clipped, PITCH)


def test_pupil_phase_screen_from_trace():
    """The ray-traced pupil screen of the Cooke triplet: amplitude
    marks the pupil, on-axis phase is smooth and spans the expected
    aberration scale (fraction of a wave after refocus)."""
    from rayopt_tpu.models import cooke_triplet
    s = cooke_triplet()
    s.paraxial.refocus()
    s.update()
    shape = (96, 96)
    pitch = .15
    screen = np.asarray(ph.pupil_phase_screen(s, shape, pitch,
                                              field=(0., 0.),
                                              nrays=600))
    amp = np.abs(screen)
    assert amp.max() > .99
    inside = amp > .5
    assert .05 < inside.mean() < .9
    phase = np.angle(screen[inside])
    # on-axis Cooke after refocus: sub-wave wavefront error
    spread = np.ptp(np.unwrap(np.sort(phase)))
    assert spread < 2*np.pi*1.5
