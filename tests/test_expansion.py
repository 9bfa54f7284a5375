"""AD transverse aberration expansion (expansion.py): classical
Seidel cross-pins on the Cooke golden, exact v^5 model convergence,
and anamorphic coverage beyond the classical formulas' reach
(reference elements.py:556-587 is rotationally-symmetric only)."""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.expansion import (
    TransverseExpansion, ChromaticExpansion, _launcher)

from test_raytrace import COOKE


@pytest.fixture(scope="module")
def cooke_exp():
    s = ro.system_from_yaml(COOKE)
    s.update()
    return s, TransverseExpansion(s)


def test_classical_seidel_crosspins(cooke_exp):
    """The AD third-order sums reproduce the classical per-surface
    Seidel accumulation (trace/paraxial.py transverse3) through the
    standard identities: TSC = spherical, CC = sagittal coma,
    TAC = (tangential - sagittal astigmatic split)/2,
    sagittal field curvature = TPC + TAC, DC = distortion."""
    s, e = cooke_exp
    tsc, cc, tac, tpc, dc = np.asarray(s.paraxial.transverse3).sum(0)[:5]
    c = e.seidel_like()
    nptest.assert_allclose(c["spherical"], tsc, rtol=2e-3)
    nptest.assert_allclose(c["coma_sagittal"], cc, rtol=1e-2)
    nptest.assert_allclose(
        c["coma_tangential"]/c["coma_sagittal"], 3., rtol=3e-3)
    nptest.assert_allclose(c["astigmatism"]/2., tac, rtol=2e-3)
    nptest.assert_allclose(
        c["sagittal_field_curv"], tpc + tac, rtol=2e-3)
    nptest.assert_allclose(c["distortion"], dc, rtol=1e-2)
    # rotational symmetry: x and y marginal spherical identical,
    # quadratic jet exactly zero
    nptest.assert_allclose(c["spherical_x"], c["spherical"], rtol=1e-12)
    assert abs(e.j2).max() == 0.


def test_cubic_model_converges_v5(cooke_exp):
    """The cubic model's residual against the real ray shrinks as v^5
    (factor 32 per halving) -- the expansion is the exact Taylor jet,
    not a fit."""
    s, e = cooke_exp
    f = _launcher(s, s.wavelengths[0])
    v = np.array([.3, .2, .1, .4])
    errs = []
    for scale in (.2, .1, .05):
        vv = v*scale
        errs.append(abs(np.asarray(f(vv)) - e.evaluate(vv)).max())
    nptest.assert_allclose(errs[0]/errs[1], 32., rtol=.05)
    nptest.assert_allclose(errs[1]/errs[2], 32., rtol=.05)


@pytest.mark.slow
def test_anamorphic_expansion():
    """A cylinder system (no classical Seidel available -- the
    classical path uses only the y-axis figure) gets a full third-
    order table from AD: x/y marginal spherical differ, and the
    cubic model still predicts real rays to O(v^5)."""
    s = ro.System([
        dict(material="air"),
        dict(type="biconic", roc=40., curvature_x=1/55.,
             distance=4., material="1.51680/64.17", radius=8.),
        dict(type="biconic", roc=-40., curvature_x=-1/55.,
             distance=3., material="air", radius=8.),
        dict(distance=45., radius=8.),
    ])
    s.object.angle_deg = 2.
    s.object.pupil.radius = 3.
    s.object.pupil.update_radius = False
    s.update()
    e = TransverseExpansion(s)
    c = e.seidel_like()
    assert abs(c["spherical_x"] - c["spherical"]) > 1e-4*abs(c["spherical"])
    f = _launcher(s, s.wavelengths[0])
    v = np.array([.25, .35, 0., .3])
    errs = [abs(np.asarray(f(v*sc)) - e.evaluate(v*sc)).max()
            for sc in (.2, .1)]
    nptest.assert_allclose(errs[0]/errs[1], 32., rtol=.08)


@pytest.mark.slow
def test_fifth_order_expansion():
    """order=5 jets: the model matches real rays to O(v^7) (ratio 128
    per halving), even jets vanish by rotational-parity symmetry, and
    the named fifth-order terms are populated.  (Eager jet build --
    the 5-deep nested jacfwd is minutes of host work; a singlet keeps
    it to ~2 min.  The same machinery runs on anamorphic/tilted
    systems where no classical fifth-order theory exists.)"""
    s = ro.System([
        dict(material="air"),
        dict(roc=35., distance=4., material="1.51680/64.17",
             radius=9.),
        dict(roc=-35., distance=3., material="air", radius=9.),
        dict(distance=40., radius=9.),
    ])
    s.object.angle_deg = 2.
    s.object.pupil.radius = 4.
    s.object.pupil.update_radius = False
    s.update()
    e = TransverseExpansion(s, order=5)
    assert abs(e.j4).max() == 0.            # parity: even jets vanish
    f = _launcher(s, s.wavelengths[0])
    v = np.array([.3, .25, 0., .35])
    errs = [abs(np.asarray(f(v*sc)) - e.evaluate(v*sc)).max()
            for sc in (.4, .2, .1)]
    nptest.assert_allclose(errs[0]/errs[1], 128., rtol=.06)
    nptest.assert_allclose(errs[1]/errs[2], 128., rtol=.06)
    c5 = e.fifth_order()
    nptest.assert_allclose(c5["spherical5"], -3.6708e-3, rtol=1e-3)
    assert abs(c5["coma5_tangential"]) > 0.
    # degree-5 monomial table is populated and symmetric in x/y
    nptest.assert_allclose(e.coefficient("x", *["px"]*5),
                           c5["spherical5"], rtol=1e-10)


@pytest.fixture(scope="module")
def cooke_chrom(cooke_exp):
    s, _ = cooke_exp
    return s, ChromaticExpansion(s)


@pytest.mark.slow
def test_chromatic_model_matches_real_differences(cooke_chrom):
    """The w-model's chromatic DIFFERENCE (color minus reference,
    which cancels the shared monochromatic cubic truncation) matches
    frozen-launcher real-ray differences across the band to ~1%."""
    s, ce = cooke_chrom
    lam0, bw = ce.wavelength, ce.bandwidth
    v = np.array([0., .8, 0., .5])*0.25
    f0 = np.asarray(_launcher(s, lam0)(v))
    for w in (0.4, -0.6):
        truth = np.asarray(_launcher(s, lam0 + w*bw)(v)) - f0
        model = ce.evaluate(v, w) - ce.evaluate(v, 0.)
        nptest.assert_allclose(model[1], truth[1], rtol=2e-2)


@pytest.mark.slow
def test_classical_chromatic_crosspins(cooke_chrom):
    """Band-edge (blue minus red) jet differences reproduce the
    classical paraxial axial/lateral chromatic sums (transverse3
    columns 5/6, reference elements.py:584) -- the classical values
    are first-order in delta-n, so a few %% is the theory gap, not
    noise.  The w-model's first derivatives agree with the band-edge
    secants to the secondary-spectrum correction."""
    s, ce = cooke_chrom
    blue, red = min(s.wavelengths), max(s.wavelengths)
    eb = TransverseExpansion(s, blue)
    er = TransverseExpansion(s, red)
    dj = eb.j1 - er.j1
    t3 = np.asarray(s.paraxial.transverse3).sum(0)
    nptest.assert_allclose(dj[1, 1], t3[5], rtol=.06)   # axial
    nptest.assert_allclose(dj[1, 3], t3[6], rtol=.02)   # lateral
    c = ce.chromatic()
    # first-order part carries the right sign and scale vs the
    # band-edge secant (which folds in the 2nd/3rd-order spectrum)
    wb, wr = (blue - ce.wavelength)/ce.bandwidth, \
        (red - ce.wavelength)/ce.bandwidth
    nptest.assert_allclose(c["axial_color"]*(wb - wr), dj[1, 1],
                           rtol=.35)
    nptest.assert_allclose(c["lateral_color"]*(wb - wr), dj[1, 3],
                           rtol=.2)
    # secondary spectrum exists for a non-achromatized triplet band
    assert abs(c["axial_color_2nd"]) > 1e-4


@pytest.mark.slow
def test_grating_dispersion_pin():
    """A plane transmission grating's AD `dispersion` coefficient
    matches the analytic derivative of the grating equation:
    y = d tan(theta), sin(theta) = m G lambda, so dy/dw =
    d sec^3(theta) m G bandwidth (in system units)."""
    rows = [dict(material="air"),
            dict(type="grating", grating_frequency=600.,
                 grating_order=1, distance=20., material="air",
                 radius=30.),
            dict(distance=50., radius=100.)]
    g = ro.System(rows, wavelengths=[500e-9, 480e-9, 520e-9])
    g.object.pupil.radius = 5.
    g.object.pupil.update_radius = False
    g.update()
    cg = ChromaticExpansion(g)
    sin_t = 600.*500e-9/g.scale
    expect = 50.*(1 - sin_t**2)**-1.5*600.*(cg.bandwidth/g.scale)
    got = cg.chromatic()
    nptest.assert_allclose(got["dispersion"], expect, rtol=1e-3)
    # sec^3 steepening: second-order dispersion is positive
    assert got["dispersion_2nd"] > 0.
    assert got["dispersion_x"] == 0.
