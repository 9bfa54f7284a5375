"""Hardcoded golden numbers for the model zoo (the pattern of
reference test_poly.py:62-89): first-order properties and transverse
third-order (Seidel + chromatic) sums pinned to fixed vectors so the
trace-engine internals can be rewritten or optimized without silent
drift.  Values were produced by this implementation and cross-checked
against the paraxial/Seidel physics (Cooke numbers also match the OSLO
example the prescription comes from)."""

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.models import cooke_triplet, double_gauss, petzval


@pytest.fixture(scope="module")
def gauss():
    return double_gauss().paraxial


@pytest.fixture(scope="module")
def petz():
    return petzval().paraxial


def test_double_gauss_first_order(gauss):
    # round-5: the flagship is now the PUBLISHED US2532751-type
    # sample (EFL 99.5; tests/test_published.py pins the literature
    # values); these are the regenerated self-consistency goldens
    p = gauss
    nptest.assert_allclose(p.focal_length, [-99.56245406, 99.56245406],
                           rtol=1e-8)
    nptest.assert_allclose(p.working_f_number[1], 3.02255441, rtol=1e-7)
    nptest.assert_allclose(p.numerical_aperture[1], 0.16546885,
                           rtol=1e-6)
    nptest.assert_allclose(p.pupil_distance,
                           [58.92036222, -50.72494333], rtol=1e-7)
    nptest.assert_allclose(p.pupil_height, [16.7, 18.1658159],
                           rtol=1e-7)
    nptest.assert_allclose(p.lagrange, -4.164931742, rtol=1e-8)


def test_double_gauss_seidel_sums(gauss):
    # SA3 CMA3 AST3 PTZ3 DIS3 TACHC TCHC, transverse, OSLO scaling
    nptest.assert_allclose(
        gauss.transverse3.sum(0),
        [-0.07557316, 0.01136717, 0.02113808, -0.0826938,
         -0.18152228, -0.00404807, 0.01799245], rtol=1e-5)


def test_petzval_first_order(petz):
    p = petz
    nptest.assert_allclose(p.focal_length, [-82.14826746, 82.14826746],
                           rtol=1e-8)
    nptest.assert_allclose(p.working_f_number[1], 3.32375399, rtol=1e-7)
    nptest.assert_allclose(p.pupil_distance,
                           [7.2894326, -36.03767947], rtol=1e-7)
    nptest.assert_allclose(p.lagrange, -1.5352324212, rtol=1e-8)


def test_petzval_seidel_sums(petz):
    nptest.assert_allclose(
        petz.transverse3.sum(0),
        [0.07710752, 0.03964621, -0.09436252, -0.08962473,
         -0.03100777, 0.03073426, 0.04631249], rtol=1e-5)


def test_cooke_seidel_sums():
    p = cooke_triplet().paraxial
    nptest.assert_allclose(
        p.transverse3.sum(0),
        [-0.06190225, -0.00817398, 0.06232948, -0.1416536,
         0.05831643, -0.01051561, -0.00939998], rtol=1e-5)


def test_spectrometer_golden():
    """Concave-grating spectrograph model: detector line positions
    pinned (600 lp/mm, R=-400 mirror, order 1; grating equation +
    substrate focusing together)."""
    from rayopt_tpu.models import spectrograph
    s = spectrograph()
    want = [-56.06593593485528, -69.89487421806105,
            -84.67998616743552]
    for lam, w in zip(s.wavelengths, want):
        ys = s.trace_table(np.zeros((1, 3)),
                           np.array([[0., 0., 1.]]), lam)[0]
        nptest.assert_allclose(ys[-1, 0, 1], w, rtol=1e-9)


def test_beam_expander_golden():
    """Afocal expander: solved separation and angular magnification
    pinned."""
    from rayopt_tpu.models import beam_expander
    s = beam_expander()
    nptest.assert_allclose(s[3].distance, 145.50580145643673,
                           rtol=1e-9)
    nptest.assert_allclose(s.paraxial.magnification[1], -.5,
                           rtol=1e-9)


def test_ar_coating_golden():
    """Quarter-wave MgF2 on BK7 at 35 degrees: unpolarized
    reflectance pinned (characteristic-matrix stack)."""
    from rayopt_tpu.coatings import quarter_wave
    qw = quarter_wave(1.38, 550e-9)
    got = float(np.asarray(qw.reflectance(
        1., 1.52, np.cos(np.deg2rad(35.)), 550e-9)))
    nptest.assert_allclose(got, 0.015035208393915478, rtol=1e-12)
