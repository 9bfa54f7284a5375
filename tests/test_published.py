"""External goldens: published prescriptions traced to their
PUBLISHED first-order data (vendor spec sheets, patent nominals,
textbook thick-lens formulas) -- numbers that did NOT originate in
this repo, hardening the parity claim (round-5 VERDICT task 8).

Every previous golden (Cooke EFL 49.85, radau-13 RMS 0.052, ...) is
either inherited from the reference's tests or self-generated; these
anchor against the literature directly.
"""

import numpy as np
import pytest
from numpy import testing as nptest

import rayopt_tpu as ro
from rayopt_tpu.models import (double_gauss, thorlabs_la1131,
                               thorlabs_la1509)

#: N-BK7 d-line index, Schott datasheet (external value)
N_BK7_D = 1.5168


@pytest.mark.parametrize("build,R,tc,f_pub,bfl_pub", [
    # Thorlabs spec sheets: (R, center thickness, f, BFL) in mm
    (thorlabs_la1131, 25.8, 5.3, 50.0, 46.3),
    (thorlabs_la1509, 51.5, 3.6, 100.0, 97.6),
])
def test_catalog_singlet_first_order(build, R, tc, f_pub, bfl_pub):
    """Catalog plano-convex singlets reproduce the vendor-published
    focal length and back focal length (1% = the catalog's own
    nominal-vs-exact rounding: the vendor rounds f to the design
    value R/(n-1) at slightly different n conventions)."""
    s = build()
    p = s.paraxial
    efl = float(p.focal_length[1])
    nptest.assert_allclose(efl, f_pub, rtol=1e-2)
    bfd = float(p.focal_distance[1])
    nptest.assert_allclose(bfd, bfl_pub, rtol=1e-2)
    # textbook thick-lens formulas as EXACT external truth (these are
    # mathematics, not catalog rounding): f = R/(n-1) for a
    # plano-convex, BFL = f (1 - tc (n-1)/(n R)) curved side first.
    # The lens sits in real air (n = 1.000277), so the formula takes
    # the RELATIVE index -- exactly the convention vendor catalogs
    # use for "design focal length"
    n_abs = s.refractive_index(587.56e-9, 1)
    nptest.assert_allclose(n_abs, N_BK7_D, atol=2e-4)
    n = n_abs/s.refractive_index(587.56e-9, 0)
    f_exact = R/(n - 1)
    nptest.assert_allclose(efl, f_exact, rtol=1e-9)
    bfl_exact = f_exact*(1 - tc*(n - 1)/(n*R))
    # the textbook formula assumes vacuum immersion; the real-air
    # model shifts the focal distance by exactly n_air - 1 = 2.8e-4
    nptest.assert_allclose(bfd, bfl_exact, rtol=5e-4)


def test_catalog_singlet_traces_to_published_focus():
    """A real-ray f/8 axial bundle through LA1131 focuses at the
    published BFL to a spot much smaller than the published
    diffraction-plus-spherical scale (sanity: the traced lens IS the
    catalog lens, not merely its paraxial model)."""
    s = thorlabs_la1131()
    g = ro.GeometricTrace(s)
    g.rays_point((0., 0.), nrays=16, distribution="radau",
                 filter=False)
    rms = float(g.rms())
    # f/8 aperture (6.35 mm semi-aperture at f=50): third-order
    # spherical blur of a plano-convex curved-side-first is ~15 um
    # RMS scale; assert the traced spot is in that published regime,
    # not at the paraxial zero nor wildly defocused
    assert 1e-4 < rms < 5e-2


def test_double_gauss_patent_first_order():
    """The flagship double Gauss is the published US2532751-type
    design (the textbook/OpticStudio "Double Gauss 28 degree field"
    sample): PUBLISHED EFL 99.5 mm at ~f/3, 28 deg full field.  Pin
    the traced first order against the published values, not against
    this repo's own output."""
    s = double_gauss()
    p = s.paraxial
    efl = float(p.focal_length[1])
    nptest.assert_allclose(efl, 99.5, rtol=5e-3)
    # entrance pupil 33.4 mm -> f/# ~ 3.0 (published sample aperture)
    fno = efl/(2*s.object.pupil.radius)
    nptest.assert_allclose(fno, 3.0, rtol=2e-2)
    # 28 degree full field by construction of the published design
    nptest.assert_allclose(np.rad2deg(s.object.angle), 14.0,
                           atol=1e-9)


def test_double_gauss_patent_distortion_scale():
    """Published double-Gauss designs of this family hold distortion
    to ~ |2|% at full field -- a literature-scale envelope check on
    the traced real-ray distortion."""
    s = double_gauss()
    g = ro.GeometricTrace(s)
    g.rays_point((0., 1.), nrays=3, distribution="cross",
                 filter=False, clip=False)
    # chief-ray landing vs paraxial image height
    p = s.paraxial
    y_parax = float(p.height[1])
    y_real = float(g.y[-1, g.ref, 1])
    distortion = (y_real - y_parax)/y_parax
    assert abs(distortion) < 0.02
