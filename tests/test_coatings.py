"""Thin-film coating stacks and their polarization-trace hookup."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu.coatings import (
    CoatingStack, quarter_wave, stack_coefficients)
from rayopt_tpu.polarization import (
    PolarizationTrace, fresnel_coefficients)
from rayopt_tpu.models import doublet

LAM = 550e-9


def test_empty_stack_is_bare_fresnel():
    ci = np.cos(np.deg2rad(35.))
    bare = fresnel_coefficients(1., 1.52, ci)[:4]
    empty = stack_coefficients([], 1., 1.52, ci, LAM)
    for got, want in zip(empty, bare):
        nptest.assert_allclose(complex(np.asarray(got)),
                               complex(np.asarray(want)), rtol=1e-12)


def test_single_layer_ar_analytic():
    """lambda/4 MgF2 on BK7: R = ((n0 ns - n1^2)/(n0 ns + n1^2))^2."""
    qw = quarter_wave(1.38, LAM)
    got = float(np.asarray(qw.reflectance(1., 1.52, 1., LAM)))
    n1 = 1.38
    want = ((1.52 - n1*n1)/(1.52 + n1*n1))**2
    nptest.assert_allclose(got, want, rtol=1e-12)
    # and it actually anti-reflects vs the bare 4.3% interface
    assert got < .015


def test_quarter_wave_stack_high_reflector():
    hr = quarter_wave([2.35, 1.38], LAM, n_layers=16)
    R = float(np.asarray(hr.reflectance(1., 1.52, 1., LAM)))
    assert R > .999


def test_lossless_energy_conservation():
    qw = quarter_wave(1.38, LAM)
    for deg in (0., 20., 45.):
        ci = np.cos(np.deg2rad(deg))
        R = float(np.asarray(qw.reflectance(1., 1.52, ci, LAM)))
        T = float(np.asarray(qw.transmittance(1., 1.52, ci, LAM)))
        nptest.assert_allclose(R + T, 1., rtol=1e-12)


def test_absorbing_layer_loses_energy():
    metal = CoatingStack([(0.5 + 3.1j, 20e-9)], "thin silver")
    ci = 1.
    R = float(np.asarray(metal.reflectance(1., 1.52, ci, LAM)))
    T = float(np.asarray(metal.transmittance(1., 1.52, ci, LAM)))
    assert 0 < R < 1 and 0 < T < 1
    assert R + T < .999  # absorption


def test_coated_doublet_transmittance_rises():
    """AR-coating every glass interface lifts the traced unpolarized
    throughput accordingly."""
    s = doublet()
    lam = s.wavelengths[0]
    plain = PolarizationTrace(s, nrays=16)
    mu = np.asarray(s.table().mu)
    coat = {int(k): quarter_wave(1.38, lam)
            for k in np.flatnonzero(mu != 1.)}
    coated = PolarizationTrace(s, nrays=16, coatings=coat)
    ref = plain.geometric.ref
    t0 = plain.transmittance[ref]
    t1 = coated.transmittance[ref]
    assert t1 > t0 + .01
    # axial ray oracle: product of single-interface transmittances
    want = 1.
    nb = np.abs(np.asarray(s.table().n_before))
    na = np.abs(np.asarray(s.table().n_after))
    for k in np.flatnonzero(mu != 1.):
        want *= float(np.asarray(coat[int(k)].transmittance(
            nb[k], na[k], 1., lam)))
    nptest.assert_allclose(t1, want, rtol=1e-9)


def test_dispersive_coating_material_layers():
    """A layer given as a Material evaluates its dispersion at the
    trace wavelength: the quarter-wave condition only holds at the
    design line, so reflectance differs across wavelengths."""
    from rayopt_tpu.materials import Material
    glass = Material.make("SCHOTT-SK/N-SK16")
    qw = CoatingStack([(glass, LAM/(4*glass.refractive_index(LAM)))],
                      "dispersive")
    r_design = float(np.asarray(qw.reflectance(1., 1.9, 1., LAM)))
    r_off = float(np.asarray(qw.reflectance(1., 1.9, 1., 450e-9)))
    assert abs(r_design - r_off) > 1e-5
    # constant-index twin agrees at the design wavelength
    fixed = CoatingStack(
        [(glass.refractive_index(LAM),
          LAM/(4*glass.refractive_index(LAM)))], "fixed")
    r_fixed = float(np.asarray(fixed.reflectance(1., 1.9, 1., LAM)))
    nptest.assert_allclose(r_design, r_fixed, rtol=1e-12)
