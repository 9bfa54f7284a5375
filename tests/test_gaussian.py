"""Gaussian beam / resonator tests (symplectic checks, stability,
waist solves; mirrors the assertions built into reference
gaussian_trace.py:67,120,201)."""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.models import hene_cavity, cooke_triplet


@pytest.fixture
def cavity():
    return hene_cavity()


def test_stability(cavity):
    g = ro.GaussianTrace(cavity)
    # g1*g2 = 1*(1 - 200/300) = 1/3 in [0, 1] -> stable;
    # m = Tr(M)/2 = 2*g1*g2 - 1 = -1/3 per round trip convention
    assert g.stable.all()
    nptest.assert_allclose(np.abs(g.m), 1./3, rtol=1e-12)


def test_symplectic(cavity):
    g = ro.GaussianTrace(cavity)
    g.is_proper()  # Nemes checks assert internally


def test_eigenmode_selfconsistent(cavity):
    g = ro.GaussianTrace(cavity)
    q = g.eigenmodes
    assert q.shape[0] == 2
    # the physical eigenmode reproduces itself after a round trip
    n, m = cavity.paraxial_matrix(g.wavelength)
    for mode in range(2):
        for axis in range(2):
            a, b, c, d = m[axis::2, axis::2].flat
            qi = 1/q[mode, axis, axis]
            q1 = (a*qi + b)/(c*qi + d)
            nptest.assert_allclose(q1, qi, rtol=1e-9)


def test_waist_at_flat_mirror(cavity):
    # flat output coupler forces the cavity waist onto that mirror:
    # the eigenmode q at the flat mirror is purely imaginary with
    # Rayleigh range z0 = sqrt(L(R - L))
    g = ro.GaussianTrace(cavity)
    q = 1/np.diag(g.eigenmodes[0])  # q itself, per axis
    L, R = 200., 600.
    z0 = np.sqrt(L*(R - L))
    i = np.argmin(np.abs(q.imag - z0) + np.abs(q.real))
    nptest.assert_allclose(abs(q[i].imag), z0, rtol=1e-9)
    nptest.assert_allclose(q[i].real, 0, atol=1e-6)


def test_imaging_system_beam():
    s = cooke_triplet()
    g = ro.GaussianTrace(s)
    assert np.isfinite(g.spot_radius[1:]).all()
    assert np.isfinite(g.waist_position).all()
    list(g.print_trace())
    g.spot_radius_at(z=np.linspace(1, 50, 7))


def test_resize_refocus():
    s = cooke_triplet()
    g = ro.GaussianTrace(s)
    g.resize(waists=2)
    assert all(e.radius > 0 for e in s[1:])


def test_qi_complete_round_trips_a_propagated_waist():
    """make_complete rebuilt from the spot/curvature readout of a
    propagated simple-astigmatic beam reproduces that beam's qi."""
    from rayopt_tpu.trace.gaussian import (
        qi_from_waist, qi_propagate_free, qi_complete, to_principal)
    lam, n, scale = 587e-9, 1., 1e-3
    qi0 = qi_from_waist(lam, n, (.4, .9), scale=scale)[None]
    dz = 700.
    qi1 = qi_propagate_free(qi0, dz/n)[0]
    # read the beam out the way a measurement would
    (ispot, iang) = to_principal(-qi1.imag[None])
    (icur, cang) = to_principal(qi1.real[None])
    spot = np.sqrt(lam/(np.pi*scale)/ispot[0])
    curv = n/icur[0]
    rebuilt = qi_complete(lam, n, spot, curv, spot_angle=iang[0],
                          curvature_angle=cang[0], scale=scale)
    np.testing.assert_allclose(rebuilt, qi1, rtol=1e-12, atol=1e-15)


def test_general_astigmatism_detector():
    from rayopt_tpu.trace.gaussian import (
        qi_complete, is_general_astigmatic)
    lam = 633e-9
    simple = qi_complete(lam, 1., (.3, .5), (900., 1200.),
                         spot_angle=.3)
    assert not is_general_astigmatic(simple)
    angled = qi_complete(lam, 1., (.3, .5), (900., 1200.),
                         spot_angle=.3, curvature_angle=.9)
    assert is_general_astigmatic(angled)


def test_make_complete_traces():
    """A general-astigmatic input beam propagates through a system
    and stays symmetric with positive spot radii."""
    from rayopt_tpu.models import doublet
    from rayopt_tpu import GaussianTrace
    s = doublet()
    t = GaussianTrace(s)
    qi = t.make_complete((.5, .8), (1500., 2100.), spot_angle=.2,
                         curvature_angle=.55)
    t.rays(qi=qi)
    t.propagate()
    assert t.general_astigmatic[0]
    for q in t.qi:
        np.testing.assert_allclose(q, q.T, atol=1e-12)
    assert np.isfinite(t.spot_radius).all() and (t.spot_radius > 0).all()
