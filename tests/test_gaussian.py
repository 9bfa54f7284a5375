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
