"""Forbes Qcon aspheres (utils/qpoly.py + elements.ForbesQcon).

No reference counterpart; pinned against scipy's Jacobi polynomials
(the published basis definition), exactness of the power-series
lowering, and equivalence with a hand-converted Spheroid through the
trace engines.
"""

import numpy as np
import numpy.testing as nptest
import pytest
from scipy.special import eval_jacobi

import rayopt_tpu as ro
from rayopt_tpu.utils.qpoly import (qcon_eval, qcon_to_even_aspherics,
                                    _jacobi04_xpoly)
from rayopt_tpu.ops.geometric import trace_rays_final


def test_basis_matches_scipy():
    u2 = np.linspace(0., 1., 33)
    for m in range(11):
        row = _jacobi04_xpoly(m)[m]
        mine = np.polynomial.polynomial.polyval(u2, row)
        ref = eval_jacobi(m, 0., 4., 2*u2 - 1)
        rel = np.abs(mine - ref).max()/np.abs(ref).max()
        assert rel < 1e-11, (m, rel)


def test_conversion_is_exact():
    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, 7)*1e-3
    R = 7.3
    r = rng.uniform(0, R, 64)
    dep = qcon_eval(a, (r/R)**2)
    asp = qcon_to_even_aspherics(a, R)
    assert asp[0] == 0.          # no r^2 content: power untouched
    ps = sum(c*r**(2*i + 2) for i, c in enumerate(asp))
    nptest.assert_allclose(ps, dep, atol=1e-12*abs(dep).max())
    assert qcon_to_even_aspherics([]) == []


def q_system(base=None):
    s = ro.System([
        dict(material="air"),
        dict(type="qcon", roc=45., conic=-.6, distance=5.,
             material="1.51680/64.17", radius=9.,
             q_coefficients=[2e-4, -1e-4, 5e-5], norm_radius=9.,
             **({"aspherics": base} if base else {})),
        dict(roc=-80., distance=3., material="air", radius=9.),
        dict(distance=40., radius=9.),
    ], wavelengths=[550e-9], object=dict(
        angle_deg=1., pupil=dict(radius=4., update_radius=False)))
    s.update()
    return s


def test_element_sag_and_trace_equivalence():
    s = q_system()
    e = s[1]
    # sag = conic + departure, checked against the direct Q evaluation
    r = np.linspace(0., 8., 17)
    xyz = np.stack([r, 0*r, 0*r], -1)
    c, k = e.curvature, e.conic
    conic_sag = c*r**2/(1 + np.sqrt(1 - (1 + k)*c*c*r**2))
    dep = qcon_eval(e.q_coefficients, (r/e.norm_radius)**2)
    nptest.assert_allclose(-np.asarray(e.surface_sag(xyz)),
                           conic_sag + dep, atol=1e-12)
    # the lowered table traces identically to a plain Spheroid with
    # the converted series
    s2 = ro.System([
        dict(material="air"),
        dict(roc=45., conic=-.6, distance=5.,
             material="1.51680/64.17", radius=9.,
             aspherics=[float(v) for v in qcon_to_even_aspherics(
                 e.q_coefficients, e.norm_radius)]),
        dict(roc=-80., distance=3., material="air", radius=9.),
        dict(distance=40., radius=9.),
    ], wavelengths=[550e-9])
    s2.update()
    rng = np.random.RandomState(0)
    y = np.zeros((128, 3))
    y[:, :2] = rng.uniform(-1, 1, (128, 2))*4.
    u = np.zeros((128, 3))
    u[:, 2] = 1.
    a = np.asarray(trace_rays_final(s.table(), y, u)[0])
    b = np.asarray(trace_rays_final(s2.table(), y, u)[0])
    nptest.assert_allclose(a, b, atol=1e-14)


def test_power_untouched_by_q():
    s = q_system()
    f_q = s.paraxial.focal_length
    s[1].q_coefficients = []
    s.update()
    nptest.assert_allclose(s.paraxial.focal_length, f_q, rtol=1e-12)


def test_base_aspherics_combine():
    base = [1e-5, -2e-6]
    s = q_system(base=base)
    e = s[1]
    comb = e.aspherics
    der = qcon_to_even_aspherics(e.q_coefficients, e.norm_radius)
    assert comb[0] == base[0]       # Q adds nothing at r^2
    nptest.assert_allclose(comb[1], base[1] + der[1], rtol=1e-12)
    # assigning aspherics sets the base only
    e.aspherics = [3e-5]
    assert e._base_aspherics == [3e-5]
    nptest.assert_allclose(e.aspherics[1], der[1], rtol=1e-12)


def test_yaml_round_trip():
    import rayopt_tpu.formats as fmt
    s = q_system(base=[1e-5])
    y = fmt.system_to_yaml(s)
    assert "qcon" in y and "q_coefficients" in y
    s2 = fmt.system_from_yaml(y)
    s2.update()
    e2 = s2[1]
    nptest.assert_allclose(e2.q_coefficients, s[1].q_coefficients)
    nptest.assert_allclose(e2.norm_radius, s[1].norm_radius)
    nptest.assert_allclose(e2._base_aspherics, [1e-5])
    nptest.assert_allclose(e2.aspherics, s[1].aspherics, rtol=1e-12)


def test_reverse_and_rescale():
    s = q_system(base=[1e-5])
    e = s[1]
    before = list(e.aspherics)
    e.reverse()
    nptest.assert_allclose(e.aspherics, [-a for a in before],
                           rtol=1e-12)
    e.reverse()
    nptest.assert_allclose(e.aspherics, before, rtol=1e-12)
    # rescale: sag(r) scales homothetically, so sag'(scale*r) =
    # scale*sag(r); check through the combined series
    scale = 2.5
    r = np.linspace(0., 8., 9)
    sag0 = sum(a*r**(2*i + 2) for i, a in enumerate(e.aspherics))
    e.rescale(scale)
    sag1 = sum(a*(scale*r)**(2*i + 2)
               for i, a in enumerate(e.aspherics))
    nptest.assert_allclose(sag1, scale*sag0, rtol=1e-10)


@pytest.mark.slow
def test_seidel_and_expansion_cover_qcon():
    # the Q departure flows through aspherics: the classical Seidel
    # figure term and the AD expansion must both see it
    s = q_system()
    e = ro.transverse_expansion(s)
    t = e.seidel_like()
    s0 = q_system()
    s0[1].q_coefficients = []
    s0.update()
    t0 = ro.transverse_expansion(s0).seidel_like()
    assert abs(t["spherical"] - t0["spherical"]) > 1e-6
