"""Polarization ray tracing: Fresnel physics, Jones chaining, and the
derived diattenuation/retardance/transmittance maps."""

import pytest
import numpy as np
from numpy import testing as nptest

import rayopt_tpu as ro
from rayopt_tpu.models import doublet
from rayopt_tpu.polarization import (
    PolarizationTrace, trace_polarization, fresnel_coefficients,
    jones_diattenuation, jones_retardance, jones_to_mueller)


def _fresnel_oracle(n1, n2, ci):
    """Independent textbook Fresnel (amplitude) for the test."""
    st2 = (n1/n2)**2*(1 - ci**2)
    ct = np.sqrt(1 - st2 + 0j)
    rs = (n1*ci - n2*ct)/(n1*ci + n2*ct)
    rp = (n2*ci - n1*ct)/(n2*ci + n1*ct)
    ts = 2*n1*ci/(n1*ci + n2*ct)
    tp = 2*n1*ci/(n2*ci + n1*ct)
    return rs, rp, ts, tp, ct


def test_fresnel_energy_conservation():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n1, n2 = rng.uniform(1., 2., 2)
        ci = np.cos(rng.uniform(0., 1.4))
        rs, rp, ts, tp, ct = fresnel_coefficients(n1, n2, ci)
        fac = np.real(n2*ct)/(n1*ci)
        nptest.assert_allclose(abs(rs)**2 + fac*abs(ts)**2, 1.,
                               rtol=1e-12)
        nptest.assert_allclose(abs(rp)**2 + fac*abs(tp)**2, 1.,
                               rtol=1e-12)


def test_fresnel_brewster_and_normal():
    n1, n2 = 1., 1.5
    rs, rp, ts, tp, ct = fresnel_coefficients(
        n1, n2, np.cos(np.arctan(n2/n1)))
    nptest.assert_allclose(abs(rp), 0., atol=1e-12)
    rs, rp, ts, tp, ct = fresnel_coefficients(n1, n2, 1.)
    # normal incidence, module basis convention: rp = -rs
    nptest.assert_allclose(complex(rs), (n1 - n2)/(n1 + n2),
                           rtol=1e-12)
    nptest.assert_allclose(complex(rp), (n2 - n1)/(n1 + n2),
                           rtol=1e-12)


def test_axial_transmittance_matches_product():
    """Unpolarized throughput of the axial ray equals the product of
    normal-incidence interface transmittances."""
    s = doublet()
    p = PolarizationTrace(s, nrays=16)
    tab = s.table()
    nb = np.abs(np.asarray(tab.n_before))
    na = np.abs(np.asarray(tab.n_after))
    mu = np.asarray(tab.mu)
    want = 1.
    for k in range(1, mu.size):
        if mu[k] != 1.:
            want *= 4*nb[k]*na[k]/(nb[k] + na[k])**2
    nptest.assert_allclose(p.transmittance[p.geometric.ref], want,
                           rtol=1e-12)
    # dielectric-only: no retardance anywhere, tiny diattenuation
    good = p.good
    assert p.retardance[good].max() < 1e-9
    assert p.diattenuation[good].max() < .02
    assert p.diattenuation[p.geometric.ref] < 1e-12


def test_tilted_plate_diattenuation_oracle():
    """A 45-degree tilted plane-parallel plate: the traced Jones
    matrix reproduces the two-interface textbook Fresnel product."""
    n = 1.51
    s = ro.System([
        dict(material="vacuum"),
        dict(material=ro.ModelMaterial(n=n, name="glass", solid=True),
             distance=5., angles=(np.pi/4, 0, 0), radius=20.),
        dict(material="vacuum", distance=3.,
             angles=(np.pi/4, 0, 0), radius=20.),
        dict(material="vacuum", distance=5., radius=20.),
    ])
    g = ro.GeometricTrace(s)
    y = np.zeros((1, 3))
    u = np.tile([0., 0., 1.], (1, 1))
    g.rays_given(y, u)
    g.propagate()
    out = trace_polarization(s.table(g.l), g.y, g.u, g.i)
    jones = np.asarray(out["jones"])[0]
    # oracle: 45deg entry, refracted angle inside, exit = reverse
    ci = np.cos(np.pi/4)
    rs1, rp1, ts1, tp1, ct1 = _fresnel_oracle(1., n, ci)
    rs2, rp2, ts2, tp2, ct2 = _fresnel_oracle(n, 1., ct1.real)
    nptest.assert_allclose(abs(jones[0, 0]), abs(ts1*ts2), rtol=1e-9)
    nptest.assert_allclose(abs(jones[1, 1]), abs(tp1*tp2), rtol=1e-9)
    nptest.assert_allclose(abs(jones[0, 1]), 0., atol=1e-12)
    nptest.assert_allclose(abs(jones[1, 0]), 0., atol=1e-12)
    # transmittance: flux factors cancel through the plate
    want_T = (abs(ts1*ts2)**2 + abs(tp1*tp2)**2)/2
    nptest.assert_allclose(np.asarray(out["transmittance"])[0],
                           want_T, rtol=1e-9)
    d = jones_diattenuation(jones)
    t_s, t_p = abs(ts1*ts2)**2, abs(tp1*tp2)**2
    nptest.assert_allclose(d, (t_p - t_s)/(t_p + t_s), rtol=1e-9)


def test_fold_mirror_retardance_pi():
    """An ideal fold mirror: |rs| = |rp| = 1 with a pi phase split
    (the s component flips, the p component does not, in the
    s/p = s x d basis convention)."""
    s = ro.System([
        dict(material="vacuum"),
        dict(material="mirror", distance=10.,
             angles=(np.pi/4, 0, 0), radius=10.),
        dict(material="vacuum", distance=-10.,
             direction=(0, 1., 0), radius=5.),
    ])
    g = ro.GeometricTrace(s)
    y = np.zeros((2, 3))
    y[1, 1] = .5
    u = np.tile([0., 0., 1.], (2, 1))
    g.rays_given(y, u)
    g.propagate()
    out = trace_polarization(s.table(g.l), g.y, g.u, g.i)
    jones = np.asarray(out["jones"])
    geometry = np.asarray(out["geometry"])
    nptest.assert_allclose(np.abs(jones[:, 0, 0]), 1., rtol=1e-12)
    nptest.assert_allclose(np.abs(jones[:, 1, 1]), 1., rtol=1e-12)
    ret = jones_retardance(jones, geometry)
    nptest.assert_allclose(ret, np.pi, rtol=1e-12)
    nptest.assert_allclose(np.asarray(out["transmittance"]), 1.,
                           rtol=1e-12)


def test_mueller_of_identity_and_polarizer():
    eye = np.eye(2, dtype=complex)
    m = jones_to_mueller(eye)
    nptest.assert_allclose(m, np.eye(4), atol=1e-12)
    pol = np.diag([1., 0.]).astype(complex)  # horizontal polarizer
    m = jones_to_mueller(pol)
    want = .5*np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                        [0, 0, 0, 0], [0, 0, 0, 0]])
    nptest.assert_allclose(m, want, atol=1e-12)


def test_skew_rays_finite_and_physical():
    """Off-axis bundle through the doublet: all surviving rays give
    symmetric-positive throughput <= 1 and finite maps."""
    s = doublet()
    p = PolarizationTrace(s, field=(0., 1.), nrays=32)
    g = p.good
    assert g.sum() > 10
    t = p.transmittance[g]
    assert np.isfinite(t).all() and (t > 0).all() and (t <= 1.).all()
    assert np.isfinite(p.diattenuation[g]).all()
    assert np.isfinite(p.retardance[g]).all()
    assert "Polarization" in p.text()


def test_analysis_polarization_block():
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu import Analysis
    a = Analysis(cooke_triplet(), print=False,
                 print_polarization=True, defocus=3)
    assert any("Polarization" in t for t in a.text)
    assert any("transmittance" in t for t in a.text)
    plt.close("all")


def test_polarization_zernike_fit():
    """The fold-mirror-free doublet has near-zero retardance Zernikes;
    the apodization piston reflects the edge-ray Fresnel falloff and
    the fits reproduce the maps."""
    s = doublet()
    p = PolarizationTrace(s, nrays=64, distribution="hexapolar",
                          clip=False)
    fits = p.zernike(nterms=10)
    ret_c, ret_rms = fits["retardance"]
    assert np.abs(ret_c).max() < 1e-9 and ret_rms < 1e-9
    apo_c, apo_rms = fits["apodization"]
    # apodization is radial: dominated by piston/defocus/spherical
    # (Noll 1, 4, 11), with negligible residual
    assert apo_rms < 1e-4
    d_c, d_rms = fits["diattenuation"]
    assert np.isfinite(d_c).all() and d_rms < 1e-3


def test_vector_psf_reduces_to_scalar():
    """At low NA with uncoated surfaces, the Jones-pupil vector PSF
    matches the scalar PSF in shape (corr > 1 - 1e-4) and carries
    approximately the bundle's mean transmittance in energy (exactly,
    for the x/y average -- the per-input energies differ by the tiny
    Cooke diattenuation)."""
    import rayopt_tpu as ro
    from rayopt_tpu.models import cooke_triplet
    s = cooke_triplet()
    p = ro.PolarizationTrace(s, field=(0, .5), nrays=64)
    _, _, psf_s = p.geometric.psf()
    t_mean = p.transmittance[p.good].mean()
    energies = {}
    for e_in in ((1., 0.), (0., 1.), (1., 1j)):
        _, _, psf_v = p.vector_psf(e_in=e_in)
        a = psf_v.ravel()/psf_v.max()
        b = psf_s.ravel()/psf_s.max()
        corr = (a @ b)/np.sqrt((a @ a)*(b @ b))
        # physical Fresnel apodization perturbs the shape slightly
        assert corr > 1 - 1e-4, (e_in, corr)
        energies[e_in] = psf_v.sum()/psf_s.sum()
        nptest.assert_allclose(energies[e_in], t_mean, rtol=2e-2)
    # the unpolarized x/y average approaches the mean transmittance
    # (grid-uniform vs ray-quadrature pupil weighting differ slightly)
    nptest.assert_allclose(
        (energies[(1., 0.)] + energies[(0., 1.)])/2., t_mean,
        rtol=2e-2)


def test_vector_field_diattenuation_identities():
    """On a 45-deg tilted bare plate (a real diattenuator) the
    physical per-ray intensities obey the Jones identities exactly:
    P(s-in) + P(p-in) = 2 T(unpolarized), and the s/p contrast equals
    the diattenuation."""
    import rayopt_tpu as ro
    s = ro.System([
        dict(material="air"),
        dict(distance=20., material="1.75", angles=[np.pi/4, 0, 0],
             radius=30.),
        dict(distance=3., material="air", angles=[np.pi/4, 0, 0],
             radius=30.),
        dict(distance=20., radius=30.),
    ], wavelengths=[550e-9], object=dict(
        angle_deg=0., pupil=dict(radius=.5, update_radius=False)))
    s.update()
    p = ro.PolarizationTrace(s, field=(0, 0.), nrays=16)
    g = p.good
    # tilt about x: the plane of incidence is y-z, so s = x-hat
    Es = p.vector_field((1., 0.))
    Ep = p.vector_field((0., 1.))
    Ps = np.einsum("ij,ij->i", Es.conj(), Es).real
    Pp = np.einsum("ij,ij->i", Ep.conj(), Ep).real
    assert abs(Ps[g] - Pp[g]).max() > 1e-3     # a real diattenuator
    nptest.assert_allclose((Ps + Pp)[g], 2*p.transmittance[g],
                           rtol=1e-9)
    nptest.assert_allclose(
        np.abs(Ps - Pp)[g]/(Ps + Pp)[g], p.diattenuation[g],
        atol=1e-6)


def test_vector_field_cross_polarization():
    """An axially-symmetric low-NA system barely couples x input into
    y (skew-ray geometric rotation only), and the output field stays
    transverse-dominated."""
    import rayopt_tpu as ro
    from rayopt_tpu.models import cooke_triplet
    p = ro.PolarizationTrace(cooke_triplet(), field=(0, 0.),
                             nrays=32)
    E = p.vector_field((1., 0.))
    g = p.good
    pow_ = np.abs(E[g])**2
    assert pow_[:, 1].sum() < 1e-3*pow_[:, 0].sum()
    assert pow_[:, 2].sum() < 0.05*pow_[:, 0].sum()
    import pytest
    with pytest.raises(ValueError):
        p.vector_field((0., 0.))


@pytest.mark.slow
def test_vector_psf_fold_mirror_preserves_shape():
    """A PEC fold mirror flips s against p (pi split) but a single
    fold cannot blur the PSF: the vector PSF still correlates with
    the scalar one."""
    import rayopt_tpu as ro
    s = ro.System([
        dict(material="air"),
        dict(roc=200., distance=10., material="1.5168/64.", radius=8.),
        dict(roc=-200., distance=3., material="air", radius=8.),
        dict(distance=30., material="mirror", angles=[np.pi/4, 0, 0],
             radius=12.),
        dict(distance=-60., angles=[np.pi/4, 0, 0], radius=8.),
    ], wavelengths=[550e-9], object=dict(
        angle_deg=0., pupil=dict(radius=4., update_radius=False)))
    s.update()
    p = ro.PolarizationTrace(s, field=(0, 0.), nrays=48)
    _, _, psf_v = p.vector_psf(e_in=(1., 1.))
    _, _, psf_s = p.geometric.psf()
    a = psf_v.ravel()/psf_v.max()
    b = psf_s.ravel()/psf_s.max()
    corr = (a @ b)/np.sqrt((a @ a)*(b @ b))
    assert corr > 0.999
