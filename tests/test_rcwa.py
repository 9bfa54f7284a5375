"""Rigorous coupled-wave analysis (rcwa.py) validation.

The solver has no reference counterpart (quartiq/rayopt has no
gratings); it is pinned against closed-form electromagnetics instead:
Fresnel coefficients, the exact thin-film Airy formula, energy
conservation for lossless stacks at high truncation order (the
S-matrix stability property), profile symmetry, and the scalar blaze
limit d >> lambda where it must agree with gratings.blaze_efficiency.
"""

import numpy as np
import pytest

from rayopt_tpu.rcwa import (
    Layer, uniform_layer, lamellar_layer, blazed_layers, rcwa1d,
    rcwa1d_conical, rcwa2d, crossed_layer, pillar_layer,
)


def total(res):
    return res.eff_r.sum() + res.eff_t.sum()


def test_fresnel_te():
    res = rcwa1d(1.0, 0.6, [], n_in=1., n_out=1.5, orders=5)
    assert res.eff_r.sum() == pytest.approx(((1 - 1.5)/(1 + 1.5))**2,
                                            abs=1e-12)
    assert total(res) == pytest.approx(1., abs=1e-12)
    # only order 0 propagates nothing: all side orders dark
    assert res.eff_t[res.orders != 0].max() < 1e-30


def test_fresnel_tm_oblique():
    th = np.deg2rad(30.)
    res = rcwa1d(1.0, 0.6, [], n_out=1.5, theta_deg=30., pol="TM",
                 orders=5)
    thr = np.arcsin(np.sin(th)/1.5)
    r = (1.5*np.cos(th) - np.cos(thr))/(1.5*np.cos(th) + np.cos(thr))
    assert res.eff_r.sum() == pytest.approx(r**2, abs=1e-12)


def test_uniform_layer_is_thin_film():
    # no inter-order coupling: order 0 must match the Airy formula
    res = rcwa1d(1.0, 0.6328, [uniform_layer(0.5, 2.0)], n_out=1.5,
                 theta_deg=10., orders=20)
    a = np.sin(np.deg2rad(10.))
    kz1, kz2, kz3 = (np.sqrt(n**2 - a**2) for n in (1., 2., 1.5))
    r12 = (kz1 - kz2)/(kz1 + kz2)
    r23 = (kz2 - kz3)/(kz2 + kz3)
    ph = np.exp(2j*2*np.pi*0.5/0.6328*kz2)
    r = (r12 + r23*ph)/(1 + r12*r23*ph)
    assert res.eff_r[res.orders == 0][0] == pytest.approx(
        abs(r)**2, abs=1e-10)
    assert total(res) == pytest.approx(1., abs=1e-10)


@pytest.mark.parametrize("pol", ["TE", "TM"])
def test_energy_conservation_high_order(pol):
    # the S-matrix stability pin: the enhanced-transmittance
    # formulation loses 6% of the energy budget at N = 40 on this
    # exact case (singular layer matching matrix)
    lay = [lamellar_layer(0.5, 0.5, 2.04, 1.0)]
    res = rcwa1d(1.0, 0.6328, lay, n_out=1.52, theta_deg=10.,
                 pol=pol, orders=60)
    assert total(res) == pytest.approx(1., abs=1e-8)


@pytest.mark.parametrize("pol", ["TE", "TM"])
def test_convergence(pol):
    lay = [lamellar_layer(0.5, 0.5, 2.04, 1.0)]
    effs = []
    for N in (20, 40):
        res = rcwa1d(1.0, 0.6328, lay, n_out=1.52, theta_deg=10.,
                     pol=pol, orders=N)
        effs.append(res.eff_t[res.orders == 0][0])
    assert abs(effs[1] - effs[0]) < 5e-4


def test_wood_anomaly_grazing_order():
    # lambda/period = 1/2 puts order +-2 exactly at grazing (kz = 0):
    # the cover V matrix is singular there, the block interface solve
    # must survive and conserve energy
    res = rcwa1d(1.0, 0.5, [lamellar_layer(0.4, 0.5, 2.0, 1.0)],
                 n_out=1.5, orders=15)
    assert total(res) == pytest.approx(1., abs=1e-9)


def test_symmetric_profile_symmetric_orders():
    res = rcwa1d(1.0, 0.5, [lamellar_layer(0.4, 0.5, 2.0, 1.0)],
                 n_out=1.5, orders=15)
    e, o = res.eff_t, res.orders
    for m in (1, 2, 3):
        assert e[o == m][0] == pytest.approx(e[o == -m][0], abs=1e-12)


def test_blazed_scalar_limit():
    # d = 10 lambda, depth = lambda/(n-1): scalar theory puts ~all
    # transmitted light into one first order (sinc^2(0) = 1); RCWA
    # must agree up to Fresnel loss and staircase error
    lam, n = 0.6328, 1.5
    res = rcwa1d(10.0, lam, blazed_layers(lam/(n - 1.), n, 1.0,
                                          nslices=24),
                 n_out=n, orders=40)
    assert total(res) == pytest.approx(1., abs=1e-9)
    assert res.eff_t[res.orders == -1][0] > 0.85
    # and the blaze order dominates every other order by > 50x
    rest = np.where(res.orders == -1, 0., res.eff_t)
    assert res.eff_t[res.orders == -1][0] > 50*rest.max()


def test_deep_stack_stability():
    # 20 slices, N = 60: the regime where transfer-matrix methods
    # overflow; S-matrix stays exactly on the energy shell
    res = rcwa1d(1.0, 0.6328, blazed_layers(1.2, 1.5, 1.0,
                                            nslices=20),
                 n_out=1.5, orders=60)
    assert total(res) == pytest.approx(1., abs=1e-9)


def test_absorbing_grating_dissipates():
    # silver-like index: energy strictly below 1, nothing negative
    res = rcwa1d(1.0, 0.6328,
                 [lamellar_layer(0.2, 0.5, 0.055 + 3.32j, 1.0)],
                 n_out=1.5, pol="TM", orders=20)
    s = total(res)
    assert 0.2 < s < 0.999
    assert res.eff_r.min() >= 0. and res.eff_t.min() >= 0.


def test_reciprocal_layer_order():
    # a single lamellar layer illuminated from the other side: the
    # transmitted order-0 efficiency is reciprocal
    lay = lamellar_layer(0.3, 0.4, 1.9, 1.2)
    fwd = rcwa1d(1.0, 0.55, [lay], n_in=1.0, n_out=1.5, orders=20)
    rev = rcwa1d(1.0, 0.55, [Layer(lay.thickness, lay.widths,
                                   lay.indices)],
                 n_in=1.5, n_out=1.0, orders=20)
    assert fwd.eff_t[fwd.orders == 0][0] == pytest.approx(
        rev.eff_t[rev.orders == 0][0], abs=1e-10)


def test_propagating_masks_and_grating_equation():
    res = rcwa1d(1.0, 0.6328, [lamellar_layer(0.2, 0.5, 1.8, 1.0)],
                 n_out=1.52, theta_deg=10., orders=10)
    alpha = np.sin(np.deg2rad(10.)) + res.orders*0.6328
    assert (res.propagating_r == (np.abs(alpha) < 1.)).all()
    assert (res.propagating_t == (np.abs(alpha) < 1.52)).all()
    # evanescent orders carry no power
    assert res.eff_r[~res.propagating_r].max() < 1e-25
    assert res.eff_t[~res.propagating_t].max() < 1e-25


def test_input_validation():
    with pytest.raises(ValueError):
        lamellar_layer(0.5, 1.5, 2.0, 1.0)
    with pytest.raises(ValueError):
        rcwa1d(1.0, 0.6, [], pol="TEM")
    with pytest.raises(ValueError):
        rcwa1d(1.0, 0.6, [Layer(0.1, (0.6, 0.6), (1.5, 1.0))])


def test_grating_order_weights_vs_scalar():
    # coarse (d = 18 lambda) reflective blazed grating: the rigorous
    # efficiencies, normalized by the metal's Fresnel reflectance,
    # must agree with the scalar sinc^2 model to ~0.1 absolute
    from rayopt_tpu.elements import Grating
    from rayopt_tpu.materials import mirror
    from rayopt_tpu.gratings import order_weights

    g = Grating(grating_frequency=100., grating_order=1,
                blaze_deg=np.rad2deg(np.arcsin(0.55e-6/(2*10e-6))),
                material=mirror)
    lam = np.array([0.45e-6, 0.55e-6, 0.65e-6])
    ws = order_weights(g, lam, (0, 1, 2), scale=1e-3)
    wr = order_weights(g, lam, (0, 1, 2), scale=1e-3, model="rcwa")
    n_al = 1 + 6.5j  # the bridge's mirror stand-in
    refl = abs((1 - n_al)/(1 + n_al))**2
    assert np.abs(wr/refl - ws).max() < 0.12
    # the blaze order must dominate at every wavelength
    assert (wr[1] > 0.7).all()


def test_order_weights_model_routing():
    from rayopt_tpu.elements import Grating
    from rayopt_tpu.gratings import order_weights
    from rayopt_tpu.rcwa import grating_order_weights

    g = Grating(grating_frequency=100., grating_order=1)
    # unblazed: both models fall back to equal weights
    w = order_weights(g, 0.55e-6, (1, 2), model="rcwa")
    assert (w == 0.5).all()
    with pytest.raises(ValueError):
        order_weights(Grating(grating_frequency=100., blaze_deg=5.),
                      0.55e-6, (1,), model="zpurious")
    with pytest.raises(ValueError):
        grating_order_weights(g, 0.55e-6, (1,))


@pytest.mark.parametrize("pol", ["TE", "TM"])
def test_conical_reduces_to_classical(pol):
    # phi = 0 is the classical mount: the full-vector solver must
    # reproduce rcwa1d exactly and show zero s/p cross-coupling
    lay = [lamellar_layer(0.5, 0.45, 2.04, 1.0)]
    a = rcwa1d(1.0, 0.6328, lay, n_out=1.52, theta_deg=23.,
               pol=pol, orders=12)
    b = rcwa1d_conical(1.0, 0.6328, lay, n_out=1.52, theta_deg=23.,
                       phi_deg=0., pol=pol, orders=12)
    np.testing.assert_allclose(b.eff_r, a.eff_r, atol=1e-12)
    np.testing.assert_allclose(b.eff_t, a.eff_t, atol=1e-12)
    cross = (b.r_p, b.t_p) if pol == "TE" else (b.r_s, b.t_s)
    assert max(abs(c).max() for c in cross) < 1e-12


@pytest.mark.parametrize("pol", ["TE", "TM", (0.6, 0.8j)])
def test_conical_energy_and_coupling(pol):
    # lossless blazed stack, 25 deg off 35 deg azimuth: exact energy
    # conservation, and genuine polarization conversion (the defining
    # feature of the off-plane mount)
    lays = blazed_layers(0.9, 1.5, 1.0, nslices=10)
    res = rcwa1d_conical(1.2, 0.55, lays, n_out=1.5, theta_deg=25.,
                         phi_deg=35., pol=pol, orders=10)
    assert total(res) == pytest.approx(1., abs=1e-9)
    assert abs(res.t_s).max() > 0.1 and abs(res.t_p).max() > 0.1
    assert res.eff_r.min() >= 0. and res.eff_t.min() >= 0.


@pytest.mark.parametrize("pol", ["TE", "TM"])
def test_conical_uniform_film_azimuth_invariant(pol):
    # a homogeneous film cannot know the azimuth: rotating the
    # incidence plane must leave R/T unchanged (cross-pins the
    # conical cover bases and flux weights against the classical path)
    u = [uniform_layer(0.3, 2.0)]
    a = rcwa1d(1.0, 0.6328, u, n_out=1.5, theta_deg=40., pol=pol,
               orders=6)
    b = rcwa1d_conical(1.0, 0.6328, u, n_out=1.5, theta_deg=40.,
                       phi_deg=55., pol=pol, orders=6)
    i0 = a.orders == 0
    assert b.eff_r[i0][0] == pytest.approx(a.eff_r[i0][0], abs=1e-12)
    assert b.eff_t[i0][0] == pytest.approx(a.eff_t[i0][0], abs=1e-12)


def test_conical_azimuth_mirror_symmetry():
    # a symmetric (unblazed) profile: +phi and -phi are mirror images,
    # so per-order efficiencies map m -> m under azimuth flip
    lay = [lamellar_layer(0.4, 0.5, 2.0, 1.0)]
    a = rcwa1d_conical(1.0, 0.5, lay, n_out=1.5, theta_deg=20.,
                       phi_deg=30., pol="TE", orders=10)
    b = rcwa1d_conical(1.0, 0.5, lay, n_out=1.5, theta_deg=20.,
                       phi_deg=-30., pol="TE", orders=10)
    np.testing.assert_allclose(a.eff_r, b.eff_r, atol=1e-12)
    np.testing.assert_allclose(a.eff_t, b.eff_t, atol=1e-12)


def test_conical_absorbing_exit():
    # metal substrate off-plane: reflected energy strictly below 1,
    # nothing negative, unpolarized input well-defined
    lays = blazed_layers(0.3, 1.0 + 6.5j, 1.0, nslices=8)
    for pol in ("TE", "TM"):
        res = rcwa1d_conical(1.0, 0.6328, lays, n_out=1.0 + 6.5j,
                             theta_deg=15., phi_deg=40., pol=pol,
                             orders=12)
        assert 0.2 < res.eff_r.sum() < 0.999
        assert res.eff_r.min() >= 0.


def test_conical_wood_anomaly():
    # grazing side order in the cover (kz = 0): the vanishing
    # w_p/v_s columns must not break the joint interface solve
    res = rcwa1d_conical(1.0, 0.5, [lamellar_layer(0.4, 0.5, 2.0,
                                                   1.0)],
                         n_out=1.5, theta_deg=0., phi_deg=25.,
                         pol="TM", orders=15)
    assert total(res) == pytest.approx(1., abs=1e-9)


def test_conical_input_validation():
    with pytest.raises(ValueError):
        rcwa1d_conical(1.0, 0.6, [], pol="TEM")
    with pytest.raises(ValueError):
        rcwa1d_conical(1.0, 0.6, [], pol=(0., 0.))


@pytest.mark.parametrize("pol", ["TE", "TM"])
def test_crossed_reduces_to_conical(pol):
    # a y-uniform pixel grid IS a 1-D grating: the my = 0 row must
    # reproduce rcwa1d_conical exactly and the my != 0 orders must be
    # strictly dark (this pins Li's 2-D operators against the 1-D
    # factorization and the flattening/cover bookkeeping at once)
    lay1 = lamellar_layer(0.5, 0.45, 2.04, 1.0)
    lay2 = crossed_layer(0.5, (0.45, 0.55), (1.,), [[2.04], [1.0]])
    a = rcwa1d_conical(1.0, 0.6328, [lay1], n_out=1.52,
                       theta_deg=23., phi_deg=30., pol=pol, orders=6)
    b = rcwa2d(1.0, 5.0, 0.6328, [lay2], n_out=1.52, theta_deg=23.,
               phi_deg=30., pol=pol, orders_x=6, orders_y=2)
    sel = b.orders_y == 0
    np.testing.assert_allclose(b.eff_r[sel], a.eff_r, atol=1e-12)
    np.testing.assert_allclose(b.eff_t[sel], a.eff_t, atol=1e-12)
    assert b.eff_r[~sel].sum() + b.eff_t[~sel].sum() < 1e-25


@pytest.mark.parametrize("pol", ["TE", "TM", (0.6, 0.8j)])
def test_crossed_energy(pol):
    # lossless rectangular pillar array, oblique + off-azimuth:
    # exact energy conservation over the full 2-D order set
    p = pillar_layer(0.4, 0.5, 0.6, 2.0, 1.0)
    r = rcwa2d(0.9, 1.1, 0.55, [p], n_out=1.5, theta_deg=20.,
               phi_deg=25., pol=pol, orders_x=4, orders_y=4)
    assert r.eff_r.sum() + r.eff_t.sum() == pytest.approx(1.,
                                                          abs=1e-9)
    assert r.eff_r.min() >= 0. and r.eff_t.min() >= 0.


def test_crossed_square_swap_symmetry():
    # square pillar at normal incidence: TE (E along y) and TM (E
    # along x) are related by the x<->y mirror, so per-order
    # efficiencies map (mx, my) -> (my, mx)
    sq = pillar_layer(0.4, 0.5, 0.5, 2.0, 1.0)
    a = rcwa2d(1.0, 1.0, 0.55, [sq], n_out=1.5, pol="TE",
               orders_x=4, orders_y=4)
    b = rcwa2d(1.0, 1.0, 0.55, [sq], n_out=1.5, pol="TM",
               orders_x=4, orders_y=4)
    ea = {(m, n): v for m, n, v in
          zip(a.orders_x, a.orders_y, a.eff_t)}
    eb = {(m, n): v for m, n, v in
          zip(b.orders_x, b.orders_y, b.eff_t)}
    assert max(abs(ea[m, n] - eb[n, m]) for m, n in ea) < 1e-12


def test_crossed_uniform_is_thin_film():
    # a 1x1 pixel grid is a homogeneous film: order (0,0) must match
    # the classical thin-film result, everything else dark
    u2 = crossed_layer(0.5, (1.,), (1.,), [[2.0]])
    a = rcwa1d(1.0, 0.6328, [uniform_layer(0.5, 2.0)], n_out=1.5,
               theta_deg=10., orders=8)
    b = rcwa2d(1.0, 1.0, 0.6328, [u2], n_out=1.5, theta_deg=10.,
               pol="TE", orders_x=3, orders_y=3)
    i0a = a.orders == 0
    i0b = (b.orders_x == 0) & (b.orders_y == 0)
    assert b.eff_r[i0b][0] == pytest.approx(a.eff_r[i0a][0],
                                            abs=1e-10)
    assert b.eff_t[i0b][0] == pytest.approx(a.eff_t[i0a][0],
                                            abs=1e-10)


def test_crossed_absorbing_pillars():
    # metal pillars: dissipation, no negative efficiencies
    p = pillar_layer(0.15, 0.4, 0.4, 0.055 + 3.32j, 1.0)
    r = rcwa2d(0.8, 0.8, 0.6328, [p], n_out=1.5, theta_deg=10.,
               phi_deg=15., pol="TM", orders_x=4, orders_y=4)
    s = r.eff_r.sum() + r.eff_t.sum()
    assert 0.1 < s < 0.999
    assert r.eff_r.min() >= 0. and r.eff_t.min() >= 0.


def test_crossed_input_validation():
    with pytest.raises(ValueError):
        crossed_layer(0.5, (0.6, 0.6), (1.,), [[2.0], [1.0]])
    with pytest.raises(ValueError):
        crossed_layer(0.5, (0.5, 0.5), (1.,), [[2.0]])
    with pytest.raises(ValueError):
        pillar_layer(0.5, 1.2, 0.5, 2.0, 1.0)


def test_order_weights_conical_routing():
    # azimuth_deg routes through the conical solver; at coarse pitch
    # the off-plane blaze stays dominant and weights stay in [0, 1]
    from rayopt_tpu.elements import Grating
    from rayopt_tpu.rcwa import grating_order_weights

    d = 10e-6
    depth = 0.55e-6/0.5
    g = Grating(grating_frequency=100., grating_order=1,
                blaze_deg=np.rad2deg(np.arctan(depth/d)))
    w = grating_order_weights(g, 0.55e-6, (0, 1, 2), pol="TE",
                              reflection=False, azimuth_deg=20.,
                              incidence_deg=10.)
    assert w[1, 0] > 0.6
    assert 0. <= w.min() and w.max() <= 1.


def test_grating_order_weights_transmission():
    # blazed transmission grating (solid material attr absent ->
    # n_out default 1.5): depth d tan(tb) = lambda/(n-1) peaks m = 1
    from rayopt_tpu.elements import Grating
    from rayopt_tpu.rcwa import grating_order_weights

    d = 10e-6
    depth = 0.55e-6/0.5
    g = Grating(grating_frequency=100., grating_order=1,
                blaze_deg=np.rad2deg(np.arctan(depth/d)))
    w = grating_order_weights(g, 0.55e-6, (0, 1, 2), pol="TE",
                              reflection=False)
    assert w[1, 0] > 0.8
    assert w[0, 0] < 0.05 and w[2, 0] < 0.05


def test_disk_layer_geometry_and_energy():
    """disk_layer staircases a circular pillar onto the tensor cell
    grid with EXACT row areas (equal-area chords on their own
    breakpoints), so the fill factor is exact at any slice count;
    the lossless stack conserves energy."""
    from rayopt_tpu.rcwa import disk_layer, rcwa2d
    for slices in (4, 16):
        lay = disk_layer(0.3, 0.6, 2.0, 1.0, slices=slices)
        wx = np.asarray(lay.widths_x)
        wy = np.asarray(lay.widths_y)
        area = sum(wx[i]*wy[j]
                   for i in range(wx.size) for j in range(wy.size)
                   if lay.indices[i, j].real > 1.5)
        assert abs(area - np.pi*0.3**2) < 1e-12, (slices, area)
    res = rcwa2d(1.0, 1.0, 0.6, [disk_layer(.25, .5, 2.2, 1.)],
                 n_in=1., n_out=1.7, theta_deg=10., orders_x=4,
                 orders_y=4)
    assert abs(res.eff_r.sum() + res.eff_t.sum() - 1.) < 1e-8


@pytest.mark.slow
def test_disk_layer_staircase_converges():
    """The only disk_layer approximation is the boundary staircase:
    the zeroth-order transmission converges as slices grows."""
    from rayopt_tpu.rcwa import disk_layer, rcwa2d
    vals = []
    for slices in (4, 16, 128):
        r = rcwa2d(1.0, 1.0, 0.6,
                   [disk_layer(.25, .5, 2.2, 1., slices=slices)],
                   n_in=1., n_out=1.7, orders_x=4, orders_y=4)
        i0 = np.argmax((np.asarray(r.orders_x) == 0)
                       & (np.asarray(r.orders_y) == 0))
        vals.append(float(r.eff_t[i0]))
    # oscillatory staircase: measure distance to the fine reference
    # (measured 1.4e-3 / 7.9e-4 / ref at 4 / 16 / 128 slices)
    assert abs(vals[1] - vals[2]) < abs(vals[0] - vals[2])
    assert abs(vals[0] - vals[2]) < 5e-3
