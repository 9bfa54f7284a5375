"""Materials and dispersion tests."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu.materials import (
    Material, AbbeMaterial, ModelMaterial, CoefficientsMaterial,
    air, vacuum, mirror, fraunhofer, lambda_d, GLASSES)


def test_builtins():
    assert vacuum.refractive_index(lambda_d) == 1.
    assert not vacuum.solid
    assert mirror.mirror
    n_air = air.refractive_index(lambda_d)
    assert 1.00025 < n_air < 1.0003


def test_make_float():
    m = Material.make(1.5)
    assert isinstance(m, ModelMaterial)
    assert m.refractive_index(lambda_d) == 1.5


def test_make_tuple():
    m = Material.make((1.5, 60.))
    assert isinstance(m, AbbeMaterial)
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5)


def test_make_string():
    m = Material.make("1.5/60")
    assert isinstance(m, AbbeMaterial)
    nptest.assert_allclose(m.n, 1.5)
    nptest.assert_allclose(m.v, 60)


def test_nbk7():
    m = Material.make("SCHOTT-BK|N-BK7")
    # Schott datasheet: nd = 1.5168, vd = 64.17
    nptest.assert_allclose(m.nd, 1.5168, atol=2e-4)
    nptest.assert_allclose(m.vd, 64.17, atol=.2)


def test_nsk16():
    m = Material.make("SCHOTT-SK|N-SK16")
    nptest.assert_allclose(m.nd, 1.62041, atol=2e-4)
    nptest.assert_allclose(m.vd, 60.32, atol=.2)


def test_nf2():
    m = Material.make("SCHOTT-F|N-F2")
    nptest.assert_allclose(m.nd, 1.6200, atol=2e-4)
    nptest.assert_allclose(m.vd, 36.43, atol=.2)


def test_suffix_lookup():
    m = Material.make("n-bk7")
    nptest.assert_allclose(m.nd, 1.5168, atol=2e-4)


def test_batched_dispersion():
    """The formula family evaluates batched over wavelength."""
    m = Material.make("SCHOTT-BK|N-BK7")
    wl = np.array([fraunhofer[k] for k in "FdC"])
    n = m.n(wl)
    assert n.shape == (3,)
    for i, w in enumerate(wl):
        nptest.assert_allclose(n[i], m.refractive_index(w), rtol=1e-13)
    # normal dispersion: n decreases with wavelength
    assert n[0] > n[1] > n[2]


def test_all_glasses_reasonable():
    for key in GLASSES:
        m = Material.make(key)
        assert 1.4 < m.nd < 2.1, (key, m.nd)
        assert 15 < m.vd < 95, (key, m.vd)


def test_formula_family():
    from rayopt_tpu.materials import DISPERSION_FORMULAS
    assert len(DISPERSION_FORMULAS) >= 19


def test_dict_roundtrip():
    m = Material.make("SCHOTT-BK|N-BK7")
    d = m.dict()
    m2 = Material.make(d)
    assert isinstance(m2, CoefficientsMaterial)
    nptest.assert_allclose(m2.nd, m.nd, rtol=1e-14)


def test_abbe_dict_roundtrip():
    m = AbbeMaterial(n=1.7, v=40.)
    m2 = Material.make(m.dict())
    nptest.assert_allclose(m2.refractive_index(500e-9),
                           m.refractive_index(500e-9))


def test_thermal():
    from rayopt_tpu.materials import Thermal
    th = Thermal(d=[1e-6, 1e-8, 1e-10], e=[1e-7, 1e-9])
    dn = th.dn_thermal(40., 1.5)
    assert np.isfinite(dn)
    nptest.assert_allclose(th.dn_thermal(th.tref, 1.5), 0.)
