"""Model zoo: every canonical prescription must build, update, aim,
and trace; Analysis smoke on the flagship double Gauss."""

import numpy as np
import pytest

import rayopt_tpu as ro
from rayopt_tpu import models


@pytest.mark.parametrize("name", ["doublet", "cooke", "double_gauss",
                                  "petzval", "parabolic"])
def test_builds_and_traces(name):
    s = models.PRESCRIPTIONS[name]()
    g = ro.GeometricTrace(s)
    g.rays_paraxial()
    assert np.isfinite(g.y[-1, :, :2]).all()


@pytest.mark.parametrize("name", ["cooke", "double_gauss", "petzval"])
def test_aims_all_fields(name):
    s = models.PRESCRIPTIONS[name]()
    s.paraxial.refocus()
    s.update()
    g = ro.GeometricTrace(s)
    for h in s.fields:
        g.rays_point((0, h), nrays=13, distribution="radau",
                     filter=False)
        r = g.rms()
        assert np.isfinite(r) and r < 5, (name, h, r)


def test_double_gauss_first_order():
    s = models.double_gauss()
    p = s.paraxial
    np.testing.assert_allclose(p.focal_length[1], 99.56, rtol=1e-2)
    np.testing.assert_allclose(p.working_f_number[1], 3.02, rtol=1e-2)


def test_cavity_builds():
    s = models.hene_cavity()
    g = ro.GaussianTrace(s)
    assert g.stable.all()


@pytest.mark.slow
def test_analysis_double_gauss():
    import matplotlib
    matplotlib.use("agg")
    s = models.double_gauss()
    a = ro.Analysis(s, print=False, defocus=3)
    assert len(a.figures) == 5
    import matplotlib.pyplot as plt
    plt.close("all")
