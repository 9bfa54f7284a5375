"""AD transverse aberration expansion (expansion.py): classical
Seidel cross-pins on the Cooke golden, exact v^5 model convergence,
and anamorphic coverage beyond the classical formulas' reach
(reference elements.py:556-587 is rotationally-symmetric only)."""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.expansion import TransverseExpansion, _launcher

from test_raytrace import COOKE


@pytest.fixture(scope="module")
def cooke_exp():
    s = ro.system_from_yaml(COOKE)
    s.update()
    return s, TransverseExpansion(s)


def test_classical_seidel_crosspins(cooke_exp):
    """The AD third-order sums reproduce the classical per-surface
    Seidel accumulation (trace/paraxial.py transverse3) through the
    standard identities: TSC = spherical, CC = sagittal coma,
    TAC = (tangential - sagittal astigmatic split)/2,
    sagittal field curvature = TPC + TAC, DC = distortion."""
    s, e = cooke_exp
    tsc, cc, tac, tpc, dc = np.asarray(s.paraxial.transverse3).sum(0)[:5]
    c = e.seidel_like()
    nptest.assert_allclose(c["spherical"], tsc, rtol=2e-3)
    nptest.assert_allclose(c["coma_sagittal"], cc, rtol=1e-2)
    nptest.assert_allclose(
        c["coma_tangential"]/c["coma_sagittal"], 3., rtol=3e-3)
    nptest.assert_allclose(c["astigmatism"]/2., tac, rtol=2e-3)
    nptest.assert_allclose(
        c["sagittal_field_curv"], tpc + tac, rtol=2e-3)
    nptest.assert_allclose(c["distortion"], dc, rtol=1e-2)
    # rotational symmetry: x and y marginal spherical identical,
    # quadratic jet exactly zero
    nptest.assert_allclose(c["spherical_x"], c["spherical"], rtol=1e-12)
    assert abs(e.j2).max() == 0.


def test_cubic_model_converges_v5(cooke_exp):
    """The cubic model's residual against the real ray shrinks as v^5
    (factor 32 per halving) -- the expansion is the exact Taylor jet,
    not a fit."""
    s, e = cooke_exp
    f = _launcher(s, s.wavelengths[0])
    v = np.array([.3, .2, .1, .4])
    errs = []
    for scale in (.2, .1, .05):
        vv = v*scale
        errs.append(abs(np.asarray(f(vv)) - e.evaluate(vv)).max())
    nptest.assert_allclose(errs[0]/errs[1], 32., rtol=.05)
    nptest.assert_allclose(errs[1]/errs[2], 32., rtol=.05)


def test_anamorphic_expansion():
    """A cylinder system (no classical Seidel available -- the
    classical path uses only the y-axis figure) gets a full third-
    order table from AD: x/y marginal spherical differ, and the
    cubic model still predicts real rays to O(v^5)."""
    s = ro.System([
        dict(material="air"),
        dict(type="biconic", roc=40., curvature_x=1/55.,
             distance=4., material="1.51680/64.17", radius=8.),
        dict(type="biconic", roc=-40., curvature_x=-1/55.,
             distance=3., material="air", radius=8.),
        dict(distance=45., radius=8.),
    ])
    s.object.angle_deg = 2.
    s.object.pupil.radius = 3.
    s.object.pupil.update_radius = False
    s.update()
    e = TransverseExpansion(s)
    c = e.seidel_like()
    assert abs(c["spherical_x"] - c["spherical"]) > 1e-4*abs(c["spherical"])
    f = _launcher(s, s.wavelengths[0])
    v = np.array([.25, .35, 0., .3])
    errs = [abs(np.asarray(f(v*sc)) - e.evaluate(v*sc)).max()
            for sc in (.2, .1)]
    nptest.assert_allclose(errs[0]/errs[1], 32., rtol=.08)
