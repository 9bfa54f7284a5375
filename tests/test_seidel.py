"""Physics invariants of the third-order (Seidel) machinery
(mirrors reference test_seidel.py): a parabolic mirror has exactly zero
third-order spherical aberration, and conic 0 vs -2 are antisymmetric."""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro

PARABOLIC = """
object:
  type: infinite
  angle_deg: 1
  pupil:
    radius: 1
    distance: 1
stop: 1
elements:
- {material: vacuum}
- {material: mirror, distance: 1, roc: -200, conic: -1}
- {material: vacuum, distance: -100}
"""


@pytest.fixture
def parabola():
    s = ro.system_from_yaml(PARABOLIC)
    s.update()
    return s


def test_zero_spherical(parabola):
    nptest.assert_allclose(parabola.paraxial.transverse3[1, 0], 0,
                           atol=1e-14)


def test_hyperbolic_antisymmetry(parabola):
    s = parabola
    s[1].conic = 0
    s.update()
    sph = s.paraxial.transverse3[1, 0]
    s[1].conic = -2
    s.update()
    hyp = s.paraxial.transverse3[1, 0]
    nptest.assert_allclose(sph, -hyp)


def test_parabola_focus_geometric(parabola):
    """Real rays parallel to the axis of a parabolic mirror all pass
    exactly through the focus at roc/2."""
    s = parabola
    g = ro.GeometricTrace(s)
    y = np.zeros((5, 3))
    y[:, 1] = np.linspace(0, .9, 5)
    u = np.tile([0, 0, 1.], (5, 1))
    g.rays_given(y, u)
    g.propagate()
    # at the image plane (100 behind the mirror) all rays converge
    nptest.assert_allclose(g.y[-1, :, :2], 0, atol=1e-12)
