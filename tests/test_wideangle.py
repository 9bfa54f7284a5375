"""Wideangle (fisheye) aiming: the continuation ladder implementing
the reference's dead entrance_distance branch (reference
system.py:559-562 "FIXME: wideangle!"), plus equidistant-projection
goldens."""

import warnings

import numpy as np
from numpy import testing as nptest

import rayopt_tpu as ro
from rayopt_tpu.models import fisheye


def _chief_stop_residual(s, h):
    z, a = s.pupil((0, h))
    y0, u0 = s.aim((0, h), (0., 0.), z, a, filter=False)
    ys = s.trace_table(y0, u0, s.wavelengths[0], stop=s.stop + 1)[0]
    return float(np.abs(ys[-1, 0, :2]).max())/s.aperture.radius


def test_fisheye_cold_full_field_aim():
    """A COLD pupil solve straight at the full 70-degree field
    matches the warm (field-swept) solve: the continuation ladder
    stands in for the reference's abandoned wideangle branch."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s_cold = fisheye()
        z_c, a_c = s_cold.pupil((0, 1.))
        s_warm = fisheye()
        for h in (0.25, 0.5, 0.75, 1.):
            z_w, a_w = s_warm.pupil((0, h))
    nptest.assert_allclose(z_c, z_w, rtol=1e-3)
    nptest.assert_allclose(np.asarray(a_c), np.asarray(a_w),
                           rtol=5e-3, atol=5e-3)
    # chief-ray certificates: the aimed chief passes the stop center
    for h in (0.5, 1.):
        assert _chief_stop_residual(s_cold, h) < 1e-3


def test_fisheye_equidistant_projection_golden():
    """Equidistant projection: the chief image height grows nearly
    linearly in field angle (the point of a fisheye; rectilinear
    would diverge toward 90 deg), pinned against distortion-free
    linearity to a few percent."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s = fisheye()
        heights = []
        for h in (0.25, 0.5, 0.75, 1.):
            z, a = s.pupil((0, h))
            y0, u0 = s.aim((0, h), (0., 0.), z, a, filter=False)
            ys = s.trace_table(y0, u0, s.wavelengths[0])[0]
            heights.append(float(ys[-1, 0, 1]))
    heights = np.asarray(heights)
    assert np.all(np.diff(heights) > 0)
    # near-linear in theta over the inner field (rectilinear would
    # diverge: tan(52.5 deg)/3/tan(17.5 deg) = 1.39); the outer field
    # carries this simple design's barrel compression
    lin = heights/heights[0]/np.array([1., 2., 3., 4.])
    assert np.all(np.abs(lin[:3] - 1.) < .05), lin
    # golden regression pin of the full field curve (solver-tolerance
    # limited)
    nptest.assert_allclose(
        heights, [5.6007, 11.3758, 17.0142, 18.0213], rtol=1e-3)


def test_entrance_distance_serializes_and_seeds():
    """entrance_distance survives the YAML round trip and overrides
    the ladder's starting z."""
    s = fisheye()
    s.object.entrance_distance = 12.5
    s2 = ro.system_from_yaml(ro.system_to_yaml(s))
    nptest.assert_allclose(s2.object.entrance_distance, 12.5)
    s2.update()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        z, a = s2.pupil((0, 1.))
    assert np.isfinite(z)
    assert _chief_stop_residual(s2, 1.) < 1e-3
