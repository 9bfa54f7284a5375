"""Additional reference-parity coverage: update_stop, reverse-trace
consistency, plot smoke, print dumps, telecentric aiming."""

import numpy as np
from numpy import testing as nptest
import matplotlib

matplotlib.use("agg")

import rayopt_tpu as ro
from rayopt_tpu.models import cooke_triplet, doublet


def test_update_stop():
    s = cooke_triplet()
    r0 = s[s.stop].radius
    s.image.pupil.radius = s.image.pupil.radius  # touch
    s.paraxial.update_stop("image")
    assert np.isfinite(s[s.stop].radius)
    # and the resulting stop still lets the system update
    s[s.stop].radius = r0
    s.update()


def test_reverse_roundtrip():
    """reverse() twice restores the system exactly (the reference only
    guarantees the round trip: a singly-reversed system has a
    degenerate point object, reference test_raytrace.py:84)."""
    s = cooke_triplet()
    p_fwd = s.paraxial.focal_length[1]
    curv = [getattr(e, "curvature", 0.) for e in s]
    dist = [e.distance for e in s]
    s.reverse()
    s.reverse()
    s.update()
    nptest.assert_allclose(
        [getattr(e, "curvature", 0.) for e in s], curv, rtol=1e-14)
    nptest.assert_allclose([e.distance for e in s], dist, rtol=1e-14)
    nptest.assert_allclose(s.paraxial.focal_length[1], p_fwd,
                           rtol=1e-12)


def test_plots_smoke():
    import matplotlib.pyplot as plt
    s = cooke_triplet()
    g = ro.GeometricTrace(s)
    g.rays_paraxial()
    fig, ax = plt.subplots()
    s.plot(ax)
    g.plot(ax)
    s.paraxial.plot(ax, principals=True, pupils=True, focals=True,
                    nodals=True)
    fig2, ax2 = plt.subplots()
    s.paraxial.plot_yybar(ax2)
    gt = ro.GaussianTrace(s)
    fig3, ax3 = plt.subplots()
    gt.plot(ax3)
    plt.close("all")


def test_print_dumps():
    s = cooke_triplet()
    g = ro.GeometricTrace(s)
    g.rays_paraxial()
    text = str(g)
    assert "ray 0" in text
    assert len(text.splitlines()) > 10
    text = str(s.paraxial)
    assert "lagrange" in text
    p = ro.PolyTrace(doublet(), 3)
    assert "maximum order" in str(p)


def test_telecentric_finite_aim():
    c = ro.FiniteConjugate(
        radius=1., pupil=dict(type="radius", distance=50., radius=5.,
                              telecentric=True))
    y, u = c.aim(np.array([[0., 1.]]), np.array([[0., .5]]))
    # telecentric: chief direction parallel to the axis before the
    # pupil offset is applied
    assert np.isfinite(u).all()
    nptest.assert_allclose(np.square(u).sum(-1), 1, atol=1e-12)


def test_system_close():
    s = cooke_triplet()
    s.close()
    nptest.assert_allclose(s.origins[-1], 0, atol=1e-12)


def test_groups():
    s = cooke_triplet()
    groups = list(s.groups())
    assert groups == [[1, 2], [3, 4], [6, 7]]


def test_vignetting_limit_fallback():
    """When the stop edge is unreachable (rays miss surfaces first),
    aiming falls back to the vignetting limit with a warning instead
    of raising (robustness beyond reference system.py:496)."""
    import warnings
    from rayopt_tpu.models.prescriptions import DOUBLE_GAUSS_YAML
    # round 5: the published stop-gap assignment moved the interior
    # vignetting geometry; 22 (vs 14.2) makes the stop edge
    # unreachable again
    yaml_text = DOUBLE_GAUSS_YAML.replace("radius: 11.3",
                                          "radius: 22.")
    s = ro.system_from_yaml(yaml_text)
    s.update()
    g = ro.GeometricTrace(s)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        g.rays_point((0, 1.), nrays=13, distribution="radau",
                     filter=False)
    assert any("vignetting" in str(w.message) for w in wlist)
    # the fallback aims AT the vignetting limit, so edge rays sit on
    # the aperture boundary: most of the bundle must still trace
    alive = np.isfinite(g.y[-1][:, :2]).all(1)
    assert alive.sum() >= 10, alive.sum()
    pts = g.y[-1][alive, :2]
    assert np.isfinite(np.sqrt(
        np.square(pts - pts.mean(0)).sum(1).mean()))


def test_fold_mirror_45deg():
    """A flat mirror tilted 45 degrees folds the axis to +y: the
    jitted engine handles tilted elements (rot_normal path) exactly
    like the host transforms."""
    s = ro.System([
        dict(material="vacuum"),
        dict(material="mirror", distance=10.,
             angles=(np.pi/4, 0, 0)),
        dict(material="vacuum", distance=-10.,
             direction=(0, 1., 0), radius=1.),
    ])
    g = ro.GeometricTrace(s)
    y = np.zeros((3, 3))
    y[:, 1] = (0., .5, -.5)
    u = np.tile([0., 0, 1.], (3, 1))
    g.rays_given(y, u)
    g.propagate()
    # the fold preserves the bundle and inverts the transverse axis
    nptest.assert_allclose(g.y[-1][:, 2], 0, atol=1e-12)
    nptest.assert_allclose(g.y[-1][:, 1], (0., -.5, .5), atol=1e-12)
    # reflected direction in the mirror's normal frame: 45-45
    nptest.assert_allclose(np.abs(g.u[1][:, 1:]), 2**-.5, atol=1e-12)
    # path length bookkeeping: 10 up + 10 over
    nptest.assert_allclose(g.t[1:, 0].sum(), 20., atol=1e-12)
