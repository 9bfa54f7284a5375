"""Batched jit chief-ray aiming vs the host newton solver."""

import pytest
import numpy as np
from numpy import testing as nptest

from rayopt_tpu.models import cooke_triplet, double_gauss
from rayopt_tpu.ops.aiming import aim_chief_batched
from rayopt_tpu.ops.kernels import specialize


def _check(s, fields, rtol):
    from rayopt_tpu.ops.aiming import _stop_height
    import jax.numpy as jnp
    tab = s.table()
    specs = specialize(tab)
    z0 = s.object.pupil.distance
    p = s.object.pupil.radius
    # rectilinear projection: tangent = fractional field * tan(angle)
    # (reference conjugates.py:212)
    tangents = np.asarray(fields)*np.tan(s.object.angle)
    ft = np.stack([np.zeros_like(tangents), tangents], 1)
    z_batched = np.asarray(aim_chief_batched(tab, ft, z0, s.stop,
                                             specs=specs))
    for f, t, zb in zip(fields, tangents, z_batched):
        if f == 0:
            continue  # on-axis: any z works
        # the batched Newton converges the chief-ray merit well below
        # the host solver's 1e-3 tolerance (reference system.py:466)
        m = np.asarray(_stop_height(tab, specs, s.stop,
                                    jnp.array([0.]), jnp.array([t]),
                                    jnp.array([zb])))[0]
        assert abs(m) < 1e-8, (f, m)
        # and agrees with the host wherever the host actually iterated
        zh = s.aim_chief(np.array((0., f)), z0, p)
        if abs(zh - z0) > 1e-12:
            nptest.assert_allclose(zb, zh, rtol=rtol)


def test_matches_host_cooke():
    s = cooke_triplet()
    _check(s, [0., .3, .7, 1.], rtol=1e-3)


def test_matches_host_double_gauss():
    s = double_gauss()
    _check(s, [.5, 1.], rtol=1e-3)


def test_batch_is_one_dispatch():
    s = cooke_triplet()
    tab = s.table()
    specs = specialize(tab)
    ft = np.stack([np.zeros(32),
                   np.linspace(0.01, 1, 32)*np.tan(s.object.angle)], 1)
    z = np.asarray(aim_chief_batched(tab, ft,
                                     s.object.pupil.distance,
                                     s.stop, specs=specs))
    assert z.shape == (32,)
    assert np.isfinite(z).all()
    # solved distances vary smoothly with field
    assert (np.diff(z) != 0).any()


def test_marginal_batched_matches_host():
    from rayopt_tpu.ops.aiming import aim_marginal_batched
    s = cooke_triplet()
    tab = s.table()
    specs = specialize(tab)
    z0 = s.object.pupil.distance
    p0 = s.object.pupil.radius
    fields = [0., .7, 1.]
    tangents = np.asarray(fields)*np.tan(s.object.angle)
    ft = np.stack([np.zeros_like(tangents), tangents], 1)
    # per-field chief-solved pupil distances, as the host uses
    zb = np.array(aim_chief_batched(tab, ft, z0, s.stop, specs=specs))
    zb[0] = z0
    for direction, sig, ax in (((0., 1.), 1, 1), ((0., -1.), 0, 1),
                               ((1., 0.), 1, 0)):
        a_b = np.asarray(aim_marginal_batched(
            tab, ft, zb, p0, s.stop, specs=specs,
            direction=direction))
        for f, ab in zip(fields, a_b):
            zh, ph = s.pupil((0., f))
            # host solves the same merit to tol 1e-3; the batched
            # bisection is much tighter, so compare loosely
            host = abs(ph[sig, ax])
            nptest.assert_allclose(abs(ab), host, rtol=2e-2)


def test_finite_conjugate_matches_host():
    """Device aiming covers finite conjugates (previously host-only,
    reference system.py:557-583)."""
    from rayopt_tpu.models import doublet
    s = doublet()
    s.object.pupil.aim = True
    s.update()
    fields = np.array([(0., 0.), (0., .5), (0., 1.), (.6, .3)])
    z, boxes = s.pupils(fields)
    assert np.isfinite(z).all() and np.isfinite(boxes).all()
    for i, f in enumerate(fields):
        zh, ph = s.pupil(tuple(f))
        if np.any(f):
            nptest.assert_allclose(z[i], zh, rtol=1e-3)
        nptest.assert_allclose(boxes[i], ph, rtol=2e-2, atol=1e-9)


def test_rim_mode_matches_host():
    """Rim (stop=-1) vignetting mode: the batched clearance maxes over
    all interior surfaces like the host (reference system.py:528-555);
    this is the solve behind rays_clipping."""
    s = cooke_triplet()
    fields = np.array([(0., .7), (0., 1.)])
    z, boxes = s.pupils(fields, stop=-1)
    for i, f in enumerate(fields):
        zh, ph = s.pupil(tuple(f), stop=-1)
        nptest.assert_allclose(z[i], zh, rtol=1e-3)
        nptest.assert_allclose(boxes[i], ph, rtol=2e-2, atol=1e-9)


def test_wideangle_projection_matches_host():
    """Non-rectilinear projections run device-side."""
    s = cooke_triplet()
    s.object.projection = "stereographic"
    s._pupil_cache.clear()
    fields = np.array([(0., .5), (0., 1.)])
    z, boxes = s.pupils(fields)
    for i, f in enumerate(fields):
        zh, ph = s.pupil(tuple(f))
        nptest.assert_allclose(z[i], zh, rtol=1e-3)
        nptest.assert_allclose(boxes[i], ph, rtol=2e-2, atol=1e-9)


def test_residuals_bounded():
    """Convergence is certified by residuals, not iteration count."""
    from rayopt_tpu.ops.aiming import pupil_batched
    s = cooke_triplet()
    tab = s.table()
    fields = np.array([(0., .3), (0., .7), (0., 1.)])
    z, boxes, (chief_r, width) = pupil_batched(
        tab, fields, s.object.pupil.distance, s.object.pupil.radius,
        s.stop, specs=specialize(tab),
        slope=np.tan(s.object.angle), with_residuals=True)
    assert (np.asarray(chief_r) < 1e-8).all()
    assert (np.asarray(width) < 1e-9).all()


def test_pupils_host_fallback():
    """Unaimed pupils take the host path (and agree with it)."""
    from rayopt_tpu.models import doublet
    s = doublet()   # aim defaults to False
    fields = np.array([(0., 1.)])
    z, boxes = s.pupils(fields)
    zh, ph = s.pupil((0., 1.))
    nptest.assert_allclose(z[0], zh)
    nptest.assert_allclose(boxes[0], ph)


def test_pupil_batched_matches_host():
    from rayopt_tpu.ops.aiming import pupil_batched
    s = cooke_triplet()
    tab = s.table()
    specs = specialize(tab)
    fields = [0., .7, 1.]
    tangents = np.asarray(fields)*np.tan(s.object.angle)
    ft = np.stack([np.zeros_like(tangents), tangents], 1)
    z, boxes = pupil_batched(tab, ft, s.object.pupil.distance,
                             s.object.pupil.radius, s.stop,
                             specs=specs)
    z, boxes = np.array(z), np.asarray(boxes)
    for i, f in enumerate(fields):
        zh, ph = s.pupil((0., f))
        if f:
            nptest.assert_allclose(z[i], zh, rtol=1e-3)
        nptest.assert_allclose(boxes[i], ph, rtol=2e-2)


@pytest.mark.slow
def test_rim_aiming_sees_extended_vocabulary():
    """Rim-mode (stop=-1) device aiming must trace the full surface
    vocabulary: on a kinoform-bearing system the DOE kick moves the
    vignetting-limited pupil box vs the bare-substrate trace."""
    import numpy as np
    import rayopt_tpu as ro
    lam = 550e-9
    a1 = -np.pi/((lam/1e-3)*60.)
    def build(pc):
        s = ro.System([
            dict(material="air"),
            dict(roc=80., distance=5., material="glass/N-BK7",
                 radius=9.),
            dict(type="binary2", distance=3., material="air",
                 radius=9., phase_coefficients=pc, norm_radius=1.),
            dict(distance=30., radius=4.),
            dict(distance=30., radius=12.),
        ], wavelengths=[lam], object=dict(
            angle_deg=2., pupil=dict(radius=6., aim=True)), stop=3)
        s.update()
        return s
    z1, box1 = build([a1]).pupils([(0., 1.)], stop=-1)
    z0, box0 = build([]).pupils([(0., 1.)], stop=-1)
    # the kick strongly converges the bundle: the rim-limited pupil
    # box must widen vs the substrate-only system
    assert abs(np.asarray(box1) - np.asarray(box0)).max() > 0.2
