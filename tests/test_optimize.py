"""End-to-end optimization: the scipy-compatible wrapper (reference
API) and the System-level differentiable optimizer."""

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.optimize import PathVariable, FuncOp, optimize
from rayopt_tpu.parallel.grad import optimize_system, \
    bundles_from_system, spot_rms


def _perturbed_cooke():
    s = cooke_triplet()
    s[1].curvature *= 1.02  # detune one surface
    s.update()
    s.paraxial.refocus()
    s.update()
    return s


def test_scipy_optimize_wrapper():
    """Reference-style merit optimization: PathVariable on a curvature,
    FuncOp on the spot RMS (reference optimize.py:93)."""
    s = _perturbed_cooke()

    def rms_op(system):
        g = ro.GeometricTrace(system)
        g.rays_point((0, 0.), nrays=13, distribution="radau",
                     filter=False)
        return g.rms()

    def op(system):
        system.update()
        return rms_op(system)

    v = PathVariable(s, (1, "curvature"),
                     bounds=(.9/21.25, 1.1/21.25))
    o = FuncOp(s, op, weight=1.)
    r0 = rms_op(s)
    r = optimize([v], [o], tol=1e-9, options={"maxiter": 12})
    r.accept()
    s.update()
    r1 = rms_op(s)
    assert r1 < r0


@pytest.mark.slow
def test_optimize_system_grad():
    """Differentiable System-level optimization reduces the
    multi-field multi-wavelength merit."""
    s = _perturbed_cooke()
    bundles = bundles_from_system(s, nrays=16)
    from rayopt_tpu.parallel.grad import trace_rms_merit
    before = float(trace_rms_merit(s.table(), bundles))
    c_before = [e.curvature for e in s]
    hist = optimize_system(s, select=("curvature",), nrays=16,
                           steps=40, lr=5e-5)
    assert hist[-1] < hist[0]
    # values were written back into the elements
    c_after = [e.curvature for e in s]
    assert any(abs(a - b) > 0 for a, b in zip(c_after, c_before))


def test_bundles_shapes():
    s = cooke_triplet()
    bundles = bundles_from_system(s, fields=[0., 1.],
                                  wavelengths=s.wavelengths[:2],
                                  nrays=16)
    assert len(bundles) == 4
    for y0, u0, w, chroma in bundles:
        assert y0.shape == u0.shape
        assert y0.shape[0] == w.shape[0]
        nptest.assert_allclose(np.asarray(w).sum(), 1, rtol=1e-12)
        assert set(chroma) == {"mu", "n_before", "n_after",
                               "wavelength"}
    # the two wavelengths carry different dispersion
    assert not np.allclose(np.asarray(bundles[0][3]["mu"]),
                           np.asarray(bundles[-1][3]["mu"]))


def test_bundles_device_aim_matches_host():
    """The one-dispatch device pupil solve yields merit bundles
    equivalent to the host-aimed ones."""
    s = cooke_triplet()
    host = bundles_from_system(s, fields=[0., 1.],
                               wavelengths=s.wavelengths[:1],
                               nrays=16)
    dev = bundles_from_system(s, fields=[0., 1.],
                              wavelengths=s.wavelengths[:1],
                              nrays=16, device_aim=True)
    for (yh, uh, wh, ch), (yd, ud, wd, cd) in zip(host, dev):
        # seeds agree to the host solver tolerance
        nptest.assert_allclose(np.asarray(yd), np.asarray(yh),
                               rtol=2e-2, atol=2e-2)
        nptest.assert_allclose(np.asarray(ud), np.asarray(uh),
                               rtol=2e-2, atol=1e-3)
