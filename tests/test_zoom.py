"""Multi-configuration (zoom) systems: configuration overrides with
solve-driven refocus, stacked config tables, serialization, and joint
differentiable optimization across zoom positions (beyond reference:
rayopt has no multi-configuration support)."""

import pytest
import numpy as np
from numpy import testing as nptest

import rayopt_tpu as ro
from rayopt_tpu.models import zoom_telephoto


def test_zoom_configurations_golden():
    """The two zoom positions hit their pinned focal lengths, each
    refocused automatically by the back-focus solve."""
    s = zoom_telephoto()
    assert s.n_configurations == 2
    efl = []
    for i in range(2):
        si = s.at_configuration(i)
        efl.append(float(si.paraxial.focal_length[1]))
        # compensator: marginal ray height at the image is solved to 0
        nptest.assert_allclose(si.paraxial.y[-1, 0], 0., atol=1e-8)
    nptest.assert_allclose(efl, [88.738, 126.473], rtol=1e-3)
    # at_configuration leaves the original untouched
    assert s[3].distance == s.at_configuration(0)[3].distance


def test_zoom_apply_in_place_and_round_trip():
    s = zoom_telephoto()
    s.apply_configuration(1)
    nptest.assert_allclose(s[3].distance, 4.)
    s2 = ro.system_from_yaml(ro.system_to_yaml(s))
    assert s2.n_configurations == 2
    s2.apply_configuration(0)
    nptest.assert_allclose(s2[3].distance, 12.)
    nptest.assert_allclose(
        float(s2.paraxial.focal_length[1]), 88.738, rtol=1e-3)


def test_zoom_config_tables_and_multi_trace():
    """config_tables stacks per-configuration SurfaceTables; the
    batched engine traces both zoom positions in one dispatch and
    agrees with the per-config traces."""
    from rayopt_tpu.ops.geometric import (trace_rays_final,
                                          trace_rays_final_multi)
    s = zoom_telephoto()
    tabs = s.config_tables()
    assert np.asarray(tabs.curvature).shape[0] == 2
    n = 64
    rng = np.random.RandomState(0)
    y = np.zeros((2, n, 3))
    y[..., :2] = rng.uniform(-1, 1, (2, n, 2))*4.
    u = np.zeros((2, n, 3))
    u[..., 2] = 1.
    yf, uf, tf = trace_rays_final_multi(tabs, y, u)
    for i in range(2):
        ti = s.at_configuration(i).table()
        yi = trace_rays_final(ti, y[i], u[i])[0]
        nptest.assert_allclose(np.asarray(yf)[i], np.asarray(yi),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_optimize_zoom_shares_curvatures():
    """Joint optimization improves the summed merit over BOTH zoom
    positions with one shared set of curvatures; per-config geometry
    (variator gap, solved compensator) stays distinct."""
    from rayopt_tpu.parallel import optimize_zoom
    s = zoom_telephoto()
    tabs, hist = optimize_zoom(s, select=("curvature",), nrays=16,
                               steps=8, lr=1e-5)
    assert hist[-1] < hist[0]
    c0 = np.asarray(tabs[0].curvature)
    c1 = np.asarray(tabs[1].curvature)
    nptest.assert_allclose(c1, c0)  # shared shapes
    d0 = np.asarray(tabs[0].distance)
    d1 = np.asarray(tabs[1].distance)
    assert abs(d0[3] - d1[3]) > 7.  # zoom geometry preserved
    # write_back landed the shared curvatures in the System
    nptest.assert_allclose(
        [e.curvature for e in s if hasattr(e, "curvature")],
        c0[[hasattr(e, "curvature") for e in s]], rtol=0, atol=0)
    import pytest
    with pytest.raises(AssertionError):
        optimize_zoom(s, select=("distance",), steps=1)


@pytest.mark.slow
def test_optimize_zoom_on_mesh_with_padding():
    """optimize_zoom(mesh=) commits every configuration's closure
    data to the mesh and shards the rays; quadrature bundle sizes
    that don't divide the mesh are zero-weight padded, so the sharded
    merit trajectory matches the unsharded one exactly."""
    import jax
    from rayopt_tpu.parallel import optimize_zoom, ray_mesh
    s1 = zoom_telephoto()
    tabs, hist = optimize_zoom(s1, select=("curvature",), nrays=16,
                               steps=3, lr=1e-6, mesh=ray_mesh())
    for leaf in jax.tree_util.tree_leaves(tabs[0]):
        if isinstance(leaf, jax.Array):
            assert all(d.platform == "cpu" for d in leaf.devices())
    s2 = zoom_telephoto()
    _, hist2 = optimize_zoom(s2, select=("curvature",), nrays=16,
                             steps=3, lr=1e-6)
    nptest.assert_allclose(hist, hist2, rtol=1e-12)


def test_configuration_guards():
    """Out-of-range indices and value-less specs raise with context
    instead of silently no-opping."""
    import pytest
    s = zoom_telephoto()
    with pytest.raises(IndexError):
        s.apply_configuration(5)
    with pytest.raises(IndexError):
        s.apply_configuration(-1)
    from rayopt_tpu.models import cooke_triplet
    c = cooke_triplet()
    c.apply_configuration(0)  # index 0 always valid (single config)
    with pytest.raises(IndexError):
        c.apply_configuration(1)
    s.configurations[0][0] = {"set": [3, "distance"]}
    with pytest.raises(KeyError):
        s.apply_configuration(0)
