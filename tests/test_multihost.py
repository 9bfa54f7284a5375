"""Multi-host farm path, exercised single-process on the virtual
8-device mesh: per-process shard construction must be topology-
independent (the same global sample set regardless of device
layout)."""

import numpy as np
from numpy import testing as nptest

import jax
from jax.sharding import Mesh

from rayopt_tpu.models import cooke_triplet
from rayopt_tpu.parallel.multihost import (farm_mesh,
                                           farmed_monte_carlo_rms)


def _inputs():
    s = cooke_triplet()
    s.update()
    tab = s.table()
    rng = np.random.RandomState(0)
    n = 64
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*4.
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    return tab, y, u


def test_farm_topology_independent():
    tab, y, u = _inputs()
    full = farm_mesh()
    assert full.devices.size == 8
    one = Mesh(np.asarray(jax.devices()[:1]), ("samples",))
    r8 = farmed_monte_carlo_rms(tab, y, u, n_samples=16, seed=3,
                                mesh=full)
    r1 = farmed_monte_carlo_rms(tab, y, u, n_samples=16, seed=3,
                                mesh=one)
    # identical global sample set and results on any topology
    nptest.assert_allclose(r8["rms"], r1["rms"], rtol=1e-12)
    assert r8["n_devices"] == 8 and r1["n_devices"] == 1


def test_farm_stats_sane():
    tab, y, u = _inputs()
    out = farmed_monte_carlo_rms(tab, y, u, n_samples=24, seed=0)
    assert out["rms"].shape == (24,)
    assert np.isfinite(out["rms"]).all()
    assert out["p50"] <= out["p90"] <= out["p99"]
    assert out["n_hosts"] == 1
    # perturbations actually vary the merit
    assert out["rms"].std() > 0
