"""Multi-host farm path, exercised single-process on the virtual
8-device mesh: per-process shard construction must be topology-
independent (the same global sample set regardless of device
layout)."""

import pytest
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


@pytest.mark.slow
def test_dcn_farm_two_real_processes():
    """tools/dcn_farm.py spawns 2 REAL processes (jax.distributed +
    gloo over localhost: the DCN stand-in), farms the tolerancing
    Monte-Carlo over one 8-device global mesh spanning both, and the
    summary matches a single-process run bit-for-bit (the per-sample
    keys are topology-independent)."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "dcn_farm.py"),
         "--nprocs", "2", "--samples", "64", "--port", "29745"],
        capture_output=True, text=True, timeout=600, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])
    assert got["n_hosts"] == 2
    assert got["n_devices"] == 8

    # single-process reference on this process's 8-device CPU mesh
    import numpy as np
    from rayopt_tpu.models import doublet
    from rayopt_tpu.parallel.multihost import farmed_monte_carlo_rms
    tab = doublet().table()
    rng = np.random.RandomState(0)
    n = 128
    y0 = np.zeros((n, 3))
    y0[:, :2] = rng.uniform(-1, 1, (n, 2))*.9
    u0 = np.zeros((n, 3))
    u0[:, 2] = 1.
    ref = farmed_monte_carlo_rms(tab, y0, u0, n_samples=64, seed=0)
    assert ref["n_hosts"] == 1
    nptest.assert_allclose(got["mean"], ref["mean"], rtol=1e-12)
    nptest.assert_allclose(got["p50"], ref["p50"], rtol=1e-12)
    nptest.assert_allclose(got["rms_sha"],
                           float(np.nansum(ref["rms"])), rtol=1e-12)
