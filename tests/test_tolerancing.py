"""Monte-Carlo tolerancing over vmapped perturbed tables."""

import numpy as np

from rayopt_tpu.models import doublet
from rayopt_tpu.parallel.tolerancing import (
    perturbed_tables, monte_carlo_rms, tolerance_analysis)
from rayopt_tpu.utils.distributions import pupil_distribution


def _bundle(s, n=32):
    ref, xy, w = pupil_distribution("radau", n)
    m = xy.shape[0]
    y0 = np.zeros((m, 3))
    u0 = np.zeros((m, 3))
    u0[:, :2] = xy*s.object.pupil.slope
    u0[:, 2] = np.sqrt(1 - np.square(u0[:, :2]).sum(1))
    return y0, u0, w


def test_tolerance_analysis():
    s = doublet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    r = tolerance_analysis(tab, y0, u0, w,
                           sigmas={"curvature": 2e-4},
                           n_samples=64, seed=1)
    assert r["rms"].shape == (64,)
    assert np.isfinite(r["rms"]).all()
    assert r["p99"] >= r["p90"] >= r["p50"]
    # the nominal merit lies within the sampled distribution
    assert r["rms"].min() <= r["nominal"] <= r["rms"].max()
    # the perturbations actually move the merit
    assert r["rms"].std() > 0


def test_zero_sigma_is_nominal():
    import jax
    s = doublet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    tables = perturbed_tables(tab, jax.random.PRNGKey(0), 8,
                              {"curvature": 0.})
    rms = np.asarray(monte_carlo_rms(tables, y0, u0, w))
    assert np.allclose(rms, rms[0])


def test_sharded_farm_matches_single():
    """Monte-Carlo samples farmed over the 8-device mesh reproduce the
    single-device distribution exactly (pure batch parallelism, no
    collectives)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel import tolerance_analysis
    s = cooke_triplet()
    tab = s.table()
    n = 128
    rng = np.random.RandomState(0)
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))
    u = np.zeros((n, 3))
    u[:, 2] = 1.
    single = tolerance_analysis(tab, y, u, n_samples=64, seed=3)
    mesh = Mesh(np.asarray(jax.devices()), ("samples",))
    farmed = tolerance_analysis(tab, y, u, n_samples=64, seed=3,
                                mesh=mesh)
    np.testing.assert_allclose(farmed["rms"], single["rms"],
                               rtol=1e-12)


def test_aberration_tolerance_nominal_matches_host():
    """The vmapped Seidel tolerancing nominal row equals the host
    PolyTrace seidel sums."""
    import numpy as np
    from numpy import testing as nptest
    from rayopt_tpu import PolyTrace
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel import aberration_tolerance
    s = cooke_triplet()
    s.update()
    tab = s.table(s.wavelengths[0])
    host = PolyTrace(s, 3)
    want = dict(host.seidel(*host.st()))
    out = aberration_tolerance(tab, s.object.pupil.distance,
                               n_samples=16, kmax=3,
                               telecentric=host.telecentric())
    got = out["nominal"]
    for i, name in enumerate(("s1", "s2", "s3", "s4", "s5")):
        nptest.assert_allclose(got[i], want[name], rtol=1e-9,
                               atol=1e-12, err_msg=name)
    assert out["seidel"].shape == (16, 5)
    assert np.all(out["std"] >= 0)


def test_aberration_tolerance_mesh_parity():
    """Sample farming over the 8-device mesh returns the same Seidel
    distribution as the single-device vmap."""
    import numpy as np
    from numpy import testing as nptest
    from rayopt_tpu import system_from_yaml
    from rayopt_tpu.parallel import aberration_tolerance
    from rayopt_tpu.parallel.sharding import ray_mesh
    from tests.test_poly import DOUBLET
    s = system_from_yaml(DOUBLET)
    tab = s.table(s.wavelengths[0])
    pd = s.object.pupil.distance
    single = aberration_tolerance(tab, pd, n_samples=16, kmax=3)
    mesh = ray_mesh(axis="samples")
    farmed = aberration_tolerance(tab, pd, n_samples=16, kmax=3,
                                  mesh=mesh)
    nptest.assert_allclose(farmed["seidel"], single["seidel"],
                           rtol=1e-12)
