"""Monte-Carlo tolerancing over vmapped perturbed tables."""

import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sensitivity_matches_finite_difference():
    """jax.grad sensitivities agree with central differences of the
    re-traced RMS for a couple of probe parameters."""
    import jax
    from rayopt_tpu.parallel.tolerancing import (
        sensitivity, _rms_of_table)
    s = doublet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    sens = sensitivity(tab, y0, u0, w, fields=("curvature",))
    rms = jax.jit(lambda t: _rms_of_table(t, y0, u0, np.asarray(w)))
    eps = 1e-7
    for j in (1, 2):
        c = np.array(tab.curvature)
        up, dn = c.copy(), c.copy()
        up[j] += eps
        dn[j] -= eps
        fd = (float(rms(tab.replace(curvature=up)))
              - float(rms(tab.replace(curvature=dn))))/(2*eps)
        np.testing.assert_allclose(sens["curvature"]["grad"][j], fd,
                                   rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_inverse_sensitivity_hits_budget():
    """The returned tolerance, applied worst-sign, degrades the RMS by
    (approximately) the requested budget -- certified by re-trace."""
    import jax
    from rayopt_tpu.parallel.tolerancing import (
        inverse_sensitivity, _rms_and_weight)
    s = doublet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    budget = 5e-4
    inv = inverse_sensitivity(tab, y0, u0, budget, w=w,
                              fields=("curvature",))
    rms0 = inv["nominal_rms"]
    tol = inv["curvature"]["tolerance"]
    ach = inv["curvature"]["achieved"]
    rms = jax.jit(lambda t: _rms_and_weight(t, y0, u0,
                                            np.asarray(w))[0])
    # surfaces with real glass power: check the certificate by
    # re-tracing at +-tol and verifying the worst degradation is
    # within 25% of the budget (grid + log interpolation error)
    for j in np.flatnonzero(np.asarray(tab.mu) != 1.)[:3]:
        if not np.isfinite(tol[j]) or ach[j] <= 0:
            continue
        worst = 0.
        for sgn in (+1., -1.):
            c = np.array(tab.curvature)
            c[j] += sgn*tol[j]
            worst = max(worst,
                        float(rms(tab.replace(curvature=c))) - rms0)
        np.testing.assert_allclose(worst, budget, rtol=.25)


@pytest.mark.slow
def test_inverse_sensitivity_insensitive_parameter():
    """A parameter the merit ignores reports a capped tolerance, not a
    spurious small one."""
    from rayopt_tpu.parallel.tolerancing import inverse_sensitivity
    s = doublet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    inv = inverse_sensitivity(tab, y0, u0, 5e-4, w=w,
                              fields=("distance",), t_max=10.)
    # element 1's distance (lens position vs the infinite object)
    # does not move the spot: tolerance must ride the cap
    assert inv["distance"]["tolerance"][1] >= 1.


def test_compensated_focus_tolerancing():
    """compensate_focus scores each Monte-Carlo sample at its own
    closed-form best focus: compensated RMS <= uncompensated for
    every sample, the compensated nominal matches an explicit scan
    over image-plane shifts, and the farm reproduces it."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.ops.geometric import trace_rays_final
    s = cooke_triplet()
    tab = s.table()
    n = 32
    rng = np.random.RandomState(1)
    y0 = np.zeros((n, 3))
    y0[:, :2] = rng.uniform(-1, 1, (n, 2))*s.object.pupil.radius*.9
    u0 = np.zeros((n, 3))
    u0[:, 2] = 1.
    w = np.ones(n)/n
    sig = {"distance": 0.2}
    r_plain = tolerance_analysis(tab, y0, u0, w, sigmas=sig,
                                 n_samples=32, seed=4)
    r_comp = tolerance_analysis(tab, y0, u0, w, sigmas=sig,
                                n_samples=32, seed=4,
                                compensate_focus=True)
    assert np.all(r_comp["rms"] <= r_plain["rms"] + 1e-12)
    assert r_comp["p90"] < r_plain["p90"]

    # oracle: explicit defocus scan at the nominal design
    y, u, t = trace_rays_final(tab, y0, u0)
    y, u = np.asarray(y), np.asarray(u)
    q = u[:, :2]/u[:, 2:3]
    best = np.inf
    for dz in np.linspace(-1., 1., 4001):
        pt = y[:, :2] + dz*q
        best = min(best, float(np.sqrt(
            (w*np.square(pt - (w[:, None]*pt).sum(0)).sum(1)).sum())))
    np.testing.assert_allclose(r_comp["nominal"], best, rtol=1e-4)

    mesh = Mesh(np.asarray(__import__("jax").devices()), ("samples",))
    r_farm = tolerance_analysis(tab, y0, u0, w, sigmas=sig,
                                n_samples=32, seed=4, mesh=mesh,
                                compensate_focus=True)
    np.testing.assert_allclose(r_farm["rms"], r_comp["rms"],
                               rtol=1e-12)


@pytest.mark.slow
def test_sensitivity_adjoint_engine():
    """sensitivity(engine='adjoint') routes the reverse pass through
    the analytic-adjoint Pallas merit: first-order sensitivities --
    including pose (tilt/decenter), whose rows with_pose keeps live --
    match the scan engine on every slot the specialization keeps
    (exact-zero parameters bake out BY DESIGN and warn); second_order
    is reverse-only and raises with guidance."""
    from rayopt_tpu.parallel.tolerancing import sensitivity
    s = doublet()
    tab = s.table()
    rng = np.random.RandomState(0)
    n = 128
    r = s.object.pupil.radius
    sl = s.object.pupil.slope
    y0 = np.zeros((n, 3))
    y0[:, :2] = rng.uniform(-1, 1, (n, 2))*.8*r
    u0 = np.zeros((n, 3))
    u0[:, :2] = rng.uniform(-1, 1, (n, 2))*.3*sl
    u0[:, 2] = np.sqrt(1 - np.square(u0[:, :2]).sum(1))
    flds = ("curvature", "distance", "tilt", "decenter")
    ref = sensitivity(tab, y0, u0, fields=flds, second_order=False)
    adj = sensitivity(tab, y0, u0, fields=flds, second_order=False,
                      engine="adjoint", tile=128, interpret=True)
    for f in flds:
        a, b = ref[f]["grad"], adj[f]["grad"]
        live = np.asarray(b) != 0
        assert live.sum() >= (12 if f in ("tilt", "decenter") else 3), f
        d = np.abs(np.where(live, a - b, 0.)).max()
        assert d < 1e-9*max(1., np.abs(a).max()), (f, d)
    with pytest.raises(ValueError):
        sensitivity(tab, y0, u0, fields=flds, engine="adjoint")


def test_compensator_reoptimization_matches_focus_oracle():
    """Per-sample compensator descent on the IMAGE air gap must
    reproduce the closed-form best-focus optimum: moving the last
    distance shifts every landing point by exactly dz*(u_xy/u_z), the
    same one-parameter family _best_focus_rms minimizes in closed
    form -- so the descended merit converges to it from above."""
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel.tolerancing import (
        compensated_monte_carlo_rms)
    import jax
    s = cooke_triplet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    n = 16
    tables = perturbed_tables(tab, jax.random.PRNGKey(7), n,
                              {"distance": 0.15})
    last = tab.distance.shape[0] - 1
    out = compensated_monte_carlo_rms(
        tables, y0, u0, w, {"distance": [last]}, steps=120, lr=2e-2)
    rms_bf = np.asarray(monte_carlo_rms(tables, y0, u0, w,
                                        compensate_focus=True))
    rms = np.asarray(out["rms"])
    rms0 = np.asarray(out["rms0"])
    assert np.all(np.isfinite(rms))
    # never worse than as-built, never better than the exact optimum
    assert np.all(rms <= rms0 + 1e-12)
    assert np.all(rms >= rms_bf - 1e-9)
    # and the descent actually converges to that optimum
    assert rms.mean() <= 1.15*rms_bf.mean()
    assert out["params"]["distance"].shape == (n, 1)


def test_tilt_compensator_recovers_wedge():
    """"As adjusted" tolerancing: random surface tilts (wedge-like
    build errors) scored after re-tilting one compensator surface per
    sample -- the adjustment must recover merit on every sample and
    meaningfully on average."""
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel.tolerancing import (
        compensated_monte_carlo_rms)
    import jax
    s = cooke_triplet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    tables = perturbed_tables(tab, jax.random.PRNGKey(3), 12,
                              {"tilt": 2e-3})
    out = compensated_monte_carlo_rms(
        tables, y0, u0, w, {"tilt": [1]}, steps=60, lr=5e-4,
        compensate_focus=True)
    rms = np.asarray(out["rms"])
    rms0 = np.asarray(out["rms0"])
    assert np.all(np.isfinite(rms))
    assert np.all(rms <= rms0 + 1e-12)
    assert rms.mean() < 0.98*rms0.mean()


def test_compensated_tolerancing_sharded_matches_vmap():
    """The mesh-farmed compensated Monte-Carlo reproduces the
    single-device descent (pure batch parallelism)."""
    import jax
    from jax.sharding import Mesh
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.parallel.tolerancing import (
        compensated_monte_carlo_rms)
    s = cooke_triplet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    tables = perturbed_tables(tab, jax.random.PRNGKey(5), 16,
                              {"curvature": 2e-4, "distance": 0.05})
    last = tab.distance.shape[0] - 1
    kw = dict(steps=25, lr=1e-2, compensate_focus=False)
    ref = compensated_monte_carlo_rms(
        tables, y0, u0, w, {"distance": [last]}, **kw)
    mesh = Mesh(np.asarray(jax.devices()), ("samples",))
    far = compensated_monte_carlo_rms(
        tables, y0, u0, w, {"distance": [last]}, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(far["rms"]),
                               np.asarray(ref["rms"]), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(far["params"]["distance"]),
        np.asarray(ref["params"]["distance"]), rtol=1e-9)


def test_tolerance_analysis_with_compensators():
    """tolerance_analysis(compensators=) wires the as-adjusted path:
    quantiles come from the compensated distribution and the
    uncompensated stats ride along."""
    from rayopt_tpu.models import cooke_triplet
    s = cooke_triplet()
    tab = s.table()
    y0, u0, w = _bundle(s)
    last = tab.distance.shape[0] - 1
    r = tolerance_analysis(tab, y0, u0, w,
                           sigmas={"distance": 0.1},
                           n_samples=16, seed=2,
                           compensators={"distance": [last]},
                           comp_steps=40, comp_lr=2e-2)
    assert "rms_uncompensated" in r
    assert r["mean"] <= r["mean_uncompensated"] + 1e-12
    assert np.all(r["rms"] <= r["rms_uncompensated"] + 1e-12)
