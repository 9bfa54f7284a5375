"""Glass optimization (rayopt_tpu.glass): the continuous (nd, vd)
relaxation, the differentiable polychromatic merit, flint discovery
through the differentiable paraxial color merit, and catalog
substitution.

The deterministic oracle is the thin-lens achromat condition
phi1/v1 + phi2/v2 = 0: with the doublet's curvatures FIXED and only
the second element's Abbe number free, gradient descent on the
paraxial back-focal-spread merit must converge to the (thick-lens
exact) flint solution next to the analytic prediction."""

import numpy as np
from numpy import testing as nptest
import pytest

import jax
import jax.numpy as jnp

import rayopt_tpu as ro
from rayopt_tpu import glass as GL
from rayopt_tpu.materials import (AbbeMaterial, lambda_d, lambda_C,
                                  lambda_F)
from rayopt_tpu.ops.paraxial import paraxial_solve_image


def _doublet(pupil=3.):
    s = ro.System([
        dict(material="air"),
        dict(roc=60., distance=5., material="SCHOTT-BK|N-BK7",
             radius=12.),
        dict(roc=-45., distance=6., material="SCHOTT-BK|N-BK7",
             radius=12.),
        dict(roc=-150., distance=2., material="air", radius=12.),
        dict(distance=95., radius=3.),
    ])
    s.wavelengths = [lambda_d, lambda_F, lambda_C]
    s.object.pupil.radius = pupil
    s.object.pupil.update_radius = False
    s.update()
    return s


def test_abbe_index_matches_material():
    m = AbbeMaterial(n=1.6123, v=37.4)
    for lam in (lambda_d, lambda_F, lambda_C, 550e-9):
        nptest.assert_allclose(
            float(GL.abbe_index(1.6123, 37.4, lam)),
            m.refractive_index(lam), rtol=0, atol=1e-15)


def test_glass_assignment():
    s = _doublet()
    ab, aa, owners = GL.glass_assignment(s)
    nptest.assert_array_equal(ab, [-1, -1, 0, 1, -1])
    nptest.assert_array_equal(aa, [-1, 0, 1, -1, -1])
    assert owners == [1, 2]
    nd0, vd0 = GL.initial_glass_params(s, owners)
    nptest.assert_allclose(nd0, 1.5168, atol=2e-4)
    nptest.assert_allclose(vd0, 64.17, atol=0.1)
    # mirrors reject
    m = ro.System([
        dict(material="air"),
        dict(roc=-100., distance=10., material="mirror", radius=12.),
        dict(distance=-45., radius=3.),
    ])
    m.update()
    with pytest.raises(NotImplementedError, match="mirror"):
        GL.glass_assignment(m)


def test_glass_tables_reproduces_abbe_system():
    """A System built from AbbeMaterials is reproduced exactly by the
    differentiable rewrite at the same (nd, vd)."""
    s = ro.System([
        dict(material="air"),
        dict(roc=60., distance=5., material="1.589/61.2", radius=12.),
        dict(roc=-45., distance=6., material="1.62/36.3", radius=12.),
        dict(roc=-150., distance=2., material="air", radius=12.),
        dict(distance=95., radius=3.),
    ])
    s.wavelengths = [lambda_d, lambda_F, lambda_C]
    s.update()
    asg = GL.glass_assignment(s)
    nd0, vd0 = GL.initial_glass_params(s, asg[2])
    tabs = s.tables()
    # scrub the GLASS-OWNED index slots (air rows keep their real
    # index, 1.000277 -- the rewrite leaves them untouched), then
    # rebuild them from the parameters
    nb = np.asarray(tabs.n_before).copy()
    na = np.asarray(tabs.n_after).copy()
    nb[:, [2, 3]] = 1.
    na[:, [1, 2]] = 1.
    scrubbed = tabs.replace(n_before=jnp.asarray(nb),
                            n_after=jnp.asarray(na),
                            mu=jnp.ones_like(tabs.mu))
    rebuilt = GL.glass_tables(scrubbed, nd0, vd0, asg, s.wavelengths)
    # glass-owned rows match the host lowering to rounding
    for g, rows in ((0, [(1, "n_after"), (2, "n_before")]),
                    (1, [(2, "n_after"), (3, "n_before")])):
        for j, field in rows:
            nptest.assert_allclose(
                np.asarray(getattr(rebuilt, field))[:, j],
                np.asarray(getattr(tabs, field))[:, j],
                rtol=0, atol=1e-12)
    nptest.assert_allclose(np.asarray(rebuilt.mu)[:, 1:4],
                           np.asarray(tabs.mu)[:, 1:4],
                           rtol=0, atol=1e-12)


def test_glass_box_roundtrip():
    nd = np.array([1.5168, 1.92])
    vd = np.array([64.2, 20.9])
    xi_nd, xi_vd = GL.glass_box_encode(nd, vd)
    nd2, vd2 = GL.glass_box_decode(jnp.asarray(xi_nd),
                                   jnp.asarray(xi_vd))
    nptest.assert_allclose(np.asarray(nd2), nd, rtol=1e-12)
    nptest.assert_allclose(np.asarray(vd2), vd, rtol=1e-12)


def test_flint_discovery():
    """Fixed curvatures, free vd2: gradient descent on the
    differentiable paraxial back-focal-spread merit converges to the
    achromat flint, next to the thin-lens analytic prediction."""
    import optax
    s = _doublet()
    asg = GL.glass_assignment(s)
    nd0, vd0 = GL.initial_glass_params(s, asg[2])
    tabs = s.tables()
    n = 1.5168
    phi1 = (n - 1)*(1/60. + 1/45.)
    phi2 = (n - 1)*(-1/45. + 1/150.)
    v2_thin = vd0[0]*abs(phi2)/phi1        # ~25.7

    y0p = jnp.asarray([1., 0.])
    u0p = jnp.asarray([0., 1e-6])

    def spread2(xi_vd):
        _, vd1 = GL.glass_box_decode(jnp.zeros(1), xi_vd)
        vd = jnp.concatenate([jnp.asarray(vd0[:1]), vd1])
        tb = GL.glass_tables(tabs, jnp.asarray(nd0), vd, asg,
                             s.wavelengths)
        fd = jax.vmap(lambda t_: paraxial_solve_image(t_, y0p, u0p)
                      )(tb)
        return jnp.square(fd - fd.mean()).sum()

    xi = jnp.asarray(GL.glass_box_encode([nd0[1]], [vd0[1]])[1])
    v0 = float(spread2(xi))
    opt = optax.adam(0.05)
    st = opt.init(xi)
    vg = jax.jit(jax.value_and_grad(spread2))
    for _ in range(500):
        _, g = vg(xi)
        up, st = opt.update(g, st, xi)
        xi = optax.apply_updates(xi, up)
    v1 = float(spread2(xi))
    vd_sol = float(np.asarray(
        GL.glass_box_decode(jnp.zeros(1), xi)[1])[0])
    assert v1 < v0*1e-6, (v0, v1)
    assert abs(vd_sol - v2_thin) < 1.5, (vd_sol, v2_thin)

    # the snap suggests real dense flints for the discovered point
    picks = GL.nearest_glasses(1.62, vd_sol, count=5)
    assert picks and all(p["vd"] < 45 for p in picks), picks


def test_nearest_and_substitute():
    picks = GL.nearest_glasses(1.5168, 64.17, count=3)
    assert picks[0]["distance"] < 1.0
    assert any("BK" in p["name"] or "K7" in p["name"] for p in picks)
    s = _doublet()
    asg = GL.glass_assignment(s)
    s2, chosen = GL.substitute_glasses(s, [1.5168, 1.62],
                                       [64.2, 36.3], asg[2])
    assert len(chosen) == 2
    assert chosen[1]["vd"] < 45          # a real flint was picked
    t = ro.GeometricTrace(s2)
    t.rays_point((0., 0.), nrays=16)
    assert np.isfinite(t.rms())


def test_polychromatic_merit_gradient():
    """polychromatic_spot_rms sees color: its gradient w.r.t. vd is
    nonzero, and the merit of a color-corrected doublet (optimized
    flint) is below the uncorrected one at matched focus."""
    s = _doublet()
    asg = GL.glass_assignment(s)
    nd0, vd0 = GL.initial_glass_params(s, asg[2])
    tabs = s.tables()
    t = ro.GeometricTrace(s)
    t.rays_point((0., 0.), nrays=32, distribution="hexapolar",
                 clip=False)
    y0 = jnp.asarray(t.y[0])
    u0 = jnp.asarray(t.u[0])

    def merit(vd):
        tb = GL.glass_tables(tabs, jnp.asarray(nd0), vd, asg,
                             s.wavelengths)
        return GL.polychromatic_spot_rms(tb, y0, u0)

    g = np.asarray(jax.grad(merit)(jnp.asarray(vd0)))
    assert np.all(np.abs(g) > 0)
    # refocusing-free color comparison: the discovered flint (~25.4,
    # test_flint_discovery) must beat equal crowns through the traced
    # polychromatic merit as well
    v_equal = float(merit(jnp.asarray(vd0)))
    v_flint = float(merit(jnp.asarray([vd0[0], 25.4])))
    assert v_flint < v_equal
