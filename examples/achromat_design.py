"""Achromat design by continuous glass relaxation.

The classic workflow, end to end on the differentiable stack
(rayopt_tpu.glass):

1. start from a cemented doublet whose two elements are the SAME
   crown glass (heavy axial color),
2. relax the second element's Abbe number continuously -- gradient
   descent on the DIFFERENTIABLE paraxial back-focal-spread merit
   drives it to the achromat solution (the thin-lens prediction
   phi1/v1 + phi2/v2 = 0 lands at vd2 ~ 25.7; the optimizer finds
   the exact thick-lens optimum next to it),
3. snap to the nearest real catalog glasses (the bundled 825-glass
   refractiveindex.info shelf) and write them back into the System,
4. verify with a traced polychromatic spot and the paraxial color
   spread.

Run: RAYOPT_TPU_FORCE_CPU=1 python examples/achromat_design.py
(RAYOPT_TPU_EXAMPLE_QUICK=1 shortens the optimization for CI).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import rayopt_tpu as ro  # noqa: E402
from rayopt_tpu import glass as GL  # noqa: E402
from rayopt_tpu.materials import lambda_d, lambda_C, lambda_F  # noqa: E402
from rayopt_tpu.ops.paraxial import paraxial_solve_image  # noqa: E402

QUICK = bool(os.environ.get("RAYOPT_TPU_EXAMPLE_QUICK"))
STEPS = 120 if QUICK else 500


def build():
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
    s.object.pupil.radius = 3.
    s.object.pupil.update_radius = False
    s.update()
    return s


def bfd_per_wavelength(system):
    y0 = jnp.asarray([1., 0.])
    u0 = jnp.asarray([0., 1e-6])
    return [float(paraxial_solve_image(system.table(lam), y0, u0))
            for lam in system.wavelengths]


def main():
    import optax

    s = build()
    fd0 = bfd_per_wavelength(s)
    print("start: both elements N-BK7")
    print("  back focal distance d/F/C: %.3f / %.3f / %.3f mm"
          % tuple(fd0))
    print("  axial color spread: %.4f mm" % (max(fd0) - min(fd0)))

    asg = GL.glass_assignment(s)
    nd0, vd0 = GL.initial_glass_params(s, asg[2])
    tabs = s.tables()

    # thin-lens prediction for the flint
    n = float(nd0[0])
    phi1 = (n - 1)*(1/60. + 1/45.)
    phi2 = (n - 1)*(-1/45. + 1/150.)
    v2_thin = float(vd0[0])*abs(phi2)/phi1
    print("thin-lens achromat prediction: vd2 = %.2f" % v2_thin)

    y0p = jnp.asarray([1., 0.])
    u0p = jnp.asarray([0., 1e-6])

    def spread2(xi_vd):
        _, vd1 = GL.glass_box_decode(jnp.zeros(1), xi_vd)
        vd = jnp.concatenate([jnp.asarray(vd0[:1]), vd1])
        tb = GL.glass_tables(tabs, jnp.asarray(nd0), vd, asg,
                             s.wavelengths)
        fd = jax.vmap(lambda t: paraxial_solve_image(t, y0p, u0p))(tb)
        return jnp.square(fd - fd.mean()).sum()

    xi = jnp.asarray(GL.glass_box_encode([nd0[1]], [vd0[1]])[1])
    opt = optax.adam(0.05)
    st = opt.init(xi)
    vg = jax.jit(jax.value_and_grad(spread2))
    v_start = float(spread2(xi))
    for i in range(STEPS):
        _, g = vg(xi)
        up, st = opt.update(g, st, xi)
        xi = optax.apply_updates(xi, up)
    vd_sol = float(np.asarray(
        GL.glass_box_decode(jnp.zeros(1), xi)[1])[0])
    print("relaxed: vd2 = %.2f (spread^2 %.3g -> %.3g)"
          % (vd_sol, v_start, float(spread2(xi))))

    picks = GL.nearest_glasses(1.62, vd_sol, count=3)
    print("nearest catalog flints:")
    for p in picks:
        print("  %-24s nd %.4f  vd %.1f" % (p["name"], p["nd"],
                                            p["vd"]))

    s2, chosen = GL.substitute_glasses(
        s, [float(nd0[0]), 1.62], [float(vd0[0]), vd_sol], asg[2])
    print("substituted:", ", ".join(p["name"] for p in chosen))
    fd1 = bfd_per_wavelength(s2)
    print("  back focal distance d/F/C: %.3f / %.3f / %.3f mm"
          % tuple(fd1))
    print("  axial color spread: %.4f mm (was %.4f)"
          % (max(fd1) - min(fd1), max(fd0) - min(fd0)))
    improvement = (max(fd0) - min(fd0))/max(max(fd1) - min(fd1), 1e-9)
    print("color improvement: %.1fx" % improvement)
    assert improvement > 3., improvement
    print("achromat designed.")


if __name__ == "__main__":
    main()
