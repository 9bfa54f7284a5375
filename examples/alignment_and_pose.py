"""Pose (tilt/decenter) tolerancing and alignment compensation.

Element tilt and decenter are the dominant manufacturing tolerances
in real optical work; here they are first-class differentiable table
parameters (SurfaceTable.tilt/.decenter, lowered through
ops.tables.lower_pose inside the trace graph):

1. exact pose sensitivities d(RMS)/d(tilt), d(RMS)/d(decenter) of the
   Cooke triplet in ONE reverse pass (no finite differences),
2. Monte-Carlo tolerancing over tilt + decenter sigmas, farmed over
   a device mesh when more than one device is visible,
3. alignment compensation: a 30 mrad manufacturing tilt on one
   element is recovered by re-optimizing another element's pose with
   optimize_grad(select=("tilt",)), and the optimized pose is written
   back into the System's elements (set_pose).

Run: python examples/alignment_and_pose.py
"""

import os
import sys

import matplotlib

matplotlib.use("agg")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("RAYOPT_TPU_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from rayopt_tpu.models import cooke_triplet  # noqa: E402
from rayopt_tpu.parallel.grad import (  # noqa: E402
    optimize_grad, spot_rms, write_back_table)
from rayopt_tpu.parallel.tolerancing import (  # noqa: E402
    sensitivity, tolerance_analysis)
from rayopt_tpu.utils.distributions import pupil_distribution  # noqa: E402

QUICK = bool(os.environ.get("RAYOPT_TPU_EXAMPLE_QUICK"))


def main():
    s = cooke_triplet()
    tab = s.table()

    # a focused axial bundle across the entrance pupil
    ref, xy, w = pupil_distribution("radau", 16 if QUICK else 32)
    m = xy.shape[0]
    y0 = np.zeros((m, 3))
    y0[:, :2] = xy*s.object.pupil.radius
    u0 = np.zeros((m, 3))
    u0[:, 2] = 1.
    w = np.asarray(w if w is not None else np.ones(m)/m)
    rms0 = float(spot_rms(tab, y0, u0, w))
    print("nominal spot RMS: %.5f mm" % rms0)

    # 1. exact pose sensitivities (one reverse pass for ALL of them)
    sens = sensitivity(tab, y0, u0, w, fields=("tilt", "decenter"),
                       second_order=not QUICK)
    g_t = sens["tilt"]["grad"]
    g_d = sens["decenter"]["grad"]
    jt = int(np.abs(g_t[:, 1]).argmax())
    jd = int(np.abs(g_d[:, 0]).argmax())
    print("pose sensitivity: most tilt-critical element %d "
          "(d RMS/d tilt_y = %.3f mm/rad), most decenter-critical "
          "element %d (d RMS/d dx = %.4f mm/mm)"
          % (jt, g_t[jt, 1], jd, g_d[jd, 0]))

    # 2. Monte-Carlo pose tolerancing (0.2 mrad tilt, 2 um decenter)
    mesh = None
    if jax.device_count() > 1:
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()), ("samples",))
    stats = tolerance_analysis(
        tab, y0, u0, w, sigmas={"tilt": 2e-4, "decenter": 2e-3},
        n_samples=32 if QUICK else 256, seed=1, mesh=mesh)
    print("pose tolerance MC (%s): p50 %.5f, p90 %.5f, p99 %.5f mm"
          % ("mesh-farmed" if mesh else "single device",
             stats["p50"], stats["p90"], stats["p99"]))

    # 3. alignment compensation: tilt element 2 by 30 mrad (the
    # manufacturing error), recover with element 6's tilt
    err = np.zeros((len(s), 3))
    err[2] = (0., 3e-2, 0.)
    tab_err = tab.replace(tilt=jnp.asarray(err))
    rms_err = float(spot_rms(tab_err, y0, u0, w))
    print("after 30 mrad tilt error on element 2: RMS %.5f mm "
          "(%.1fx nominal)" % (rms_err, rms_err/rms0))

    mask = np.zeros((len(s), 3))
    mask[6, :2] = 1.

    def merit(table):
        t = table.replace(tilt=jnp.asarray(table.tilt)*mask)
        return spot_rms(t, y0, u0, w)

    tab_fix, hist = optimize_grad(
        tab_err, [(y0, u0, w)], select=("tilt",),
        steps=20 if QUICK else 80, optimizer=optax.adam(2e-3),
        merit=merit)
    rms_fix = float(merit(tab_fix))
    comp = np.asarray(tab_fix.tilt)[6]
    print("alignment compensation: %d gradient steps, compensator "
          "tilt (%.2f, %.2f) mrad, RMS %.5f mm (%.0f%% of the error "
          "recovered)" % (len(hist), 1e3*comp[0], 1e3*comp[1],
                          rms_fix,
                          100*(rms_err - rms_fix)/(rms_err - rms0)
                          if rms_err > rms0 else float("nan")))

    # write the compensator pose back into the System's elements
    tab_fix = tab_fix.replace(tilt=jnp.asarray(tab_fix.tilt)*mask)
    write_back_table(s, tab_fix, select=("tilt",))
    print("compensator written back: element 6 angles =",
          np.round(np.asarray(s[6].angles), 5))

    # 4. the same pose gradients at PRODUCTION ray counts ride the
    # analytic-adjoint Pallas kernel (no VJP residuals; on TPU this
    # is the 2^26-rays-per-step path).  rot is differentiated on
    # demand -- kernels.with_pose keeps the nominal pose live in the
    # static specialization.
    from rayopt_tpu.ops.kernels import specialize, with_pose
    from rayopt_tpu.ops.pallas_grad import pallas_spot_rms
    pad = (-len(w)) % 128
    yp = np.concatenate([y0, np.repeat(y0[:1], pad, 0)])
    up = np.concatenate([u0, np.repeat(u0[:1], pad, 0)])
    wp = np.concatenate([w, np.zeros(pad)])
    specs = with_pose(specialize(tab))
    interpret = jax.default_backend() != "tpu"
    g_adj = jax.grad(lambda t: pallas_spot_rms(
        tab_err.replace(tilt=t), yp, up, wp, specs=specs, tile=128,
        interpret=interpret))(jnp.asarray(err))
    g_xla = jax.grad(lambda t: spot_rms(
        tab_err.replace(tilt=t), yp, up, wp))(jnp.asarray(err))
    # rows 1+: the generic scan engine additionally differentiates
    # the object row's entry rotation, which the specialized engines
    # (and the adjoint kernel) structurally drop -- compare the
    # element rows, where the semantics coincide
    rel = (np.abs(np.asarray(g_adj)[1:] - np.asarray(g_xla)[1:]).max()
           / np.abs(np.asarray(g_xla)[1:]).max())
    print("adjoint-kernel pose gradient: max |d RMS/d tilt| = %.4f "
          "/rad, parity vs XLA %.1e" %
          (np.abs(np.asarray(g_adj)).max(), rel))


if __name__ == "__main__":
    main()
