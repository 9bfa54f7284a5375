"""Precision regimes and multi-chip scaling demo.

1. Trace the double-Gauss in the three engines -- f32 throughput,
   df32 (double-single) parity-grade, f64 oracle -- and compare spot
   RMS agreement.
2. Solve every field's pupil in one device dispatch (System.pupils).
3. Run a sharded differentiable optimization step and a Monte-Carlo
   tolerancing farm over whatever devices are available.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/precision_and_scale.py
(on a TPU host it uses the real chips; on CPU it pins the backend and
uses the virtual mesh).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("RAYOPT_TPU_FORCE_CPU"):
    # wedged-tunnel kill-switch: don't even probe the default backend
    jax.config.update("jax_platforms", "cpu")
elif jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import rayopt_tpu  # noqa: E402,F401
from rayopt_tpu.models import double_gauss  # noqa: E402
from rayopt_tpu.ops.geometric import trace_rays_final  # noqa: E402
from rayopt_tpu.ops import df32  # noqa: E402
from rayopt_tpu.parallel import (  # noqa: E402
    optimize_grad, bundles_from_system, tolerance_analysis)
from jax.sharding import Mesh  # noqa: E402

QUICK = bool(os.environ.get("RAYOPT_TPU_EXAMPLE_QUICK"))  # reduced sizes for CI


def rms(px, py):
    good = np.isfinite(px) & np.isfinite(py)
    px, py = px[good], py[good]
    return float(np.sqrt(((px - px.mean())**2
                          + (py - py.mean())**2).mean()))


def main():
    s = double_gauss()
    tab = s.table()
    rng = np.random.default_rng(0)
    n = 4096
    y = np.zeros((n, 3))
    y[:, :2] = rng.uniform(-1, 1, (n, 2))*10.
    u = np.zeros((n, 3))
    u[:, 2] = 1.

    # 1. three precision regimes
    yf = np.asarray(trace_rays_final(tab, y, u)[0])          # f64
    r64 = rms(yf[:, 0], yf[:, 1])
    import jax.numpy as jnp
    tab32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tab)
    y32 = np.asarray(trace_rays_final(
        tab32, y.astype(np.float32), u.astype(np.float32))[0],
        np.float64)
    r32 = rms(y32[:, 0], y32[:, 1])
    steps = df32.plan(tab)
    out = df32.trace_df32_final(steps, df32.state_from_f64(y, u))
    rdf = rms(df32.to_f64(out[0]), df32.to_f64(out[1]))
    print(f"spot RMS   f64: {r64:.15f}")
    print(f"           f32: {r32:.15f}  (rel err {abs(r32-r64)/r64:.2e})")
    print(f"          df32: {rdf:.15f}  (rel err {abs(rdf-r64)/r64:.2e})")

    # 2. all-field pupil solve in one dispatch
    fields = [(0., h) for h in (0., .35, .7, 1.)]
    z, boxes = s.pupils(fields)
    print("pupil distances per field:", np.round(z, 4))

    # 3. sharded optimization + tolerancing farm
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("rays",))
    bundles = bundles_from_system(s, nrays=64)
    tab_opt, history = optimize_grad(tab, bundles,
                                     steps=3 if QUICK else 10,
                                     lr=1e-6,
                                     mesh=mesh)
    print(f"sharded optimization over {len(devices)} device(s): "
          f"merit {history[0]:.6f} -> {history[-1]:.6f}")

    farm = Mesh(np.asarray(devices), ("samples",))
    w = np.ones(n)/n
    stats = tolerance_analysis(tab, y, u, w,
                               n_samples=16 if QUICK else 64,
                               mesh=farm)
    print("tolerancing p50/p90/p99:",
          [round(stats[k], 4) for k in ("p50", "p90", "p99")])


if __name__ == "__main__":
    main()
