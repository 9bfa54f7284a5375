"""End-to-end design workflow demo.

Load the double-Gauss, inspect first-order properties, run the full
aberration report, detune a surface, recover it with differentiable
optimization, and finish with a Monte-Carlo tolerance run.

Run: python examples/design_workflow.py [outdir]
"""

import os
import sys

import matplotlib

matplotlib.use("agg")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import rayopt_tpu as ro  # noqa: E402
from rayopt_tpu.models import double_gauss  # noqa: E402
from rayopt_tpu.parallel.grad import (  # noqa: E402
    optimize_system, bundles_from_system)
from rayopt_tpu.parallel.tolerancing import tolerance_analysis  # noqa: E402

QUICK = bool(os.environ.get("RAYOPT_TPU_EXAMPLE_QUICK"))  # reduced sizes for CI


def main(outdir="/tmp/rayopt_tpu_demo"):
    os.makedirs(outdir, exist_ok=True)
    s = double_gauss()
    print(s)
    p = s.paraxial
    print("EFL %.2f mm, working f/%.2f, NA %.3f"
          % (p.focal_length[1], p.working_f_number[1],
             p.numerical_aperture[1]))

    # full report
    a = ro.Analysis(s, print=False, defocus=3)
    for fig, name in zip(a.figures, ("layout", "fans", "longitudinal",
                                     "spots", "opds")):
        fig.savefig(os.path.join(outdir, name + ".png"), dpi=100)
    print("report figures in", outdir)

    # detune + differentiable re-optimization
    s[1].curvature *= 1.01
    s.update()
    bundles = bundles_from_system(s, nrays=32)
    hist = optimize_system(s, select=("curvature",), nrays=32,
                           steps=8 if QUICK else 60, lr=5e-5)
    print("merit %.4g -> %.4g after %d gradient steps"
          % (hist[0], hist[-1], len(hist)))

    # tolerancing
    y0, u0, w = bundles[0][:3]
    r = tolerance_analysis(s.table(), np.asarray(y0), np.asarray(u0),
                           np.asarray(w),
                           sigmas={"curvature": 1e-6,
                                   "distance": 5e-3},
                           n_samples=32 if QUICK else 128)
    print("tolerance MC: nominal %.4g, p50 %.4g, p90 %.4g, p99 %.4g"
          % (r["nominal"], r["p50"], r["p90"], r["p99"]))


if __name__ == "__main__":
    main(*sys.argv[1:2])
