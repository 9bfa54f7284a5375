"""Round-2/3 feature tour: ghost analysis, thermal re-derivation,
through-field MTF, HTML report export, interchange IO (Code V .seq,
Zemax writer/reader incl. odd aspherics and coordinate breaks),
Seidel-coefficient tolerancing, and the AD transverse/chromatic
aberration expansions.

Runs on any backend; pin CPU for quick turnaround:
    python examples/advanced_analysis.py [outdir]
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib  # noqa: E402

matplotlib.use("agg")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import rayopt_tpu as ro  # noqa: E402
from rayopt_tpu.models import cooke_triplet  # noqa: E402

QUICK = bool(os.environ.get("RAYOPT_TPU_EXAMPLE_QUICK"))  # reduced sizes for CI


def main(outdir="/tmp/rayopt_tpu_demo"):
    os.makedirs(outdir, exist_ok=True)
    s = cooke_triplet()
    s.update()

    # -- one-call report with the new panels, exported as HTML
    a = ro.Analysis(s, print=False, plot_vignetting=True,
                    plot_mtf_field=True, print_ghosts=True,
                    print_zernike=True, defocus=3)
    path = os.path.join(outdir, "report.html")
    a.export_html(path)
    print("html report:", path, "(%d figures, %d text blocks)"
          % (len(a.figures), len(a.text)))

    # -- ghost hazard ranking
    print()
    print(ro.ghost_text(s, limit=5))

    # -- thermal drift
    print()
    print(ro.thermal_text(s, temps=(-10., 20., 50.)))

    # -- interchange: write zmx, read it back; read a .seq
    text = ro.system_to_zmx(s)
    s2 = ro.zmx_to_system(text)
    print()
    print("zmx round trip: %d -> %d rows" % (len(s), len(s2)))

    seq = """LEN
TI 'seq demo doublet'
WL 587.56 486.13 656.27
EPD 10
YAN 0 5
SO 0.0 0.1e12
S 62.75 4.0 NSK16_SCHOTT
S -45.7 2.0 620.360
S -128.2 78.0
SI 0.0 0.0
GO
"""
    s3 = ro.seq_to_system(seq)
    s3.update()
    print("seq import:", s3.description, "EFL %.4g"
          % s3.paraxial.focal_length[1])

    # -- Seidel-coefficient Monte-Carlo through the polynomial trace
    from rayopt_tpu.parallel import aberration_tolerance
    tol = aberration_tolerance(s.table(), s.object.pupil.distance,
                               n_samples=16 if QUICK else 64,
                               sigmas={"curvature": 1e-5,
                                       "distance": 5e-3})
    names = ("s1", "s2", "s3", "s4", "s5")
    print()
    print("Seidel tolerancing (%d samples):" % (16 if QUICK else 64))
    for i, name in enumerate(names):
        print("  %s: nominal %+.3e  std %.2e" % (
            name, tol["nominal"][i], tol["std"][i]))

    # -- AD aberration expansions: Taylor jets of the real trace
    # (works on anamorphic/grating/tilted systems where classical
    # Seidel theory does not exist; cross-pinned on this triplet)
    print()
    for line in ro.transverse_expansion(s).text():
        print(line)
    print()
    for line in ro.chromatic_expansion(s).text():
        print(line)


if __name__ == "__main__":
    main(*sys.argv[1:])
