"""Tour of the round-3 physics: blazed-grating efficiency and the
per-order spectrograph image, parity-grade df32 on the extended
surface vocabulary, wideangle (fisheye) aiming, and the multi-process
DCN tolerancing farm.

Run: python examples/spectrograph_and_wideangle.py
"""

import warnings

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")  # demo runs host-side

import numpy as np

import rayopt_tpu as ro
from rayopt_tpu.models import spectrograph, anamorphic_pair, fisheye

QUICK = bool(os.environ.get("RAYOPT_TPU_EXAMPLE_QUICK"))  # reduced sizes for CI


def blazed_spectrograph():
    s = spectrograph()
    g = next(e for e in s if getattr(e, "grating_frequency", 0.))
    # blaze the 600 lp/mm grating for order 1 at 550 nm (normal
    # incidence: lambda_B = d sin(2 theta_B))
    g.blaze_deg = float(np.rad2deg(np.arcsin(550e-9*600/1e-3))/2)
    lams = np.linspace(420e-9, 680e-9, 9)
    print("scalar blaze efficiency eta_m(lambda), orders 0..2:")
    for m in (0, 1, 2):
        eta = ro.blaze_efficiency(m, lams, g.grating_frequency,
                                  g.blaze_deg)
        print("  m=%d:" % m,
              " ".join("%.3f" % e for e in np.atleast_1d(eta)))

    # efficiency-weighted multi-order image of a point scene
    scene = np.zeros((48, 48))
    scene[24, 24] = 1.
    img = ro.simulate_image_orders(s, scene, 20., orders=(0, 1, 2),
                                   wavelengths=(550e-9,), npatches=1,
                                   nrays=200, psf_size=32)
    print("per-order image flux (blaze-weighted): %.4f" % img.sum())


def rigorous_efficiency_mounts():
    """RCWA beyond the classical mount: off-plane (conical) and
    crossed 2-D gratings."""
    from rayopt_tpu.rcwa import (rcwa1d_conical, rcwa2d,
                                 blazed_layers, pillar_layer)
    # echelle-style off-plane mount: 25 deg incidence rotated 35 deg
    # off the grating vector -- s and p couple, energy stays exact
    lays = blazed_layers(0.9, 1.5, 1.0, nslices=10)
    res = rcwa1d_conical(1.2, 0.55, lays, n_out=1.5, theta_deg=25.,
                         phi_deg=35., pol="TM", orders=10)
    print("conical mount: sum eff = %.12f, s<->p conversion %.3f"
          % (res.eff_r.sum() + res.eff_t.sum(),
             float(np.abs(res.t_s).max())))
    # crossed pillar array (e.g. an anti-reflective moth-eye cell)
    r2 = rcwa2d(0.9, 1.1, 0.55, [pillar_layer(0.4, 0.5, 0.6, 2.0,
                                              1.0)],
                n_out=1.5, theta_deg=20., phi_deg=25., pol="TE",
                orders_x=4, orders_y=4)
    z = (r2.orders_x == 0) & (r2.orders_y == 0)
    print("crossed pillars: R(0,0) = %.4f, T(0,0) = %.4f, "
          "sum = %.12f" % (r2.eff_r[z][0], r2.eff_t[z][0],
                           r2.eff_r.sum() + r2.eff_t.sum()))


def hybrid_diffractive_achromat():
    """A kinoform (Zemax Binary 2) cancels a BK7 singlet's color."""
    from rayopt_tpu.models import hybrid_achromat
    from rayopt_tpu.ops.paraxial import abcd_product
    s = hybrid_achromat()

    def bfl(lam):
        m = np.asarray(abcd_product(s.table(lam), 1, len(s) - 1))
        return -m[1, 1]/m[3, 1]

    print("hybrid achromat: EFL %.2f mm, axial color (480-644 nm) "
          "%.4f mm (bare singlet: ~1.5 mm)"
          % (abs(s.paraxial.focal_length[1]),
             bfl(480e-9) - bfl(644e-9)))


def df32_extended_vocabulary():
    from rayopt_tpu.ops import df32
    from rayopt_tpu.ops.geometric import trace_rays_final
    from rayopt_tpu.ops.tables import is_anamorphic
    from rayopt_tpu.models import hybrid_achromat
    for name, s in (("anamorphic_pair", anamorphic_pair()),
                    ("spectrograph", spectrograph()),
                    ("hybrid_achromat", hybrid_achromat())):
        tab = s.table()
        n = 512
        rng = np.random.RandomState(0)
        y = np.zeros((n, 3))
        y[:, :2] = rng.uniform(-1, 1, (n, 2))*3.
        u = np.zeros((n, 3))
        u[:, 2] = 1.
        yf = np.asarray(trace_rays_final(
            tab, y, u, biconic=is_anamorphic(tab))[0])
        out = df32.trace_df32_final(df32.plan(tab),
                                    df32.state_from_f64(y, u))
        err = np.nanmax(np.abs(df32.to_f64(out[0]) - yf[:, 0]))
        print("df32 parity on %-16s %.2e (f32-pair arithmetic vs "
              "f64)" % (name + ":", err))


def wideangle_aiming():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s = fisheye()
        print("fisheye equidistant mapping (cold full-field solves):")
        for h in (0.25, 0.5, 0.75, 1.):
            z, a = s.pupil((0, h))
            y0, u0 = s.aim((0, h), (0., 0.), z, a, filter=False)
            ys = s.trace_table(y0, u0, s.wavelengths[0])[0]
            print("  theta=%5.1f deg -> chief image height %7.3f mm, "
                  "pupil z %6.2f" % (np.rad2deg(h*s.object.angle),
                                     ys[-1, 0, 1], z))


def zoom_positions():
    from rayopt_tpu.models import zoom_telephoto
    from rayopt_tpu.parallel import optimize_zoom
    s = zoom_telephoto()
    print("two-group zoom (back-focus solve = compensator):")
    for i in range(s.n_configurations):
        si = s.at_configuration(i)
        print("  config %d: variator gap %5.1f mm -> EFL %7.2f mm, "
              "image at %6.2f mm" % (i, si[3].distance,
                                     si.paraxial.focal_length[1],
                                     si[8].distance))
    tabs, hist = optimize_zoom(s, select=("curvature",), nrays=16,
                               steps=3 if QUICK else 10, lr=1e-5)
    print("  joint merit over both positions: %.4f -> %.4f "
          "(shared curvatures)" % (hist[0], hist[-1]))


def dcn_farm():
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "dcn_farm.py"),
         "--nprocs", "2",
         "--samples", "32" if QUICK else "64"],
        capture_output=True, text=True, timeout=600, cwd=repo)
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    print("2-process DCN tolerancing farm:", stats)


if __name__ == "__main__":
    blazed_spectrograph()
    rigorous_efficiency_mounts()
    hybrid_diffractive_achromat()
    df32_extended_vocabulary()
    wideangle_aiming()
    zoom_positions()
    dcn_farm()
