"""Tour of the late round-2 physics: polarization ray tracing with
coating stacks, anamorphic (cylinder) surfaces, afocal systems, and
budget-driven inverse-sensitivity tolerancing.

Run: python examples/polarization_and_cylinders.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")  # demo runs host-side

import numpy as np

import rayopt_tpu as ro
from rayopt_tpu.models import cooke_triplet, beam_expander


def polarization_tour():
    s = cooke_triplet()
    lam = s.wavelengths[0]

    # bare glass: Fresnel losses at every interface
    bare = ro.PolarizationTrace(s, field=(0., .7), nrays=64)
    print("bare      ", bare.text())

    # quarter-wave MgF2 AR coat on every air-glass interface
    mu = np.asarray(s.table().mu)
    coat = {int(k): ro.quarter_wave(1.38, lam)
            for k in np.flatnonzero(mu != 1.)}
    ar = ro.PolarizationTrace(s, field=(0., .7), nrays=64,
                              coatings=coat)
    print("AR coated ", ar.text())

    # polarization-aberration summary: Zernike fits of the pupil maps
    fits = ar.zernike(nterms=10)
    for name, (coeffs, rms) in fits.items():
        print("  %-14s max |Z| %.3g  residual %.3g"
              % (name, np.abs(coeffs).max(), rms))

    # vector (Jones-pupil) PSF: the diffraction image carries the
    # polarization-dependent transmission; energy = mean T
    _, _, psf_v = bare.vector_psf(e_in=(1., 0.))
    _, _, psf_s = bare.geometric.psf()
    print("  vector PSF energy/scalar = %.4f (mean T %.4f)"
          % (psf_v.sum()/psf_s.sum(),
             bare.transmittance[bare.good].mean()))


def cylinder_tour():
    # a plano-convex y-cylinder: focuses y, leaves x collimated
    s = ro.System([
        dict(material="air"),
        dict(type="biconic", roc=25.84, curvature_x=0., distance=5.,
             material="SCHOTT-BK|N-BK7", radius=10.),
        dict(type="biconic", distance=3., material="air", radius=10.),
        dict(distance=47., radius=10.),
    ])
    s.object.pupil.radius = 4.
    s.object.pupil.update_radius = False
    s.update()
    n, m = s.paraxial_matrix(s.wavelengths[0])
    print("anamorphic cylinder x-power %.4g, y-power %.4g (f_y = %.1f mm)"
          % (-m[2, 0], -m[3, 1], -1./m[3, 1]))
    # the gaussian trace picks up the astigmatism automatically
    t = ro.GaussianTrace(s)
    print("per-axis waist radii at the image:", t.waist_radius[-1])


def afocal_tour():
    s = beam_expander()
    print("beam expander: angular magnification %.3f"
          % s.paraxial.magnification[1])
    g = ro.GeometricTrace(s)
    g.rays_point((0, 0.), nrays=13, distribution="radau",
                 filter=False)
    print("collimation residual (angular RMS): %.2e rad"
          % g.angular_rms())


def inverse_sensitivity_tour():
    from rayopt_tpu.parallel import inverse_sensitivity
    from rayopt_tpu.parallel.grad import bundles_from_system
    s = cooke_triplet()
    y0, u0, w, _ = bundles_from_system(s, fields=[0.], nrays=32)[0]
    inv = inverse_sensitivity(s.table(), y0, u0, budget=1e-3, w=w,
                              fields=("curvature",))
    tol = inv["curvature"]["tolerance"]
    print("curvature tolerances for a 1um RMS budget:")
    for j in range(1, len(s) - 1):
        if np.asarray(s.table().mu)[j] != 1.:
            print("  surface %d: +-%.2e (1/mm)" % (j, tol[j]))




def spectrometer_tour():
    """A concave-mirror reflection grating disperses three lines."""
    import rayopt_tpu as ro
    s = ro.System([
        dict(material="air"),
        dict(type="grating", grating_frequency=600., grating_order=1,
             roc=-400., distance=100., material="mirror", radius=30.),
        dict(distance=-200., radius=60.),
    ], wavelengths=[450e-9, 550e-9, 650e-9])
    s.object.pupil.radius = 10.
    s.object.pupil.update_radius = False
    s.update()
    print("spectrometer line positions (mm on the detector):")
    for lam in s.wavelengths:
        ys, us, iis, ts = s.trace_table(
            np.zeros((1, 3)), np.array([[0., 0., 1.]]), lam)
        print("  %.0f nm -> y = %+.3f" % (lam*1e9, ys[-1, 0, 1]))


if __name__ == "__main__":
    polarization_tour()
    cylinder_tour()
    afocal_tour()
    inverse_sensitivity_tour()
    spectrometer_tour()
