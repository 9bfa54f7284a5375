"""Code V .seq lens-sequence import (beyond the reference, which
covers only the XML glass catalogs)."""

import numpy as np
from numpy import testing as nptest

from rayopt_tpu.io.codev import seq_to_system


SEQ = """! a hand-written interchange-core sample
LEN NEW
TI 'Seq Triplet'
DIM M
EPD 12.5
WL 656.27 587.56 486.13
REF 2
YAN 0.0 10.0 14.0
SO 0.0 0.1e12
S 21.25 2.0 NSK16_SCHOTT
S -158.65 6.0
STO
S -20.25 1.0 620.603
S 19.3 6.0
S 141.25 2.0 NSK16_SCHOTT
  ASP; K -0.5; A 1.5E-06; B -2.0E-09
  CIR 6.5
S -17.285 42.95
SI 0.0 0.0
GO
"""


def test_seq_structure():
    s = seq_to_system(SEQ)
    assert s.description == "Seq Triplet"
    assert s.scale == 1e-3
    # object + 6 surfaces + image (STO marks the preceding row)
    assert len(s) == 8
    assert s.stop == 2
    # REF 2 rotates the d line to the front
    nptest.assert_allclose(
        s.wavelengths, [587.56e-9, 656.27e-9, 486.13e-9])
    assert not s.object.finite
    nptest.assert_allclose(np.rad2deg(s.object.angle), 14.)
    nptest.assert_allclose(s.fields, [0., 10/14, 1.])
    nptest.assert_allclose(s.object.pupil.radius, 6.25)


def test_seq_surfaces():
    s = seq_to_system(SEQ)
    nptest.assert_allclose(s[1].curvature, 1/21.25)
    assert s[1].material.solid
    # infinite object: leading gap dropped
    nptest.assert_allclose(s[1].distance, 0.)
    nptest.assert_allclose(s[2].distance, 2.0)
    nptest.assert_allclose(s[2].curvature, -1/158.65)
    assert not s[2].material.solid
    # fictitious nnn.nnn glass -> Abbe model
    m = s[3].material
    nptest.assert_allclose(m.nd, 1.620, atol=2e-3)
    # conic + A/B asphere rows on surface 5
    e = s[5]
    nptest.assert_allclose(e.conic, -0.5)
    nptest.assert_allclose(e.aspherics, [0., 1.5e-6, -2.0e-9])
    nptest.assert_allclose(e.radius, 6.5)


def test_seq_traces():
    """The imported system must update and trace."""
    from rayopt_tpu.trace.paraxial import ParaxialTrace
    s = seq_to_system(SEQ)
    for e in s[1:-1]:
        if not np.isfinite(e.radius):
            e.radius = 8.
    s[-1].radius = 30.
    s.update()
    p = ParaxialTrace(s)
    assert np.isfinite(p.focal_length[1])
    assert abs(p.focal_length[1]) > 1.


def test_seq_library_roundtrip(tmp_path):
    from rayopt_tpu.io.library import Library
    f = tmp_path/"sample.seq"
    f.write_text(SEQ)
    lib = Library(str(tmp_path/"lib.sqlite"))
    lib.load(str(f))
    recs = list(lib.get_all("lens", name="sample"))
    assert recs, "lens record not found"
    s = recs[0]
    assert s.description == "Seq Triplet"
    assert len(s) == 8


def test_seq_finite_object():
    seq = """LEN
TI 'finite'
WL 587.56
SO 0.0 200.0
S 50.0 5.0 NBK7_SCHOTT
S -50.0 95.0
SI 0.0 0.0
GO
"""
    s = seq_to_system(seq)
    assert s.object.finite
    nptest.assert_allclose(s[1].distance, 200.)


def test_seq_tilted_plate_displacement():
    """ADE tilts fold like Zemax breaks: a tilted plane plate
    displaces an axial ray by the textbook formula and exits
    parallel."""
    theta, n, d = 8., 1.5, 6.
    seq = """LEN
TI 'tilted plate'
WL 587.56
SO 0.0 0.1e12
S 0.0 10.0
S 0.0 %g 500.600
  ADE %g
S 0.0 0.0
S 0.0 30.0
  ADE %g
SI 0.0 0.0
GO
""" % (d, theta, -theta)
    s = seq_to_system(seq)
    y0 = np.zeros((1, 3))
    u0 = np.array([[0., 0., 1.]])
    ys, us, _, _ = s.trace_table(y0, u0, s.wavelengths[0])
    from rayopt_tpu.materials import air as _air
    t = np.deg2rad(theta)
    n_rel = n/_air.refractive_index(s.wavelengths[0])
    tp = np.arcsin(np.sin(t)/n_rel)
    want = d*np.sin(t)*(1 - np.cos(t)/(n_rel*np.cos(tp)))
    lateral = ys[-1, 0, 1] + s.origins[-1][1]
    nptest.assert_allclose(abs(lateral), want, rtol=1e-9)
    nptest.assert_allclose(us[-1, 0], [0., 0., 1.], atol=1e-12)


def test_seq_dar_decenter_matches_manual():
    """A DAR (decenter-and-return) lens equals the manual build:
    the surface shifts, the chain does not."""
    from rayopt_tpu.elements import Spheroid, set_pose
    from rayopt_tpu.system import System
    from rayopt_tpu.materials import air
    dx, gap, thick = 1.5, 10., 4.
    seq = """LEN
WL 587.56
SO 0.0 0.1e12
S 40.0 %g 500.600
  XDE %g
  DAR
S -40.0 50.0
SI 0.0 0.0
GO
""" % (thick, dx)
    s = seq_to_system(seq)
    # note: the object gap collapses for infinite conjugates, so the
    # decentered front sits at distance 0 like the import
    m = System()
    m.append(Spheroid(material=air))
    e1 = Spheroid(curvature=1/40., material=1.5)
    set_pose(e1, np.array([dx, 0., 0.]), np.eye(3))
    m.append(e1)
    e2 = Spheroid(curvature=-1/40., material=air)
    set_pose(e2, np.array([-dx, 0., thick]), np.eye(3))
    m.append(e2)
    e3 = Spheroid(material=air)
    e3.distance = 50.
    m.append(e3)
    m.wavelengths = s.wavelengths
    rng = np.random.RandomState(1)
    y0 = np.zeros((8, 3))
    y0[:, :2] = rng.uniform(-1, 1, (8, 2))
    u0 = np.zeros((8, 3))
    u0[:, 2] = 1.
    ys, us, _, _ = s.trace_table(y0, u0, s.wavelengths[0])
    ym, um, _, _ = m.trace_table(y0, u0, m.wavelengths[0])
    nptest.assert_allclose(ys[-1], ym[-1], atol=1e-10)
    nptest.assert_allclose(us[-1], um[-1], atol=1e-12)


def test_seq_ben_periscope():
    """BEN mirrors bend the axis: a 45/-45 Z-periscope folds twice,
    preserves the bundle, and exits parallel to the input, displaced
    by the mirror separation."""
    seq = """LEN
WL 587.56
SO 0.0 0.1e12
S 0.0 10.0
S 0.0 -15.0 REFL
  ADE 45
  BEN
S 0.0 15.0 REFL
  ADE -45
  BEN
S 0.0 20.0
SI 0.0 0.0
GO
"""
    s = seq_to_system(seq)
    # vertex chain: up 10, over 15 in -y, forward 20+20
    nptest.assert_allclose(s.origins[3], [0., -15., 10.], atol=1e-12)
    nptest.assert_allclose(s.origins[-1], [0., -15., 45.], atol=1e-12)
    y0 = np.zeros((3, 3))
    y0[:, 1] = (0., .5, -.5)
    u0 = np.tile([0., 0., 1.], (3, 1))
    ys, us, _, ts = s.trace_table(y0, u0, s.wavelengths[0])
    # bundle preserved through the even number of reflections
    nptest.assert_allclose(ys[-1][:, 1], (0., .5, -.5), atol=1e-10)
    nptest.assert_allclose(us[-1][0], [0., 0., 1.], atol=1e-12)
    # geometric path: 10 + 15 + 15 + 20 (t is optical; divide by air)
    from rayopt_tpu.materials import air as _air
    n_air = _air.refractive_index(s.wavelengths[0])
    nptest.assert_allclose(np.abs(ts[1:, 0]).sum()/n_air, 60.,
                           rtol=1e-9)


def test_seq_writer_roundtrip():
    """system_to_seq -> seq_to_system reproduces the prescription and
    the re-imported system traces to the same spot RMS (the infinite
    object's front gap is a pure z-translation and drops out)."""
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.io.codev import system_to_seq, seq_to_system
    from rayopt_tpu import GeometricTrace
    s = cooke_triplet()
    text = system_to_seq(s)
    assert "LEN" in text and "STO" in text and text.endswith("GO\n")
    s2 = seq_to_system(text)
    assert len(s2) == len(s)
    assert s2.stop == s.stop
    for j in range(2, len(s)):
        e, e2 = s[j], s2[j]
        nptest.assert_allclose(getattr(e2, "curvature", 0.),
                               getattr(e, "curvature", 0.),
                               rtol=1e-12)
        nptest.assert_allclose(e2.distance, e.distance, rtol=1e-12,
                               atol=1e-12)
        nptest.assert_allclose(e2.radius, e.radius)
        if e.material is not None:
            n2 = e2.material.refractive_index(s.wavelengths[0])
            n1 = e.material.refractive_index(s.wavelengths[0])
            nptest.assert_allclose(n2, n1, rtol=1e-6)
    nptest.assert_allclose(np.rad2deg(s2.object.angle),
                           np.rad2deg(s.object.angle), rtol=1e-9)
    nptest.assert_allclose(s2.object.pupil.radius,
                           s.object.pupil.radius, rtol=1e-12)
    s2.object.pupil.aim = s.object.pupil.aim
    s2.update()
    g = GeometricTrace(s)
    g.rays_point((0, 1.), nrays=13, distribution="radau",
                 filter=False)
    g2 = GeometricTrace(s2)
    g2.rays_point((0, 1.), nrays=13, distribution="radau",
                  filter=False)
    nptest.assert_allclose(g2.rms(), g.rms(), rtol=1e-4)


def test_seq_writer_aspheres_and_fictitious_glass():
    from rayopt_tpu.io.codev import system_to_seq, seq_to_system
    import rayopt_tpu as ro
    s = ro.System([
        dict(material="air"),
        dict(roc=40., conic=-.6, distance=4., material=1.613,
             radius=8., aspherics=[0., 1e-6, -2e-9]),
        dict(roc=-40., distance=3., material="air", radius=8.),
        dict(distance=50., radius=8.),
    ], wavelengths=[550e-9])
    s.update()
    text = system_to_seq(s)
    assert "\nK " in text and "\nA " in text and "\nB " in text
    assert "613.999" in text            # fictitious nnn.nnn code
    s2 = seq_to_system(text)
    s2.update()
    e2 = s2[1]
    nptest.assert_allclose(e2.conic, -.6)
    nptest.assert_allclose(e2.aspherics[1:3], [1e-6, -2e-9],
                           rtol=1e-12)
    # the fictitious code pins nd at the d-line; a high-vd Abbe
    # model still disperses slightly at 550 nm
    nptest.assert_allclose(
        e2.material.refractive_index(550e-9), 1.613, atol=2e-3)


def test_seq_writer_finite_object():
    """A finite-conjugate system exports SO with its real object gap
    and re-imports as finite (the slope-property trap: both conjugate
    types define `slope`)."""
    from rayopt_tpu.io.codev import system_to_seq, seq_to_system
    import rayopt_tpu as ro
    s = ro.System([
        dict(material="air"),
        dict(roc=30., distance=80., material=1.6, radius=8.),
        dict(roc=-30., distance=4., material="air", radius=8.),
        dict(distance=50., radius=8.),
    ], wavelengths=[550e-9],
        object=dict(type="finite", radius=2.,
                    pupil=dict(radius=4., distance=80.)))
    s.update()
    text = system_to_seq(s)
    assert " 1e+10" not in text and "80" in text
    s2 = seq_to_system(text)
    assert s2.object.finite
    nptest.assert_allclose(s2[1].distance, 80., rtol=1e-12)


def test_seq_go_terminates_parse():
    """Commands after GO are analysis/edit state and must not mutate
    the finished system."""
    from rayopt_tpu.io.codev import seq_to_system
    seq = """
LEN
DIM MM
EPD 10
SO 0.0 1e10
S 100.0 5.0 BK7_SCHOTT
SI 0.0 0.0
GO
EPD 50
S 1.0 1.0
"""
    s = seq_to_system(seq)
    assert len(s) == 3
    nptest.assert_allclose(s.object.pupil.radius, 5.)


def test_seq_ir_glass_clamps_loudly(capsys):
    from rayopt_tpu.io.codev import _seq_glass_token
    from rayopt_tpu.materials import Material
    tok = _seq_glass_token(Material.make(3.42))
    assert tok == "999.999"
    assert "clamped" in capsys.readouterr().out
