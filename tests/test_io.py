"""Importer and catalog-store tests (zmx/agf/len/olc/glc/codev/rii +
sqlite library)."""

import os
import textwrap

import numpy as np
from numpy import testing as nptest
import pytest

import rayopt_tpu as ro
from rayopt_tpu.materials import lambda_d

ZMX = textwrap.dedent("""
    VERS 1
    UNIT MM
    NAME "zmx singlet"
    SURF 0
    CURV 0.0
    DISZ 10
    SURF 1
    CURV 0.02
    DISZ 5
    GLAS N-BK7 0 0 1.5168 64.17
    DIAM 10
    CONI -0.5
    PARM 1 1e-5
    PARM 2 1e-8
    SURF 2
    CURV -0.02
    DISZ 95
    STOP
    SURF 3
    DISZ 0
""")


def test_zmx():
    s = ro.zmx_to_system(ZMX)
    assert s.description == "zmx singlet"
    assert s.scale == 1e-3
    # SURF 0 is the object surface (Zemax semantics): 4 rows
    assert len(s) == 4
    assert s.stop == 2
    assert s[1].curvature == .02
    assert s[1].conic == -.5
    assert s[1].aspherics == [1e-5, 1e-8]
    nptest.assert_allclose(s[1].material.nd, 1.5168, atol=2e-4)


AGF = textwrap.dedent("""\
    NM TESTGLAS 2 0 1.51680 64.17 0 1
    GC test glass
    ED 7.1 0 2.51 0 0
    CD 1.03961212 0.00600069867 0.231792344 0.0200179144 1.01046945 103.560653
    TD 1e-6 1e-8 -1e-11 1e-7 1e-9 0.17 20
    LD 0.3 2.5
""")


def test_agf_material():
    from rayopt_tpu.io.zemax import agf_to_material
    m = agf_to_material(AGF)
    assert m.name == "TESTGLAS"
    assert m.typ == "sellmeier_squared"
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=2e-4)
    assert m.thermal is not None


LEN = textwrap.dedent("""\
    LEN NEW "oslo singlet" 100 2
    UNI 1.0
    RD 50.0
    TH 5.0
    AP 10.0
    GLA N-BK7
    NXT
    RD -50.0
    TH 95.0
    AIR
    NXT
    END
""")


def test_len():
    s = ro.len_to_system(LEN)
    assert len(s) >= 3
    nptest.assert_allclose(s[0].curvature, 1/50.)
    nptest.assert_allclose(s[1].curvature, -1/50.)
    nptest.assert_allclose(s[1].distance, 5.)


def test_olc():
    olc = ("RD 50.0; TH 5.0; AP 10.0; GLA N-BK7; NXT; "
           "RD -50.0; TH 95.0; NXT")
    s = ro.olc_to_system(olc)
    assert len(s) == 3
    nptest.assert_allclose(s[0].curvature, 1/50.)


def test_glc_material():
    from rayopt_tpu.io.oslo import glc_to_material
    # name nd vd density 6-skip 2-skip formula_id ncoeff coeffs...
    rec = ("TESTG 1.5168 64.17 2.51 0 0 0 0 0 0 0 0 1 6 "
           "2.271192 -9.661268e-3 1.103070e-2 7.003800e-5 "
           "1.396585e-5 -7.625605e-7")
    m = glc_to_material(rec)
    assert m.name == "TESTG"
    assert m.typ == "schott"
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=1e-3)


CODEV_XML = textwrap.dedent("""\
    <Catalog><Name>TestCat</Name><ID>T_</ID><Glasses>
    <Glass><GlassName>T_BK7ish</GlassName>
    <NumericName>517642</NumericName><Availability>1</Availability>
    <EquationType>Glass Manufacturer Sellmeier</EquationType>
    <DispersionCoefficients>
    <Coefficient>0</Coefficient>
    <Coefficient>1.03961212</Coefficient>
    <Coefficient>0.00600069867</Coefficient>
    <Coefficient>0.231792344</Coefficient>
    <Coefficient>0.0200179144</Coefficient>
    <Coefficient>1.01046945</Coefficient>
    <Coefficient>103.560653</Coefficient>
    </DispersionCoefficients></Glass></Glasses></Catalog>
""")


def test_codev_material():
    import xml.etree.ElementTree as et
    from rayopt_tpu.io.codev import codevxml_to_material
    glass = et.fromstring(CODEV_XML).find("./Glasses/Glass")
    m = codevxml_to_material(et.tostring(glass))
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=2e-4)


RII_PAGE = textwrap.dedent("""\
    BOOK: BK7
    PAGE: SCHOTT
    DATA:
    - type: formula 2
      range: 0.3 2.5
      coefficients: 0 1.03961212 0.00600069867 0.231792344 0.0200179144
        1.01046945 103.560653
""")


def test_rii_material():
    from rayopt_tpu.io.rii import rii_to_material
    m = rii_to_material(RII_PAGE)
    assert m.typ == "sellmeier_squared_offset"
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=2e-4)


def test_library_roundtrip(tmp_path):
    from rayopt_tpu.io.library import Library
    agf = tmp_path/"cat.agf"
    agf.write_text(AGF)
    lib = Library(str(tmp_path/"lib.sqlite"))
    lib.load(str(agf))
    m = lib.get("material", "TESTGLAS")
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=2e-4)
    # freshness: re-loading an unchanged file is a no-op
    lib.load(str(agf))
    rows = lib.conn.execute("select count(*) from material").fetchone()
    assert rows[0] == 1
    with pytest.raises(KeyError):
        lib.get("material", "NOPE")


def test_zmf_obfuscate_roundtrip():
    from rayopt_tpu.io.zemax import zmf_obfuscate
    data = b"VERS 000001\nhello world"
    enc = zmf_obfuscate(data, 50., 2.)
    dec = zmf_obfuscate(enc, 50., 2.)
    assert dec == data


def test_system_from_text():
    txt = """
    S 0 0 20 air
    S 50 5 20 n-bk7
    S -50 5 20 air
    S 0 95 20 air
    """
    s = ro.system_from_text(txt)
    assert len(s) == 4
    nptest.assert_allclose(s[1].curvature, 1/50.)


def test_zmf_end_to_end(tmp_path):
    """Synthesize a real .zmf binary catalog (header + obfuscated
    zmx descriptions) and run the whole import chain: binary read,
    de-obfuscation, library storage, lazy zmx parse to a System."""
    import struct
    from rayopt_tpu.io.zemax import (zmf_obfuscate, _ZMF_LENS,
                                     _ZMF_HEAD)
    from rayopt_tpu.io.library import Library

    def lens_record(name, efl, enp, zmx):
        desc = f"VERS 001001\n{zmx}"
        raw = desc.encode("latin1")
        blob = zmf_obfuscate(raw, efl, enp)
        head = _ZMF_LENS.pack(name.encode("latin1"), 1001, 2, 1, 0,
                              0, 0, len(blob), efl, enp)
        return head + blob

    zmx1 = ("UNIT MM\nSURF 0\nSURF 1\nCURV 0.02\nDISZ 5\n"
            "GLAS N-BK7 0 0 1.5168 64.17\nSURF 2\nDISZ 40\n")
    zmx2 = ("UNIT MM\nSURF 0\nSURF 1\nTYPE ODDASPHE\nCURV 0.01\n"
            "PARM 3 1E-06\nDISZ 3\nSURF 2\nDISZ 60\n")
    payload = _ZMF_HEAD.pack(1001)
    payload += lens_record("LA100", 50., 2., zmx1)
    payload += lens_record("ODD200", 100., 4., zmx2)
    f = tmp_path/"vendor.zmf"
    f.write_bytes(payload)

    lib = Library(str(tmp_path/"zmf.sqlite"))
    lib.load(str(f))
    lenses = list(lib.get_all("lens", catalog="vendor"))
    assert len(lenses) == 2
    by_desc = {len(s): s for s in lenses}
    s1 = lib.get("lens", "LA100", "vendor")
    assert abs(s1[1].curvature - 0.02) < 1e-12
    assert s1[1].material.nd == pytest.approx(1.5168, abs=1e-3)
    s2 = lib.get("lens", "ODD200", "vendor")
    assert s2[1].aspherics_odd == [0., 1e-6]


def test_zmx_writer_roundtrip():
    """zmx_to_system(system_to_zmx(s)) is SELF-CONTAINED: element
    count, stop index, geometry, and the conjugate/pupil seeding
    (ENPD/FTYP/RAIM) all survive, so the re-imported system traces
    the full-field radau bundle to the same spot RMS with NO manual
    restoration (VERDICT r4 task 4)."""
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.io.zemax import system_to_zmx, zmx_to_system
    from rayopt_tpu import GeometricTrace
    s = cooke_triplet()
    s.update()
    text = system_to_zmx(s)
    s2 = zmx_to_system(text)
    assert len(s2) == len(s)
    assert s2.stop == s.stop
    np.testing.assert_allclose(s2.wavelengths, s.wavelengths,
                               rtol=1e-8)
    assert s2.object.pupil.aim == s.object.pupil.aim
    np.testing.assert_allclose(s2.object.pupil.radius,
                               s.object.pupil.radius, rtol=1e-8)
    np.testing.assert_allclose(s2.object.angle, s.object.angle,
                               rtol=1e-8)
    for j, e in enumerate(s):
        e2 = s2[j]
        np.testing.assert_allclose(getattr(e2, "curvature", 0.),
                                   getattr(e, "curvature", 0.),
                                   rtol=1e-12)
        np.testing.assert_allclose(e2.distance, e.distance, rtol=1e-12)
        np.testing.assert_allclose(e2.radius, e.radius)
    s2.update()
    g = GeometricTrace(s)
    g.rays_point((0, 1.), nrays=13, distribution="radau", filter=False)
    g2 = GeometricTrace(s2)
    g2.rays_point((0, 1.), nrays=13, distribution="radau",
                  filter=False)
    np.testing.assert_allclose(g2.rms(), g.rms(), rtol=1e-6)


def test_zmx_writer_odd_aspheres():
    from rayopt_tpu.io.zemax import system_to_zmx, zmx_to_system
    from rayopt_tpu.elements import Spheroid
    from rayopt_tpu.system import System
    from rayopt_tpu.materials import air
    import numpy as np
    s = System()
    s.append(Spheroid(material=air, radius=8.))
    s.append(Spheroid(distance=10., curvature=.02, conic=-.4,
                      aspherics=[0., 1e-6],
                      aspherics_odd=[0., 2e-5], material=1.6,
                      radius=8.))
    s.append(Spheroid(distance=4., material=air, radius=8.))
    s.append(Spheroid(distance=50., material=None, radius=20.))
    s.wavelengths = [550e-9]
    s2 = zmx_to_system(system_to_zmx(s))
    e = s2[1]
    np.testing.assert_allclose(e.conic, -.4)
    np.testing.assert_allclose(e.aspherics, [0., 1e-6])
    np.testing.assert_allclose(e.aspherics_odd, [0., 2e-5])


def test_zmx_coordbrk_tilted_plate():
    """Coordinate breaks: tilt(+t) / plane plate / tilt(-t) must
    displace an axial ray laterally by the textbook plate formula
    d sin t (1 - cos t/(n cos t')) and leave it exactly parallel."""
    import numpy as np
    from rayopt_tpu.io.zemax import zmx_to_system
    theta, n, d = 10., 1.5, 5.
    zmx = "\n".join([
        "UNIT MM",
        "SURF 0", "  DISZ 10",
        "SURF 1", "  TYPE COORDBRK", "  PARM 3 %g" % theta,
        "  DISZ 0",
        "SURF 2", "  GLAS FAKE 0 0 %g 60" % n, "  DISZ %g" % d,
        "SURF 3", "  DISZ 0",
        "SURF 4", "  TYPE COORDBRK", "  PARM 3 %g" % -theta,
        "  DISZ 30",
        "SURF 5", "  DISZ 0",
    ])
    s = zmx_to_system(zmx)
    # breaks fold away: object row + 2 plate rows + image
    assert len(s) == 4
    s.wavelengths = [587.56e-9]
    y0 = np.zeros((1, 3))
    u0 = np.array([[0., 0., 1.]])
    ys, us, _, _ = s.trace_table(y0, u0, s.wavelengths[0])
    from rayopt_tpu.materials import air as _air
    t = np.deg2rad(theta)
    n_rel = n/_air.refractive_index(s.wavelengths[0])
    tp = np.arcsin(np.sin(t)/n_rel)
    want = d*np.sin(t)*(1 - np.cos(t)/(n_rel*np.cos(tp)))
    # the restore break recovers the direction but the axis stays
    # laterally displaced (Zemax semantics): global lateral = local
    # image coordinate plus the accumulated vertex offset
    lateral = ys[-1, 0, 1] + s.origins[-1][1]
    np.testing.assert_allclose(abs(lateral), want, rtol=1e-9)
    np.testing.assert_allclose(ys[-1, 0, 0], 0., atol=1e-12)
    # exit ray exactly parallel to the axis again
    np.testing.assert_allclose(us[-1, 0], [0., 0., 1.], atol=1e-12)


def test_zmx_coordbrk_decenter_matches_manual_offset():
    """A decenter-only break equals building the surface with the
    same lab-frame vertex offset directly."""
    import numpy as np
    from rayopt_tpu.io.zemax import zmx_to_system
    from rayopt_tpu.elements import Spheroid
    from rayopt_tpu.system import System
    from rayopt_tpu.materials import air
    dx, gap = 2., 10.
    zmx = "\n".join([
        "UNIT MM",
        "SURF 0", "  DISZ 0",
        "SURF 1", "  TYPE COORDBRK", "  PARM 1 %g" % dx, "  DISZ %g" % gap,
        "SURF 2", "  CURV 0.02", "  GLAS FAKE 0 0 1.5 60", "  DISZ 5",
        "SURF 3", "  DISZ 40",
        "SURF 4", "  DISZ 0",
    ])
    s = zmx_to_system(zmx)
    s.wavelengths = [587.56e-9]
    from rayopt_tpu.elements import set_pose
    m = System()
    m.append(Spheroid(material=air))
    m.append(Spheroid(material=air))       # the implicit zemax object
    e = Spheroid(curvature=0.02, material=1.5)
    # decentered but NOT tilted: bare `offset =` would follow the
    # heading with a swung local frame; pin the frame to identity
    set_pose(e, np.array([dx, 0., gap]), np.eye(3))
    m.append(e)
    e2 = Spheroid(material=air)
    e2.offset = np.array([0., 0., 5.])
    m.append(e2)
    e3 = Spheroid(material=None)
    e3.offset = np.array([0., 0., 40.])
    m.append(e3)
    m.wavelengths = [587.56e-9]
    rng = np.random.RandomState(0)
    y0 = np.zeros((8, 3))
    y0[:, :2] = rng.uniform(-1, 1, (8, 2))
    u0 = np.zeros((8, 3))
    u0[:, 2] = 1.
    ys, us, _, _ = s.trace_table(y0, u0, s.wavelengths[0])
    ym, um, _, _ = m.trace_table(y0, u0, m.wavelengths[0])
    np.testing.assert_allclose(ys[-1], ym[-1], atol=1e-10)
    np.testing.assert_allclose(us[-1], um[-1], atol=1e-12)


def test_zmx_conjugate_field_round_trip():
    """ENPD/FTYP/XFLN/YFLN survive the writer->importer round trip:
    pupil radius, field set, and finite/infinite object (the
    reference importer drops all of these)."""
    import numpy as np
    import rayopt_tpu as ro
    from rayopt_tpu.io.zemax import zmx_to_system
    from rayopt_tpu.models import doublet, cooke_triplet
    s = zmx_to_system(ro.system_to_zmx(cooke_triplet()))
    s.update()
    assert not s.object.finite
    nptest.assert_allclose(np.rad2deg(s.object.angle), 20.)
    nptest.assert_allclose(s.object.pupil.radius, 6.25)
    nptest.assert_allclose(s.fields, [0., .7, 1.])
    nptest.assert_allclose(s.paraxial.focal_length[1], 49.85,
                           rtol=1e-3)
    s = zmx_to_system(ro.system_to_zmx(doublet()))
    s.update()
    assert s.object.finite
    nptest.assert_allclose(s.object.radius, 1.)
    nptest.assert_allclose(s.object.pupil.radius, .1)


@pytest.mark.slow
def test_cli_report(tmp_path):
    """python -m rayopt_tpu <prescription> runs the full report on
    bundled models and .zmx files and writes the HTML export."""
    import subprocess
    import sys
    out = tmp_path/"report.html"
    r = subprocess.run(
        [sys.executable, "-m", "rayopt_tpu", "doublet", "--cpu",
         "--no-text", "-o", str(out)],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))))
    assert r.returncode == 0, r.stderr[-1500:]
    assert out.exists() and out.stat().st_size > 10000


def test_system_from_array_shifts_and_material_map():
    """The column-table builder's corner features (reference
    formats.py:40): column shifts realign off-by-one prescriptions,
    material_map renames catalog entries, and A/O rows set the stop
    and the field."""
    data = [
        ["O", 0., 20., 10., "air"],
        ["S", 50., 5., 18., "glass"],
        ["A", 0., 2., 16., "air"],
        ["S", -50., 3., 18., "air"],
        ["I", 0., 95., 30., "air"],
    ]
    s = ro.system_from_array(
        data, material_map={"glass": "SCHOTT-BK|N-BK7"})
    s.object.pupil.radius = 5.
    s.object.pupil.update_radius = False
    s.update()
    assert s.aperture is s[2]
    assert abs(s[1].curvature - 1/50.) < 1e-12
    assert s[1].material.nd > 1.5
    # shifts: same table with the distance column off by one row
    import numpy as np
    shifted = [list(r) for r in data]
    dcol = [r[2] for r in data]
    for i, r in enumerate(shifted):
        r[2] = dcol[i - 1]
    s2 = ro.system_from_array(
        shifted, shifts={"distance": -1},
        material_map={"glass": "SCHOTT-BK|N-BK7"})
    nptest.assert_allclose([float(e.distance) for e in s2],
                           [float(e.distance) for e in s])


def test_zmx_mce_import():
    # multi-configuration (MCE) section: THIC/CRVT/CONN/WAVE/APER/
    # GLSS operands lower to System.configurations write specs
    # (the reference drops the whole section, reference zemax.py:168)
    zmx = textwrap.dedent("""
        UNIT MM
        WAVL 0.5875618 0.4861327
        MNUM 2 4
        MOFF 0 1 ""
        THIC 2 0 0
          1 12 0 0 0 0 ""
          2 4 0 0 0 0 ""
        CRVT 1 0 0
          1 0.02 0 0 0 0 ""
          2 0.025 0 0 0 0 ""
        WAVE 1 0 0
          1 0.5875618 0 0 0 0 ""
          2 0.6562725 0 0 0 0 ""
        APER 0 0 0
          1 10 0 0 0 0 ""
          2 6 0 0 0 0 ""
        GLSS 1 0 0
          1 N-BK7 0 0 0 0 ""
          2 N-SF5 0 0 0 0 ""
        SURF 0
          DISZ INFINITY
        SURF 1
          CURV 0.02
          DISZ 3
          GLAS N-BK7 0 0 1.5168 64.17
        SURF 2
          STOP
          DISZ 12
        SURF 3
          DISZ 10
        SURF 4
        """)
    s = ro.io.zemax.zmx_to_system(zmx)
    assert s.n_configurations == 2
    # THIC j maps onto imported[j+1].distance (SURF 0 = object row)
    assert {"set": [3, "distance"], "value": 12.0} \
        in s.configurations[0]
    s0 = s.at_configuration(0, update=False)
    s1 = s.at_configuration(1, update=False)
    assert s0[3].distance == 12. and s1[3].distance == 4.
    assert s1[1].curvature == 0.025
    assert abs(s1.wavelengths[0] - 0.6562725e-6) < 1e-15
    assert s0.object.pupil.radius == 5.
    assert s1.object.pupil.radius == 3.
    assert "SF5" in str(s1[1].material)
    assert "BK7" in str(s0[1].material)


def test_zmx_mce_zoom_round_trip():
    # the zoom model exports an MNUM block and reimports to a system
    # whose per-configuration first-order solutions match
    from rayopt_tpu.models import zoom_telephoto
    z = zoom_telephoto()
    txt = ro.io.zemax.system_to_zmx(z)
    assert "MNUM 2 1" in txt
    z2 = ro.io.zemax.zmx_to_system(txt)
    z2.update()
    assert z2.n_configurations == 2
    for i in range(2):
        fa = z.at_configuration(i).paraxial.focal_length
        fb = z2.at_configuration(i).paraxial.focal_length
        nptest.assert_allclose(np.asarray(fb), np.asarray(fa),
                               rtol=1e-6)


def test_zmx_freeform_roundtrip():
    """FreeformXY exports as TYPE XPOLYNOM, ZernikeSag as SZERNSAG
    (both: XDAT 1 = term count, 2 = norm radius, 3.. = coefficients,
    even aspherics in the PARM columns); reimport reproduces the
    coefficients and the sag exactly."""
    import numpy as np
    from rayopt_tpu.elements import FreeformXY, ZernikeSag, Spheroid
    from rayopt_tpu.system import System
    from rayopt_tpu.io.zemax import system_to_zmx, zmx_to_system
    from rayopt_tpu.materials import ModelMaterial
    glass = ModelMaterial(n=1.58913, name="glass", solid=True)
    s = System(wavelengths=[587.56e-9])
    s.object.angle = np.deg2rad(1.)
    s.object.pupil.radius = 5.
    s.append(Spheroid(material="basic/air", radius=np.inf,
                      distance=20.))
    s.append(FreeformXY(
        curvature=0.01, conic=-0.5, aspherics=[1e-6, 2e-9],
        xy_coefficients=[0., 0., 1e-3, 5e-4, -2e-3, 0., 1e-5, 0.,
                         3e-5],
        norm_radius=12., material=glass, radius=10., distance=5.))
    s.append(ZernikeSag(
        curvature=-0.005,
        zernike_coefficients=[0., 0., 0., 2e-4, 0., 1e-4, 0., 0., 0.,
                              0., -5e-5],
        norm_radius=11., material="basic/air", radius=10.,
        distance=3.))
    s.append(Spheroid(material="basic/air", radius=8., distance=40.))
    text = system_to_zmx(s)
    assert "TYPE XPOLYNOM" in text
    assert "TYPE SZERNSAG" in text
    s2 = zmx_to_system(text)
    e1, e2 = s2[1], s2[2]
    assert isinstance(e1, FreeformXY) and not isinstance(e1,
                                                         ZernikeSag)
    assert isinstance(e2, ZernikeSag)
    np.testing.assert_allclose(e1.xy_coefficients,
                               s[1].xy_coefficients)
    assert e1.norm_radius == s[1].norm_radius
    np.testing.assert_allclose(e1.aspherics, s[1].aspherics)
    np.testing.assert_allclose(e2.zernike_coefficients,
                               s[2].zernike_coefficients)
    np.testing.assert_allclose(e2.xy_coefficients,
                               s[2].xy_coefficients)
    gx, gy = np.meshgrid(np.linspace(-8., 8., 7),
                         np.linspace(-8., 8., 7))
    xyz = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
    np.testing.assert_allclose(e1.surface_sag(xyz),
                               s[1].surface_sag(xyz), atol=1e-14)
    np.testing.assert_allclose(e2.surface_sag(xyz),
                               s[2].surface_sag(xyz), atol=1e-14)


def test_zmx_fringe_zernike_import():
    """TYPE FZERNSAG: unnormalized Fringe-ordered coefficients are
    converted exactly to the native Noll-orthonormal convention;
    pinned against the textbook Fringe defocus (2 rho^2 - 1) and
    spherical (6 rho^4 - 6 rho^2 + 1) polynomials."""
    import numpy as np
    from rayopt_tpu.elements import ZernikeSag
    from rayopt_tpu.io.zemax import zmx_to_system
    from rayopt_tpu.utils.zernike import fringe_to_noll
    text = """VERS 1.0 test
UNIT MM IN IN IN
WAVL 0.58756
SURF 0
  TYPE STANDARD
  DISZ 20
SURF 1
  TYPE FZERNSAG
  CURV 0.002
  PARM 1 1e-06
  XDAT 1 9
  XDAT 2 10
  XDAT 6 0.0005
  XDAT 11 -0.0002
  DISZ 30
SURF 2
  TYPE STANDARD
"""
    s = zmx_to_system(text)
    e = s[1]
    assert isinstance(e, ZernikeSag)
    fringe = [0.]*9
    fringe[3] = 5e-4    # Fringe term 4: defocus, 2 rho^2 - 1
    fringe[8] = -2e-4   # Fringe term 9: spherical, 6 r^4 - 6 r^2 + 1
    np.testing.assert_allclose(e.zernike_coefficients,
                               fringe_to_noll(fringe))
    np.testing.assert_allclose(e.aspherics, [1e-6])
    assert e.norm_radius == 10.
    # analytic sag at one point (surface_sag returns z - sag; the
    # vertex re-reference drops the constant parts of Z4/Z9)
    x, y = 5., 3.
    r2 = x*x + y*y
    rho2 = r2/e.norm_radius**2
    want = (0.002*r2/(1 + np.sqrt(1 - 0.002**2*r2)) + 1e-6*r2
            + 5e-4*(2*rho2 - 1) - 2e-4*(6*rho2**2 - 6*rho2 + 1))
    const = 5e-4*(-1) - 2e-4*(+1)
    got = -e.surface_sag(np.array([[x, y, 0.]]))[0]
    np.testing.assert_allclose(got, want - const, atol=1e-15)


def test_fringe_noll_conversion():
    """Fringe <-> Noll index map and amplitude conversion: the same
    surface under both labels, and a lossless round trip."""
    import numpy as np
    from rayopt_tpu.utils.zernike import (
        fringe_to_nm, fringe_to_noll, noll_to_fringe, noll_from_nm,
        zernike)
    gold = {1: (0, 0), 2: (1, 1), 3: (1, -1), 4: (2, 0), 5: (2, 2),
            6: (2, -2), 7: (3, 1), 8: (3, -1), 9: (4, 0),
            10: (3, 3), 16: (6, 0), 17: (4, 4), 25: (8, 0),
            36: (10, 0), 37: (12, 0)}
    for i, nm in gold.items():
        assert fringe_to_nm(i) == nm, (i, fringe_to_nm(i), nm)
    c = np.zeros(37)
    c[[3, 4, 8, 36]] = [1.5, -0.2, 0.7, 0.01]
    noll = fringe_to_noll(list(c))
    back = noll_to_fringe(noll)
    back = back + [0.]*(37 - len(back))
    np.testing.assert_allclose(back, c)
    # functional identity on random disc samples
    rng = np.random.RandomState(0)
    x, y = rng.uniform(-0.7, 0.7, (2, 64))
    s_fringe = 0.
    for i, ci in enumerate(c):
        if not ci:
            continue
        n, m = fringe_to_nm(i + 1)
        norm = np.sqrt(n + 1.) if m == 0 else np.sqrt(2.*(n + 1.))
        s_fringe = s_fringe + ci*zernike(noll_from_nm(n, m), x,
                                         y)/norm
    s_noll = sum(cj*zernike(j + 1, x, y)
                 for j, cj in enumerate(noll) if cj)
    np.testing.assert_allclose(s_fringe, s_noll, atol=1e-12)


def test_zmx_pose_roundtrip():
    """Element poses (tilt/decenter/fold) export as COORDBRK rows and
    re-import to the exact same table geometry and traced RMS --
    previously poses were silently dropped by the writer."""
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.elements import set_pose
    from rayopt_tpu.io.zemax import system_to_zmx, zmx_to_system
    from rayopt_tpu import GeometricTrace
    s = cooke_triplet()
    s[3].angles = (2e-3, -1e-3, 0.)
    set_pose(s[5], np.asarray(s[5].offset) + [1e-2, -2e-2, 0.],
             np.eye(3))
    s.update()
    text = system_to_zmx(s)
    assert text.count("TYPE COORDBRK") >= 2
    s2 = zmx_to_system(text)
    assert len(s2) == len(s) and s2.stop == s.stop
    s2.update()
    t1, t2 = s.table(), s2.table()
    for f in ("offset", "rot", "curvature", "distance"):
        np.testing.assert_allclose(
            np.asarray(getattr(t2, f)), np.asarray(getattr(t1, f)),
            atol=1e-12, err_msg=f)
    g1 = GeometricTrace(s)
    g1.rays_point((0, 1.), nrays=13, distribution="radau",
                  filter=False)
    g2 = GeometricTrace(s2)
    g2.rays_point((0, 1.), nrays=13, distribution="radau",
                  filter=False)
    np.testing.assert_allclose(g2.rms(), g1.rms(), rtol=1e-12)


def test_zmx_fold_mirror_pose_roundtrip():
    """A permanent axis change (uncompensated large tilt) also
    round-trips: the writer's running-axis model matches the
    importer's apply_break exactly."""
    import numpy as np
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.io.zemax import system_to_zmx, zmx_to_system
    s = cooke_triplet()
    s[2].angles = (0., 0.3, 0.)
    s.update()
    s2 = zmx_to_system(system_to_zmx(s))
    s2.update()
    t1, t2 = s.table(), s2.table()
    np.testing.assert_allclose(np.asarray(t2.rot),
                               np.asarray(t1.rot), atol=1e-12)
    np.testing.assert_allclose(np.asarray(t2.offset),
                               np.asarray(t1.offset), atol=1e-12)
