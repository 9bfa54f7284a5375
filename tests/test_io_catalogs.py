"""Catalog-level importer tests: synthetic OSLO .dir/.dat, .glc,
Code V .xml, and an rii shelf tree, all loaded through the sqlite
Library and parsed back into materials/systems."""

import textwrap

import numpy as np
from numpy import testing as nptest
import pytest

from rayopt_tpu.io.library import Library
from rayopt_tpu.materials import lambda_d


@pytest.fixture
def lib(tmp_path):
    return Library(str(tmp_path/"lib.sqlite"))


def test_oslo_dir_catalog(tmp_path, lib):
    lens = ("RD 50.0; TH 5.0; AP 10.0; GLA N-BK7; NXT; "
            "RD -50.0; TH 95.0; NXT;")
    (tmp_path/"stock.dat").write_text(lens)
    (tmp_path/"stock.dir").write_text(
        "offset,length,elements,name,efl,diameter,thickness\n"
        "0,%d,1,TEST01,100.0,20.0,5.0\n" % len(lens))
    lib.load(str(tmp_path/"stock.dir"))
    s = lib.get("lens", "TEST01")
    assert len(s) == 3
    nptest.assert_allclose(s[0].curvature, 1/50.)


def test_glc_catalog(tmp_path, lib):
    rec = ("TESTG 1.5168 64.17 2.51 0 0 0 0 0 0 0 0 1 6 "
           "2.271192 -9.661268e-3 1.103070e-2 7.003800e-5 "
           "1.396585e-5 -7.625605e-7")
    (tmp_path/"glass.glc").write_text("1.0 1 testcat\n%s\n" % rec)
    lib.load(str(tmp_path/"glass.glc"))
    m = lib.get("material", "TESTG")
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=1e-3)


def test_codev_xml_catalog(tmp_path, lib):
    xml = textwrap.dedent("""\
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
    (tmp_path/"testcat.xml").write_text(xml)
    lib.load(str(tmp_path/"testcat.xml"))
    m = lib.get("material", "BK7ish")
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=2e-4)


def test_rii_tree(tmp_path, lib):
    page = textwrap.dedent("""\
        DATA:
        - type: formula 2
          range: 0.3 2.5
          coefficients: 0 1.03961212 0.00600069867 0.231792344
            0.0200179144 1.01046945 103.560653
    """)
    (tmp_path/"data").mkdir()
    (tmp_path/"data"/"bk7.yml").write_text(page)
    shelf = textwrap.dedent("""\
        - SHELF: glass
          content:
          - DIVIDER: test glasses
          - BOOK: BK7
            name: bk7 family
            content:
            - PAGE: TESTRII
              name: test page
              path: data/bk7.yml
    """)
    (tmp_path/"library.yml").write_text(shelf)
    lib.load(str(tmp_path/"library.yml"))
    m = lib.get("material", "BK7|TESTRII")
    nptest.assert_allclose(m.refractive_index(lambda_d), 1.5168,
                           atol=2e-4)


def test_load_all_skips_garbage(tmp_path, lib):
    (tmp_path/"junk.unknown").write_text("nonsense")
    (tmp_path/"bad.glc").write_text("")  # broken catalog
    lib.load_all([str(tmp_path)])  # must not raise


def test_len_writer_round_trip():
    """system_to_len (beyond reference: the reference only imports
    .len) round-trips the Cooke triplet through len_to_system --
    geometry, stop, glasses, and first-order properties survive."""
    import io
    import numpy as np
    from numpy import testing as nptest
    from rayopt_tpu.models import cooke_triplet
    from rayopt_tpu.io.oslo import system_to_len, len_to_system
    s = cooke_triplet()
    txt = system_to_len(s)
    s2 = len_to_system(io.StringIO(txt))
    assert s2.description == s.description
    assert s2.stop == s.stop
    assert len(s2) == len(s)
    for a, b in zip(s, s2):
        nptest.assert_allclose(getattr(b, "curvature", 0.),
                               getattr(a, "curvature", 0.), rtol=1e-12)
        nptest.assert_allclose(b.distance, a.distance, rtol=1e-12)
    # conjugates are not part of .len; carry them over and compare
    # the lens itself
    s2.wavelengths = s.wavelengths
    s2.object = s.object
    s2.image = s.image
    s2.update()
    nptest.assert_allclose(s2.paraxial.focal_length,
                           s.paraxial.focal_length, rtol=1e-9)


def test_len_round_trip_keeps_long_gaps():
    """A 150 mm gap survives (the reference's 1e2 clamp would have
    turned it into infinity, reference oslo.py:146)."""
    import io
    import rayopt_tpu as ro
    from rayopt_tpu.io.oslo import system_to_len, len_to_system
    s = ro.System([
        dict(material="air"),
        dict(roc=80., distance=150., material="SCHOTT-BK|N-BK7",
             radius=10.),
        dict(distance=5., material="air", radius=10.),
        dict(distance=40., radius=10.),
    ])
    s2 = len_to_system(io.StringIO(system_to_len(s)))
    assert s2[1].distance == 150.
