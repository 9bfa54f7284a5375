"""End-to-end tests for the bundled material catalog
(rayopt_tpu/data/library.sqlite): install, query, Material.make
fallback, and the nd-vs-formula consistency check (the `-n` path of
the library CLI; reference library.py:69-135, material.py:88-135).
"""

import os
import sqlite3

import numpy as np
import pytest

import rayopt_tpu  # noqa: F401  (jax config)
from rayopt_tpu.io.library import Library, ParsedItem
from rayopt_tpu.materials import (
    Material, CoefficientsMaterial, lambda_d, fraunhofer)

BUNDLED = os.path.join(os.path.dirname(rayopt_tpu.__file__),
                       "data", "library.sqlite")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BUNDLED), reason="bundled catalog not built")


@pytest.fixture(scope="module")
def lib():
    if Library._one is None:
        Library._one = Library(BUNDLED)
    return Library.one()


def test_corpus_size(lib):
    count = lib.conn.execute("select count(*) from material").fetchone()[0]
    assert count >= 1514  # the reference ships 1514 rii materials


def test_query_and_parse(lib):
    m = lib.get("material", "BK7", "glass")
    assert isinstance(m, CoefficientsMaterial)
    np.testing.assert_allclose(
        float(m.refractive_index(lambda_d)), 1.5168, atol=2e-4)


def test_prefix_and_suffix_resolution(lib):
    # book-prefix: "BK7" -> "BK7|<vendor>"
    m = lib.get("material", "BK7")
    assert m.name.split("|")[0] == "BK7"
    # page-suffix: "LAFN7" -> "SCHOTT-LaF|LAFN7"
    m = lib.get("material", "LAFN7")
    np.testing.assert_allclose(
        float(m.refractive_index(lambda_d)), 1.7495, atol=2e-3)


def test_material_make_falls_back_to_catalog(lib, monkeypatch):
    # a glass absent from the hardcoded builtin set resolves via the DB
    m = Material.make("glass/N-LASF31A")
    nd = float(m.refractive_index(lambda_d))
    np.testing.assert_allclose(nd, 1.883, atol=2e-3)


def test_nd_consistency(lib):
    """The reference CLI's `-n` check: stored nd must match the parsed
    dispersion formula at the d line for every record that has one."""
    rows = lib.conn.execute(
        "select m.*, c.format as _format from material m join catalog c "
        "on m.catalog_id = c.id where m.nd is not null").fetchall()
    assert len(rows) >= 1000
    bad = []
    for row in rows:
        d = dict(row)
        fmt = d.pop("_format")
        m = ParsedItem("material", d, fmt).parse()
        nd = float(m.refractive_index(lambda_d))
        if abs(d["nd"] - nd) > 1e-3:
            bad.append((d["name"], d["nd"], nd))
    assert not bad, bad[:10]


def test_vd_sane(lib):
    """Abbe numbers of the glass shelf follow the catalog convention
    vd = (nd-1)/(nF-nC) and fall in the physical 15..100 band."""
    rows = lib.conn.execute(
        "select m.nd, m.vd, m.data, c.format as _format, m.name, "
        "m.comment, m.section, m.id, m.catalog_id from material m "
        "join catalog c on m.catalog_id = c.id join catalog cc on "
        "m.catalog_id = cc.id where cc.name = 'glass' and m.vd is not "
        "null limit 200").fetchall()
    assert rows
    for row in rows:
        d = dict(row)
        fmt = d.pop("_format")
        m = ParsedItem("material", d, fmt).parse()
        nf = float(m.refractive_index(fraunhofer["F"]))
        nc = float(m.refractive_index(fraunhofer["C"]))
        vd = (d["nd"] - 1)/(nf - nc)
        np.testing.assert_allclose(vd, d["vd"], rtol=1e-6)
        assert 10 < d["vd"] < 110


def test_find_db_installs_bundled(tmp_path, monkeypatch):
    monkeypatch.delenv("RAYOPT_TPU_LIBRARY", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    lib2 = Library.__new__(Library)
    db = Library.find_db(lib2)
    assert os.path.exists(db)
    conn = sqlite3.connect(db)
    n = conn.execute("select count(*) from material").fetchone()[0]
    conn.close()
    assert n >= 1514
