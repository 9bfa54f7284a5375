"""Build the bundled material catalog (rayopt_tpu/data/library.sqlite).

Re-imports the public refractiveindex.info database records (the same
corpus the reference ships, reference library.py:69-87) through
rayopt_tpu's own io machinery: each raw rii YAML page blob is parsed
with io.rii.rii_to_material, its nd/vd are evaluated from the
dispersion formula at the Fraunhofer d/F/C lines when the formula's
validity range covers them, and the record is written into the
io.library schema.

Usage: python tools/build_library.py [source.sqlite] [dest.sqlite]
"""

import os
import sqlite3
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rayopt_tpu.io.library import Library, Catalog, LibMaterial, _Session  # noqa: E402
from rayopt_tpu.io.rii import rii_to_material  # noqa: E402
from rayopt_tpu.materials import fraunhofer  # noqa: E402

LINES = {k: fraunhofer[k] for k in "dFC"}


def measure_lines(mat):
    """(nd, vd) from the parsed dispersion formula, or (None, None) if
    the formula's stated range does not cover the visible lines."""
    lmin = getattr(mat, "lambda_min", None)
    lmax = getattr(mat, "lambda_max", None)
    if lmin is None or lmax is None or not len(mat.coefficients):
        return None, None
    lo, hi = lmin * 1e-6, lmax * 1e-6
    if lo > LINES["F"] or hi < LINES["C"]:
        return None, None
    try:
        nd = float(mat.refractive_index(LINES["d"]))
        nf = float(mat.refractive_index(LINES["F"]))
        nc = float(mat.refractive_index(LINES["C"]))
    except Exception:
        return None, None
    vd = (nd - 1) / (nf - nc) if nf != nc else None
    return nd, vd


def build(source, dest):
    src = sqlite3.connect(f"file:{source}?mode=ro", uri=True)
    src.row_factory = sqlite3.Row
    if os.path.exists(dest):
        os.remove(dest)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    lib = Library(dest)

    shelves = src.execute(
        "select id, name, comment from catalog order by id").fetchall()
    total = kept = with_nd = 0
    for shelf in shelves:
        session = _Session()
        cat = Catalog(name=shelf["name"], type="material", source="rii",
                      format="rii", comment="refractiveindex.info public "
                      "database (rebuilt via rayopt_tpu.io.rii)",
                      file=f"rii:{shelf['name']}", imported=time.time())
        session.add(cat)
        rows = src.execute(
            "select name, comment, section, data from material "
            "where catalog_id = ? order by name", (shelf["id"],))
        for row in rows:
            total += 1
            try:
                mat = rii_to_material(row["data"])
            except Exception as e:
                print(f"skip {row['name']}: {e}", file=sys.stderr)
                continue
            nd, vd = measure_lines(mat)
            kept += 1
            with_nd += nd is not None
            cat.materials.append(LibMaterial(
                name=row["name"], comment=row["comment"],
                section=row["section"], solid=1, mirror=0,
                nd=nd, vd=vd, data=row["data"]))
        lib._commit(session)
        print(f"shelf {shelf['name']}: {len(cat.materials)} materials")
    print(f"{kept}/{total} imported, {with_nd} with measured nd -> {dest}")
    return kept


if __name__ == "__main__":
    argv = sys.argv[1:]
    source = argv[0] if argv else "/root/reference/rayopt/library.sqlite"
    dest = (argv[1] if len(argv) > 1 else
            os.path.join(os.path.dirname(__file__), "..",
                         "rayopt_tpu", "data", "library.sqlite"))
    build(source, os.path.abspath(dest))
