"""refractiveindex.info database import.

Walks the shelf/book/page tree of an rii `library.yml` into the
catalog store and parses page records into CoefficientsMaterials
(behavioral parity with reference rii.py:39-111).
"""

import logging
import os

import numpy as np
import yaml

from ..materials import CoefficientsMaterial
from ..utils.math import sfloat

logger = logging.getLogger(__name__)

#: rii formula number -> dispersion formula name (reference rii.py:82)
FORMULA_MAP = {
    1: "sellmeier_offset",
    2: "sellmeier_squared_offset",
    3: "polynomial",
    4: "refractiveindex_info",
    5: "cauchy",
    6: "gas_offset",
    7: "herzberger",
    8: "retro",
    9: "exotic",
}
_typ_map = {"formula %d" % k: v for k, v in FORMULA_MAP.items()}


def register_parsers():
    from .library import Catalog, LibMaterial
    Catalog.parsers["library.yml"] = yml_read
    LibMaterial.parsers["rii"] = rii_to_material


def _iter_pages(shelf):
    """Yield (divider, book, page) entries of one shelf."""
    divider = None
    for book in shelf["content"]:
        if "DIVIDER" in book:
            divider = book["DIVIDER"]
            continue
        for page in book["content"]:
            if "DIVIDER" not in page:
                yield divider, book, page


def yml_read(fil, session):
    """Import the whole rii tree (reference rii.py:39): one Catalog
    per shelf, one material record per page."""
    from .library import Catalog, LibMaterial
    top = Catalog()
    toc = top.load(fil)
    top.type, top.source = "material", "rii"
    top.format, top.name = "rii", "refractiveindex.info"
    session.add(top)
    root = os.path.split(fil)[0]
    for shelf in yaml.safe_load(toc):
        cat = Catalog(name=shelf["SHELF"], source=top.source,
                      type=top.type, format=top.format,
                      version=top.version, file=top.file,
                      date=top.date, imported=top.imported)
        session.add(cat)
        for divider, book, page in _iter_pages(shelf):
            try:
                record = yaml.safe_load(
                    open(os.path.join(root, page["path"])))
                record.update(BOOK=book["BOOK"], PAGE=page["PAGE"],
                              name=page["name"], div=divider,
                              path=page["path"])
                cat.materials.append(LibMaterial(
                    name="{}|{}".format(book["BOOK"], page["PAGE"]),
                    section="{}|{}".format(divider, book["name"]),
                    comment=page["path"], data=yaml.dump(record)))
            except Exception as e:
                logger.warning("error: %s: %s", page, e)
    return top


def rii_to_material(dat, item=None):
    """Parse one rii page record (reference rii.py:95)."""
    record = yaml.safe_load(dat)
    mat = CoefficientsMaterial(
        name="{}|{}".format(record["BOOK"], record["PAGE"]),
        coefficients=[])
    mat.comment = record.get("COMMENTS", None)
    mat.references = record.get("REFERENCES", None)
    for entry in record["DATA"]:
        kind = entry["type"]
        if kind.startswith("formula"):
            mat.typ = _typ_map[kind]
            mat.lambda_min, mat.lambda_max = (
                sfloat(v) for v in str(entry["range"]).split())
            mat.coefficients = np.array(
                [sfloat(v) for v in str(entry["coefficients"]).split()])
        elif kind == "tabulated k":
            mat.tabulated_k = np.array(
                [sfloat(v) for v in entry["data"].split()])
    return mat
