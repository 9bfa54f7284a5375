"""refractiveindex.info database import (reference rii.py:39-111)."""

import logging
import os

import numpy as np
import yaml

from ..materials import CoefficientsMaterial
from ..utils.math import sfloat

logger = logging.getLogger(__name__)


def register_parsers():
    from .library import Catalog, LibMaterial
    Catalog.parsers["library.yml"] = yml_read
    LibMaterial.parsers["rii"] = rii_to_material


def yml_read(fil, session):
    """Walk the rii shelf/book/page tree into the library
    (reference rii.py:39)."""
    from .library import Catalog, LibMaterial
    top = Catalog()
    data = top.load(fil)
    top.type, top.source = "material", "rii"
    top.format, top.name = "rii", "refractiveindex.info"
    session.add(top)
    path = os.path.split(fil)[0]
    for shelf in yaml.safe_load(data):
        cat = Catalog(name=shelf["SHELF"], source=top.source,
                      type=top.type, format=top.format,
                      version=top.version, file=top.file,
                      date=top.date, imported=top.imported)
        session.add(cat)
        div = None
        for book in shelf["content"]:
            if "DIVIDER" in book:
                div = book["DIVIDER"]
                continue
            for page in book["content"]:
                if "DIVIDER" in page:
                    continue
                pfil = os.path.join(path, page["path"])
                try:
                    pdata = yaml.safe_load(open(pfil))
                    pdata["BOOK"] = book["BOOK"]
                    pdata["PAGE"] = page["PAGE"]
                    pdata["name"] = page["name"]
                    pdata["div"] = div
                    pdata["path"] = page["path"]
                    g = LibMaterial(
                        name="{}|{}".format(book["BOOK"], page["PAGE"]),
                        section="{}|{}".format(div, book["name"]),
                        comment=page["path"], data=yaml.dump(pdata))
                    cat.materials.append(g)
                except Exception as e:
                    logger.warning("error: %s: %s", page, e)
    return top


_typ_map = {
    "formula 1": "sellmeier_offset",
    "formula 2": "sellmeier_squared_offset",
    "formula 3": "polynomial",
    "formula 4": "refractiveindex_info",
    "formula 5": "cauchy",
    "formula 6": "gas_offset",
    "formula 7": "herzberger",
    "formula 8": "retro",
    "formula 9": "exotic",
}


def rii_to_material(dat, item=None):
    """Parse one rii page into a CoefficientsMaterial
    (reference rii.py:95)."""
    data = yaml.safe_load(dat)
    g = CoefficientsMaterial(
        name="{}|{}".format(data["BOOK"], data["PAGE"]),
        coefficients=[])
    g.comment = data.get("COMMENTS", None)
    g.references = data.get("REFERENCES", None)
    for d in data["DATA"]:
        typ = d["type"]
        if typ.startswith("formula"):
            g.typ = _typ_map[typ]
            g.lambda_min, g.lambda_max = (
                sfloat(v) for v in str(d["range"]).split())
            g.coefficients = np.array(
                [sfloat(v) for v in str(d["coefficients"]).split()])
        if typ == "tabulated k":
            g.tabulated_k = np.array(
                [sfloat(v) for v in d["data"].split()])
    return g
