"""Code V XML glass catalogs (reference codev.py:32-67)."""

import xml.etree.ElementTree as et

import numpy as np

from ..materials import CoefficientsMaterial


def register_parsers():
    from .library import Catalog, LibMaterial
    Catalog.parsers[".xml"] = codevxml_read
    LibMaterial.parsers["codev"] = codevxml_to_material


def codevxml_read(file, session):
    from .library import Catalog, LibMaterial
    cat = Catalog()
    data = cat.load(file)
    cat.type, cat.source, cat.format = "material", "codev", "codev"
    data = et.fromstring(data)
    cat.name = data.find("./Name").text
    cat.comment = data.find("./ID").text
    session.add(cat)
    for glass in data.iterfind("./Glasses/Glass"):
        rec = LibMaterial()
        cat.materials.append(rec)
        name = glass.find("./GlassName").text
        assert name.startswith(cat.comment), (cat.comment, name)
        rec.name = name[len(cat.comment):]
        rec.comment = glass.find("./NumericName").text
        rec.status = int(glass.find("./Availability").text)
        rec.data = et.tostring(glass).decode()
    return cat


_EQ_MAP = {
    "Standard Sellmeier": "sellmeier",
    "Glass Manufacturer Sellmeier": "sellmeier_squared_offset",
    "Laurent": "schott",
    "Glass Manufacturer Laurent": "schott",
    "Herzberger": "herzberger",
    "Cauchy": "conrady",
}


def codevxml_to_material(data, item=None):
    data = et.fromstring(data)
    mat = CoefficientsMaterial(coefficients=[])
    mat.typ = _EQ_MAP[data.find("./EquationType").text]
    mat.name = data.find("./GlassName").text[2:]
    mat.coefficients = np.array([
        float(c.text) for c in data.iterfind(
            "./DispersionCoefficients/Coefficient")])
    return mat


def main(argv=None):
    """CLI: import Code V XML glass catalogs from a zip or directory."""
    import argparse
    import zipfile
    import tempfile
    import shutil
    import os
    from .library import Library

    parser = argparse.ArgumentParser()
    parser.add_argument("location", help="zip file or directory of "
                        "glass-catalog XML files")
    parser.add_argument("-d", "--db", default=None)
    opts = parser.parse_args(argv)
    lib = Library(opts.db)
    if os.path.isdir(opts.location):
        for f in os.listdir(opts.location):
            lib.load(os.path.join(opts.location, f))
        return
    tmp = tempfile.mkdtemp()
    try:
        with zipfile.ZipFile(opts.location, "r") as zf:
            for cat in zf.namelist():
                lib.load(zf.extract(cat, tmp))
    finally:
        shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
