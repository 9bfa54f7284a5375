"""Code V XML glass catalogs (reference codev.py:32-67).

The XML element paths and the equation-name mapping are dictated by
the format; records are built declaratively from the parsed tree.
"""

import xml.etree.ElementTree as et

import numpy as np

from ..materials import CoefficientsMaterial


def register_parsers():
    from .library import Catalog, LibMaterial
    Catalog.parsers[".xml"] = codevxml_read
    LibMaterial.parsers["codev"] = codevxml_to_material


def _text(node, path):
    return node.find(path).text


def codevxml_read(file, session):
    from .library import Catalog, LibMaterial
    cat = Catalog()
    root = et.fromstring(cat.load(file))
    cat.type, cat.source, cat.format = "material", "codev", "codev"
    cat.name = _text(root, "./Name")
    cat.comment = prefix = _text(root, "./ID")
    session.add(cat)
    for glass in root.iterfind("./Glasses/Glass"):
        full_name = _text(glass, "./GlassName")
        assert full_name.startswith(prefix), (prefix, full_name)
        cat.materials.append(LibMaterial(
            name=full_name[len(prefix):],
            comment=_text(glass, "./NumericName"),
            status=int(_text(glass, "./Availability")),
            data=et.tostring(glass).decode()))
    return cat


#: Code V equation names -> dispersion formula names
_EQ_MAP = {
    "Standard Sellmeier": "sellmeier",
    "Glass Manufacturer Sellmeier": "sellmeier_squared_offset",
    "Laurent": "schott",
    "Glass Manufacturer Laurent": "schott",
    "Herzberger": "herzberger",
    "Cauchy": "conrady",
}


def codevxml_to_material(data, item=None):
    node = et.fromstring(data)
    coeffs = [float(c.text) for c in node.iterfind(
        "./DispersionCoefficients/Coefficient")]
    mat = CoefficientsMaterial(coefficients=np.asarray(coeffs))
    mat.typ = _EQ_MAP[_text(node, "./EquationType")]
    mat.name = _text(node, "./GlassName")[2:]
    return mat


def _load_tree(lib, location):
    """Import every catalog file under a directory or zip archive."""
    import os
    import shutil
    import tempfile
    import zipfile

    if os.path.isdir(location):
        for name in sorted(os.listdir(location)):
            lib.load(os.path.join(location, name))
        return
    scratch = tempfile.mkdtemp()
    try:
        with zipfile.ZipFile(location, "r") as archive:
            for member in archive.namelist():
                lib.load(archive.extract(member, scratch))
    finally:
        shutil.rmtree(scratch)


def main(argv=None):
    """CLI: import Code V XML glass catalogs from a zip or directory."""
    import argparse
    from .library import Library

    parser = argparse.ArgumentParser()
    parser.add_argument("location", help="zip file or directory of "
                        "glass-catalog XML files")
    parser.add_argument("-d", "--db", default=None)
    opts = parser.parse_args(argv)
    _load_tree(Library(opts.db), opts.location)


if __name__ == "__main__":
    main()
