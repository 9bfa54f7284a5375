"""OSLO import: .len prescriptions, .olc lens-catalog records, .glc
glass catalogs, .dir catalog directories.

Behavioral parity with reference oslo.py:39-222.
"""

import os.path

import numpy as np

from ..utils.math import sfloat, sint
from ..elements import Spheroid
from ..system import System
from ..materials import air, Material, CoefficientsMaterial


def register_parsers():
    from .library import Catalog, LibMaterial, LibLens
    Catalog.parsers[".dir"] = dir_read
    Catalog.parsers[".glc"] = glc_read
    LibLens.parsers["len"] = len_to_system
    LibLens.parsers["olc"] = olc_to_system
    LibMaterial.parsers["glc"] = glc_to_material


def dir_read(file, session):
    """Read an OSLO catalog directory (.dir + .dat [+ .nam])
    (reference oslo.py:39)."""
    from .library import Catalog, LibLens
    cat = Catalog()
    prefix = os.path.splitext(file)[0]
    cat.name = os.path.basename(prefix)
    cat.type, cat.source, cat.format = "lens", "oslo", "olc"
    cat.version = 0
    session.add(cat)
    # columns: offset, length, elements, name, efl, diameter, thickness
    dirdat = np.loadtxt(file, delimiter=",", skiprows=1,
                        dtype="i,i,i,S64,f,f,f", ndmin=1)
    lensfile = open("%s.dat" % prefix)
    lenses = [lensfile.read(i) for i in dirdat["f1"]]
    sections = {}
    sect_lens = []
    if os.access("%s.nam" % prefix, os.R_OK):
        try:
            name = np.loadtxt("%s.nam" % prefix, delimiter=",",
                              skiprows=1, dtype="S64,S128", ndmin=1)
            for k, n in name:
                sect_lens.append(len(k))
                sections[k] = str(n).strip("\" '")
        except IndexError:
            pass
    sect_lens = sorted(sect_lens)[::-1]
    for dirline, lensdat in zip(dirdat, lenses):
        of, le, ele, part, efl, dia, thick = dirline
        rec = LibLens(data=lensdat)
        cat.lenses.append(rec)
        rec.name = part.decode() if isinstance(part, bytes) else part
        rec.elements = int(ele)
        rec.thickness = float(thick)
        rec.efl = float(efl)
        rec.radius = float(dia)/2
        for k in sect_lens:
            try:
                rec.comment = sections[part[:k]]
                rec.section = part[:k]
                break
            except KeyError:
                continue
    return cat


oslo_glass_map = {}


def olc_to_system(dat, item=None, glass_map=oslo_glass_map):
    """Parse an .olc record (semicolon-separated commands)
    (reference oslo.py:86)."""
    sys = System()
    s = Spheroid()
    sys.append(s)
    th = 0.
    for cmd in dat.split(";"):
        cmd = cmd.strip()
        if not cmd:
            continue
        args = cmd.split()
        cmd, args = args[0], args[1:]
        if cmd == "RD":
            r = sfloat(args[0])
            s.curvature = 1/r if r else 0
        elif cmd == "GLA":
            mat = args[0].upper()
            mat = glass_map.get(mat, mat)
            try:
                mat = Material.make(mat)
            except KeyError:
                print("mat not found", cmd, args)
                mat = air
            s.material = mat
        elif cmd == "TH":
            th = sfloat(args[0]) or 0.
        elif cmd in "AP CVX APN AY1 AY2 AX1 AX2 ATP AAC".split():
            pass  # cylindrical/aperture detail, ignored as in reference
        elif cmd == "CC":
            s.conic = sfloat(args[0])
        elif cmd == "ASP":
            assert args[0] in ("ASR", "ARA"), args
            s.aspherics = [0]*(int(args[1]) + 2)
        elif cmd[:2] == "AS":
            i = int(cmd[2]) + 1
            s.aspherics[i] = sfloat(args[0])
        elif cmd == "NXT":
            s = Spheroid(material=air, distance=th)
            sys.append(s)
        else:
            print("unhandled", cmd, args)
    return sys


def len_to_system(fil, item=None):
    """Parse an OSLO .len command file (reference oslo.py:129)."""
    s = System()
    e = Spheroid()
    th = 0.
    if isinstance(fil, str):
        lines = fil.splitlines()
    else:
        lines = fil.readlines()
    for line in lines:
        p = line.split()
        if not p:
            continue
        cmd, args = p[0], p[1:]
        if cmd == "LEN":
            s.description = " ".join(args[1:-2]).strip("\"")
        elif cmd == "UNI":
            s.scale = float(args[0])*1e-3
        elif cmd == "AIR":
            e.material = air
        elif cmd == "TH":
            th = float(args[0])
            if th > 1e2:
                th = np.inf
        elif cmd == "AP":
            if args[0] == "CHK":
                del args[0]
            e.radius = float(args[0])
        elif cmd == "GLA":
            e.material = Material.make(args[0])
        elif cmd == "AST":
            e.stop = True
            s.stop = len(s)
        elif cmd == "RD":
            e.curvature = 1/float(args[0])
        elif cmd in ("NXT", "END"):
            s.append(e)
            e = Spheroid()
            e.distance = th
        elif cmd in ("//", "DES", "EBR", "GIH", "DLRS", "WW", "WV"):
            pass
        else:
            print(cmd, "not handled", args)
    return s


def glc_read(f, session):
    """Read an OSLO glass catalog (reference oslo.py:169)."""
    from .library import Catalog, LibMaterial
    cat = Catalog()
    fh = open(f)
    ver, num, cat.name = fh.readline().split()[:3]
    cat.version = float(ver)
    cat.type, cat.source, cat.format = "material", "oslo", "glc"
    session.add(cat)
    for raw in fh:
        line = raw.strip().split()
        if not line:
            continue
        g = LibMaterial()
        g.name = line.pop(0)
        g.nd = sfloat(line.pop(0))
        g.vd = sfloat(line.pop(0))
        g.density = sfloat(line.pop(0))
        g.data = raw.strip()
        cat.materials.append(g)
    return cat


def glc_to_material(raw, item=None):
    """Parse one OSLO glass record (reference oslo.py:191)."""
    line = raw.strip().split()
    name = line.pop(0)
    sfloat(line.pop(0))  # nd
    sfloat(line.pop(0))  # vd
    density = sfloat(line.pop(0))
    del line[:6]
    del line[:2]
    a, num = sint(line.pop(0)), sint(line.pop(0))
    coeff = np.array([sfloat(v) for v in line[:num]])
    del line[:num]
    try:
        typ = ("schott sellmeier_squared_transposed conrady "
               "unknown unknown hikari").split()[a - 1]
    except IndexError:
        typ = "unknown"
    mat = CoefficientsMaterial(name=name, coefficients=coeff, typ=typ)
    mat.density = density
    return mat
