"""Zemax import: .zmx lens prescriptions, .agf glass catalogs, .zmf
binary lens catalogs.

Behavioral parity with reference zemax.py:40-269 (command coverage,
the XOR de-obfuscation of .zmf descriptions, the 13-entry AGF
dispersion-formula map, UTF-16 BOM handling).
"""

import codecs
import os
import struct

import numpy as np

from ..utils.math import sfloat, sint
from ..materials import Material, air, CoefficientsMaterial, Thermal
from ..elements import Spheroid
from ..system import System


def register_parsers():
    from .library import Catalog, LibMaterial, LibLens
    Catalog.parsers[".zmf"] = zmf_read
    Catalog.parsers[".agf"] = agf_read
    LibLens.parsers["zmx"] = zmx_to_system
    LibMaterial.parsers["agf"] = agf_to_material


def zmf_obfuscate(data, a, b):
    """Undo the .zmf description obfuscation (XOR keystream derived
    from efl/enp, reference zemax.py:79)."""
    iv = np.cos(6*a + 3*b)
    iv = np.cos(655*(np.pi/180)*iv) + iv
    p = np.arange(len(data))
    k = 13.2*(iv + np.sin(17*(p + 3)))*(p + 1)
    k = (int(f"{v:.8e}"[4:7]) for v in k)
    data = np.frombuffer(data, np.uint8).copy()
    key = np.fromiter(k, np.int64, len(data)).astype(np.uint8)
    data ^= key
    return data.tobytes()


def zmf_read(file, session):
    """Read a Zemax binary lens catalog into the library
    (reference zemax.py:40)."""
    from .library import Catalog, LibLens
    cat = Catalog()
    cat.load(file)
    cat.name = os.path.splitext(os.path.basename(file))[0]
    cat.type, cat.source, cat.format = "lens", "zemax", "zmx"
    head = struct.Struct("<I")
    lens = struct.Struct("<100sIIIIIIIdd")
    shapes = "?EBPM"
    f = open(file, "rb")
    cat.version, = head.unpack(f.read(head.size))
    assert cat.version in (1001,)
    session.add(cat)
    while True:
        li = f.read(lens.size)
        if len(li) != lens.size:
            break
        li = list(lens.unpack(li))
        rec = LibLens()
        rec.name = li[0].decode("latin1").strip("\0")
        rec.version = li[1]
        rec.elements = li[2]
        rec.shape = shapes[li[3]]
        rec.aspheric = li[4]
        rec.grin = li[5]
        rec.toroidal = li[6]
        rec.efl = li[8]
        rec.enp = li[9]
        description = f.read(li[7])
        assert len(description) == li[7]
        description = zmf_obfuscate(description, rec.efl, rec.enp)
        description = description.decode("latin1")
        assert description.startswith(f"VERS {rec.version:06d}\n")
        rec.data = description
        cat.lenses.append(rec)
    return cat


_ZMX_IGNORED = set("""
GCAT OPDX RAIM CONF ENPD PUPD EFFL VERS MODE NOTE TYPE HIDE MIRR SQAP
XDAT YDAT OBNA PKUP MAZH CLAP PPAR VPAR EDGE VCON UDAD USAP TOLE PFIL
TCED FNUM TOL MNUM MOFF FTYP SDMA GFAC PUSH PICB ROPD PWAV POLS GLRS
BLNK COFN NSCD GSTD DMFS ISNA VDSZ ENVD ZVDX ZVDY ZVCX ZVCY ZVAN XFLN
YFLN VDXN VDYN VCXN VCYN VANN FWGT FWGN WWGT WWGN WAVN WAVM XFLD YFLD
MNCA MNEA MNCG MNEG MXCA MXCG RGLA TRAC FLAP TCMM FLOA PMAG TOTR SLAB
POPS COMM PZUP LANG FIMP
""".split())


def zmx_to_system(data, item=None):
    """Parse a .zmx prescription into a System
    (reference zemax.py:90; command coverage identical, with the STOP
    command additionally wired to System.stop)."""
    s = System()
    next_pos = 0.
    s.append(Spheroid(material=air))
    for line in data.splitlines():
        e = s[-1]
        if not line.strip():
            continue
        line = line.strip().split(" ", 1)
        cmd = line[0]
        args = line[1] if len(line) == 2 else ""
        if cmd == "UNIT":
            s.scale = {"MM": 1e-3, "INCH": 25.4e-3,
                       "IN": 25.4e-3}[args.split()[0]]
        elif cmd == "NAME":
            s.description = args.strip("\"")
        elif cmd == "SURF":
            s.append(Spheroid(distance=next_pos, material=air))
        elif cmd == "CURV":
            e.curvature = float(args.split()[0])
        elif cmd == "DISZ":
            next_pos = float(args)
        elif cmd == "GLAS":
            args = args.split()
            name = args[0]
            try:
                e.material = Material.make(name)
            except KeyError:
                try:
                    e.material = Material.make((float(args[3]),
                                                float(args[4])))
                except Exception as exc:
                    print("material not found", name, exc)
        elif cmd == "DIAM":
            e.radius = float(args.split()[0])
        elif cmd == "STOP":
            e.stop = True
            s.stop = len(s) - 1
        elif cmd == "WAVL":
            s.wavelengths = [float(i)*1e-6 for i in args.split() if i]
        elif cmd == "COAT":
            e.coating = args.split()[0]
        elif cmd == "CONI":
            e.conic = float(args.split()[0])
        elif cmd == "PARM":
            i, j = args.split()
            i = int(i) - 1
            j = float(j)
            if i < 0:
                if j:
                    print("aspheric 0 degree not supported", cmd, args)
                continue
            if e.aspherics is None:
                e.aspherics = []
            while len(e.aspherics) <= i:
                e.aspherics.append(0.)
            e.aspherics[i] = j
        elif cmd in _ZMX_IGNORED:
            pass
        else:
            print(cmd, "not handled", args)
    return s


def agf_read(fil, session):
    """Read a Zemax glass catalog (.agf) into the library
    (reference zemax.py:186)."""
    from .library import Catalog, LibMaterial
    cat = Catalog()
    cat.load(fil)
    cat.name = os.path.splitext(os.path.basename(fil))[0]
    cat.type, cat.source, cat.format = "material", "zemax", "agf"
    cat.version = 0
    session.add(cat)
    raw = open(fil, "rb").read(32)
    if raw.startswith(codecs.BOM_UTF16):
        dat = open(fil, encoding="utf-16")
    else:
        dat = open(fil, encoding="latin1")
    mat = None
    for line in dat:
        if not line.strip() or line.startswith("!"):
            continue
        cmd, args = line.split(" ", 1)
        if cmd == "CC":
            continue
        if cmd == "NM":
            mat = LibMaterial()
            cat.materials.append(mat)
            args = args.split()
            mat.name = args[0]
            mat.nd = sfloat(args[3])
            mat.vd = sfloat(args[4])
            mat.code = args[2]
            if len(args) >= 7:
                mat.status = sint(args[6])
            mat.data = ""
        elif cmd == "GC":
            mat.comment = args
        elif cmd == "ED":
            args = args.split()
            mat.tce = sfloat(args[0])
            mat.density = sfloat(args[2])
        if mat is not None:
            mat.data += line
    return cat


_AGF_TYPES = ("schott sellmeier_squared herzberger sellmeier2 conrady "
              "sellmeier_squared handbook_of_optics1 handbook_of_optics2 "
              "sellmeier_squared_offset extended1 sellmeier5 extended2 "
              "hikari").split()


def agf_to_material(dat, item=None):
    """Parse one AGF record into a CoefficientsMaterial
    (reference zemax.py:230)."""
    g = CoefficientsMaterial(coefficients=[])
    for line in dat.splitlines():
        if not line:
            continue
        cmd, args = line[:2], line[3:]
        if cmd == "NM":
            args = args.split()
            g.typ = _AGF_TYPES[int(float(args[1])) - 1]
            g.glasscode = sfloat(args[2])
            g.name = args[0]
        elif cmd == "GC":
            g.comment = args.strip()
        elif cmd == "ED":
            args = list(map(sfloat, args.split()))
            g.alpham3070, g.alpha20300, g.density = args[0:3]
        elif cmd == "CD":
            g.coefficients = np.array([sfloat(v) for v in args.split()])
        elif cmd == "TD":
            v = [sfloat(x) for x in args.split()]
            g.thermal = Thermal(v[:3], v[3:5], *v[5:])
        elif cmd == "OD":
            g.chemical = list(map(sfloat, args[1:]))
            g.price = sfloat(args[0])
        elif cmd == "LD":
            g.lambda_min = sfloat(args[0])
            g.lambda_max = sfloat(args[1])
        elif cmd == "IT":
            v = list(map(sfloat, args.split()))
            if not hasattr(g, "transmission"):
                g.transmission = {}
            g.transmission[(v[0], tuple(v[2:]))] = v[1]
        else:
            print(cmd, args, "not handled")
    return g
