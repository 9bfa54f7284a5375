"""OSLO import: .len prescriptions, .olc lens-catalog records, .glc
glass catalogs, .dir catalog directories.

Behavioral parity with reference oslo.py:39-222; the command parsers
are organized as small state machines with explicit handler branches.
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


# commands that only describe apertures and are skipped, matching
# the reference's coverage (CVX, the cylinder x-curvature the
# reference drops at reference oslo.py:112, is handled below)
_OLC_SKIP = frozenset("AP APN AY1 AY2 AX1 AX2 ATP AAC".split())


def _set_cvx(surf, value):
    """CVX: x-axis curvature of a cylindrical/toric surface.  The
    biconic sag equals the OSLO toric exactly when one curvature is
    zero (a pure cylinder); a true toric (both nonzero) differs at
    6th order in the aperture -- flag it."""
    from ..elements import Biconic
    if not isinstance(surf, Biconic):
        surf.__class__ = Biconic
        surf.curvature_x = 0.
        surf.conic_x = 0.
    surf.curvature_x = value or 0.
    if surf.curvature and surf.curvature_x:
        print("toric surface imported as biconic "
              "(exact only through 4th order)")


_LEN_SKIP = frozenset(("//", "DES", "EBR", "GIH", "DLRS", "WW", "WV"))


def _lookup_glass(token, glass_map):
    token = glass_map.get(token, token)
    try:
        return Material.make(token)
    except KeyError:
        print("mat not found", token)
        return air


oslo_glass_map = {}


def olc_to_system(dat, item=None, glass_map=oslo_glass_map):
    """Parse one .olc record: semicolon-separated commands building
    surfaces incrementally (reference oslo.py:86)."""
    sys_ = System()
    surf = Spheroid()
    sys_.append(surf)
    thickness = 0.
    for chunk in dat.split(";"):
        tokens = chunk.split()
        if not tokens:
            continue
        cmd, args = tokens[0], tokens[1:]
        if cmd == "NXT":
            surf = Spheroid(material=air, distance=thickness)
            sys_.append(surf)
        elif cmd == "RD":
            roc = sfloat(args[0])
            surf.curvature = 1/roc if roc else 0
        elif cmd == "TH":
            thickness = sfloat(args[0]) or 0.
        elif cmd == "GLA":
            surf.material = _lookup_glass(args[0].upper(), glass_map)
        elif cmd == "CC":
            surf.conic = sfloat(args[0])
        elif cmd == "ASP":
            assert args[0] in ("ASR", "ARA"), args
            surf.aspherics = [0]*(int(args[1]) + 2)
        elif cmd == "CVX":
            _set_cvx(surf, sfloat(args[0]))
        elif cmd.startswith("AS"):
            surf.aspherics[int(cmd[2]) + 1] = sfloat(args[0])
        elif cmd in _OLC_SKIP:
            pass
        else:
            print("unhandled", cmd, args)
    return sys_


def len_to_system(fil, item=None):
    """Parse an OSLO .len command file (reference oslo.py:129):
    commands accumulate into a pending surface that NXT/END flush."""
    sys_ = System()
    pending = Spheroid()
    thickness = 0.
    lines = fil.splitlines() if isinstance(fil, str) else fil.readlines()
    for line in lines:
        tokens = line.split()
        if not tokens:
            continue
        cmd, args = tokens[0], tokens[1:]
        if cmd in ("NXT", "END"):
            sys_.append(pending)
            pending = Spheroid()
            pending.distance = thickness
        elif cmd == "LEN":
            sys_.description = " ".join(args[1:-2]).strip("\"")
        elif cmd == "UNI":
            sys_.scale = float(args[0])*1e-3
        elif cmd == "RD":
            pending.curvature = 1/float(args[0])
        elif cmd == "TH":
            thickness = float(args[0])
            # OSLO writes 1e20 for infinite conjugates; the
            # reference clamps at 1e2 (reference oslo.py:146),
            # mangling ordinary long gaps -- use a threshold that
            # only catches the sentinel
            if thickness > 1e10:
                thickness = np.inf
        elif cmd == "AP":
            if args[0] == "CHK":
                args = args[1:]
            pending.radius = float(args[0])
        elif cmd == "GLA":
            pending.material = Material.make(args[0])
        elif cmd == "AIR":
            pending.material = air
        elif cmd == "AST":
            pending.stop = True
            sys_.stop = len(sys_)
        elif cmd == "CVX":
            _set_cvx(pending, sfloat(args[0]))
        elif cmd in _LEN_SKIP:
            pass
        else:
            print(cmd, "not handled", args)
    return sys_


def dir_read(file, session):
    """Read an OSLO catalog directory: the .dir index, the packed .dat
    records, and optional .nam section names (reference oslo.py:39)."""
    from .library import Catalog, LibLens
    prefix = os.path.splitext(file)[0]
    cat = Catalog()
    cat.name = os.path.basename(prefix)
    cat.type, cat.source, cat.format = "lens", "oslo", "olc"
    cat.version = 0
    session.add(cat)
    # .dir columns: offset, length, elements, name, efl, dia, thick
    index = np.loadtxt(file, delimiter=",", skiprows=1,
                       dtype="i,i,i,S64,f,f,f", ndmin=1)
    packed = open("%s.dat" % prefix)
    records = [packed.read(length) for length in index["f1"]]
    sections = _read_sections("%s.nam" % prefix)
    prefix_lengths = sorted({len(k) for k in sections}, reverse=True)
    for row, data in zip(index, records):
        _, _, nelements, part, efl, dia, thick = row
        rec = LibLens(data=data)
        cat.lenses.append(rec)
        rec.name = part.decode() if isinstance(part, bytes) else part
        rec.elements = int(nelements)
        rec.thickness = float(thick)
        rec.efl = float(efl)
        rec.radius = float(dia)/2
        for k in prefix_lengths:
            if part[:k] in sections:
                rec.comment = sections[part[:k]]
                rec.section = part[:k]
                break
    return cat


def _read_sections(path):
    if not os.access(path, os.R_OK):
        return {}
    try:
        rows = np.loadtxt(path, delimiter=",", skiprows=1,
                          dtype="S64,S128", ndmin=1)
    except IndexError:
        return {}
    return {k: str(v).strip("\" '") for k, v in rows}


def glc_read(f, session):
    """Read an OSLO glass catalog: header line then one record per
    glass (reference oslo.py:169)."""
    from .library import Catalog, LibMaterial
    cat = Catalog()
    fh = open(f)
    version, count, cat.name = fh.readline().split()[:3]
    cat.version = float(version)
    cat.type, cat.source, cat.format = "material", "oslo", "glc"
    session.add(cat)
    for raw in fh:
        fields = raw.strip().split()
        if not fields:
            continue
        rec = LibMaterial(
            name=fields[0], nd=sfloat(fields[1]), vd=sfloat(fields[2]),
            density=sfloat(fields[3]), data=raw.strip())
        cat.materials.append(rec)
    return cat


_GLC_FORMULAS = ("schott sellmeier_squared_transposed conrady "
                 "unknown unknown hikari").split()


def glc_to_material(raw, item=None):
    """Parse one OSLO glass record into a CoefficientsMaterial
    (reference oslo.py:191): name nd vd density, 8 skipped slots,
    then (formula id, #coeffs, coeffs...)."""
    fields = raw.strip().split()
    name = fields[0]
    density = sfloat(fields[3])
    rest = fields[12:]
    formula_id, ncoeff = sint(rest[0]), sint(rest[1])
    coeff = np.array([sfloat(v) for v in rest[2:2 + ncoeff]])
    try:
        typ = _GLC_FORMULAS[formula_id - 1]
    except IndexError:
        typ = "unknown"
    mat = CoefficientsMaterial(name=name, coefficients=coeff, typ=typ)
    mat.density = density
    return mat


def system_to_len(system):
    """Serialize a System to OSLO .len text -- interchange export
    (beyond reference: the reference only imports).  Emits the
    command subset len_to_system reads back (LEN/UNI/RD/TH/AP/GLA/
    AIR/AST/CVX/NXT/END); conics, tilts, and mirrors have no .len
    vocabulary here and are reported dropped."""
    out = ['LEN NEW "%s" 0 %d' % (system.description,
                                  max(len(system) - 2, 0))]
    out.append("UNI %.6g" % (system.scale/1e-3))
    for k, e in enumerate(system):
        curv = getattr(e, "curvature", 0.)
        if curv:
            out.append("  RD %.17g" % (1./curv))
        cx = getattr(e, "curvature_x", None)
        if (cx is not None and cx != curv
                and not hasattr(e, "curvature_rotation")):
            out.append("  CVX %.17g" % cx)
        if getattr(e, "conic", 0.) or getattr(e, "rotated", False)                 or hasattr(e, "curvature_rotation"):
            print("surface %d: conic/tilt/toroid terms have no .len "
                  "encoding; dropped" % k)
        if np.isfinite(e.radius):
            out.append("  AP %.17g" % e.radius)
        if k == system.stop:
            out.append("  AST")
        mat = getattr(e, "material", None)
        if mat is not None:
            if str(mat) in ("basic/air", "air"):
                out.append("  AIR")
            elif getattr(mat, "mirror", False):
                print("surface %d: mirrors have no .len encoding "
                      "here; dropped" % k)
            else:
                out.append("  GLA %s" % str(mat).split("/")[-1])
        if k + 1 < len(system):
            nxt = system[k + 1].distance
            out.append("  TH %.17g"
                       % (nxt if np.isfinite(nxt) else 1e20))
            out.append("NXT")
        else:
            out.append("END")
    return "\n".join(out) + "\n"
