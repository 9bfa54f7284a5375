"""Code V import: XML glass catalogs (reference codev.py:32-67) and
.seq lens-sequence files (beyond the reference, which covers only the
glass catalogs).

The XML element paths, the equation-name mapping, and the .seq command
vocabulary are dictated by the formats; records are built
declaratively from the parsed tree / command stream.
"""

import re

import xml.etree.ElementTree as et

import numpy as np

from ..materials import CoefficientsMaterial, Material, AbbeMaterial, air


def register_parsers():
    from .library import Catalog, LibMaterial, LibLens
    Catalog.parsers[".xml"] = codevxml_read
    Catalog.parsers[".seq"] = seq_read
    LibMaterial.parsers["codev"] = codevxml_to_material
    LibLens.parsers["seq"] = seq_to_system


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


# -- .seq lens sequences ------------------------------------------------

#: DIM argument -> System.scale (metres per lens unit); Code V 'M'
#: means millimetres
_SEQ_SCALES = {"M": 1e-3, "MM": 1e-3, "C": 1e-2, "CM": 1e-2,
               "I": 25.4e-3, "IN": 25.4e-3}

#: object thickness at least this large is an infinite conjugate
_SEQ_INFINITE = 1e8

#: asphere letter -> even-aspheric index (A multiplies r**4 ->
#: aspherics[1]; the r**2 slot is index 0)
_SEQ_ASP = {letter: i + 1 for i, letter in enumerate("ABCDEFGHIJ")}

#: commands consumed but deliberately without effect (solves, variable
#: codes, tolerances, apertures beyond CIR, render/plot state)
_SEQ_IGNORED = set("""
PIM RDM CCY THC GLC CUY SLB DRW EDC COC CCR THR NRD DAR WTW INI XOB
YOB ZOB WTF VUX VUY VLX VLY POL CA FNO NAO RMD DER XIM YIM ZIM
""".split())


def _seq_material(token):
    """Resolve a Code V glass token: NAME_CATALOG, a bare name, a
    fictitious nnn.nnn code (nd = 1.nnn, vd = nn.n), or AIR."""
    token = token.strip()
    if not token or token.upper() == "AIR":
        return air
    if token.upper() in ("REFL", "MIRROR"):
        return Material.make("mirror")
    m = re.fullmatch(r"(\d{3})\.(\d{3})", token)
    if m:
        return AbbeMaterial(n=1 + float(m.group(1))/1000,
                            v=float(m.group(2))/10)
    name, _, catalog = token.partition("_")
    tries = [f"{catalog}/{name}"] if catalog else []
    tries.append(name)
    if catalog and name[:1].upper() == "N" and "-" not in name:
        tries.append(f"{catalog}/N-{name[1:]}")
    for t in tries:
        try:
            return Material.make(t)
        except KeyError:
            continue
    print("material not found", token)
    return air


def _axis_toward(v):
    """Minimal proper rotation A (global->local) whose local z axis
    points along v: A.T @ ez == v/|v|."""
    from ..utils.geometry import rotation_matrix
    v = np.asarray(v, dtype=float)
    v = v/np.linalg.norm(v)
    ez = np.array([0., 0., 1.])
    c = float(ez @ v)
    axis = np.cross(ez, v)
    norm = np.linalg.norm(axis)
    if norm < 1e-15:
        if c > 0:
            return np.eye(3)
        return np.diag([1., -1., -1.])   # 180deg about x
    ang = np.arctan2(norm, c)
    r = rotation_matrix(ang, axis/norm)
    # rotation_matrix gives an active rotation carrying ez onto v:
    # as a frame it is local->global, so the global->local map is r.T
    a = r.T if np.allclose(r.T.T @ ez, v, atol=1e-12) else r
    assert np.allclose(a.T @ ez, v, atol=1e-10), (a.T @ ez, v)
    return a


def _fold_seq_frames(system):
    """Convert per-surface Code V decenters/tilts (XDE/YDE/ZDE,
    ADE/BDE/CDE, DAR, BEN) into global per-surface poses: a plain
    decenter/tilt re-aims the axis for every following surface
    (thicknesses run along the new z), DAR restores the original
    frame after the surface (decenter-and-return), and BEN on a
    tilted mirror bends the axis along the reflected direction
    (subsequent thicknesses are negative, per Code V's mirror-space
    convention)."""
    from ..elements import set_pose
    from ..utils.geometry import euler_matrix

    axis = np.eye(3)
    carry = np.zeros(3)
    sign = 1.
    for e in system:
        dec = getattr(e, "_seq_dec", None)
        tilt = getattr(e, "_seq_tilt", None)
        dar = getattr(e, "_seq_dar", False)
        ben = getattr(e, "_seq_ben", False)
        off = axis.T @ np.array([0., 0., e.distance]) + carry
        carry = np.zeros(3)
        a_prev = axis
        a_surf = axis
        if tilt is not None:
            rb = euler_matrix(*np.deg2rad(tilt), axes="rxyz")
            a_surf = rb.T @ a_prev
        d = np.zeros(3)
        if dec is not None:
            d = a_prev.T @ np.asarray(dec, dtype=float)
            off = off + d
        if not (np.allclose(a_surf, np.eye(3)) and
                np.allclose(off[:2], 0.) and
                np.allclose(a_prev, np.eye(3))):
            set_pose(e, off, a_surf)
        if ben:
            # reflect the propagation direction at the tilted mirror
            d_in = sign*(a_prev.T @ np.array([0., 0., 1.]))
            nrm = a_surf.T @ np.array([0., 0., 1.])
            d_out = d_in - 2*(d_in @ nrm)*nrm
            sign = -sign
            # the next (sign-flipped) thickness must advance along
            # d_out: local z points along sign*d_out
            axis = _axis_toward(sign*d_out)
        elif dar:
            carry = -d
        else:
            axis = a_surf
        for attr in ("_seq_dec", "_seq_tilt", "_seq_dar", "_seq_ben"):
            if hasattr(e, attr):
                delattr(e, attr)


def seq_to_system(data, item=None):
    """Parse a Code V .seq lens sequence into a System.

    Covers the interchange core of the format: LEN/TI/DIM/EPD/WL/REF,
    XAN/YAN field angles, SO/S/SI surface rows (radius, thickness,
    glass), STO stop marker, K conics and A..J even-asphere
    coefficients (r**4 ... r**22), CIR clear apertures, and
    decenters/tilts (XDE/YDE/ZDE, ADE/BDE/CDE, DAR and BEN mirror
    bends -- folded into per-surface global poses).  Solves, zoom,
    and tolerance commands are ignored with a notice.
    system_to_seq is the matching writer.
    """
    from ..elements import Spheroid
    from ..system import System
    from ..conjugates import InfiniteConjugate, FiniteConjugate

    system = System()
    fields_deg = None
    epd = None
    ref = None
    object_thickness = None

    def surface():
        return system[-1]

    def add_surface(args, is_object=False):
        vals = args.split()
        roc = float(vals[0]) if vals else 0.
        thick = float(vals[1]) if len(vals) > 1 else 0.
        mat = _seq_material(vals[2]) if len(vals) > 2 else air
        e = Spheroid(curvature=1/roc if roc else 0., material=mat)
        system.append(e)
        return thick

    pending = 0.
    done = False
    for line in data.splitlines():
        if done:
            break
        line = line.split("!", 1)[0]
        for chunk in line.split(";"):
            chunk = chunk.strip()
            if not chunk:
                continue
            cmd, _, args = chunk.partition(" ")
            cmd = cmd.upper()
            args = args.strip()
            if cmd == "LEN":
                continue
            elif cmd in ("TI", "TITLE"):
                system.description = args.strip("'\"")
            elif cmd == "DIM":
                system.scale = _SEQ_SCALES[args.split()[0].upper()]
            elif cmd == "EPD":
                epd = float(args.split()[0])
            elif cmd == "WL":
                system.wavelengths = [float(v)*1e-9
                                      for v in args.split()]
            elif cmd == "REF":
                ref = int(args.split()[0])
            elif cmd in ("YAN", "XAN"):
                vals = [float(v) for v in args.split()]
                if fields_deg is None or (max(map(abs, vals))
                                          > max(map(abs, fields_deg))):
                    fields_deg = vals
            elif cmd == "SO":
                object_thickness = add_surface(args, is_object=True)
                pending = object_thickness
            elif cmd == "S":
                thick = add_surface(args)
                surface().distance = pending
                pending = thick
            elif cmd == "SI":
                add_surface(args)
                surface().distance = pending
                pending = 0.
            elif cmd == "STO":
                system.stop = len(system) - 1
            elif cmd == "K":
                surface().conic = float(args.split()[0])
            elif cmd == "ASP":
                continue
            elif cmd == "CON":
                continue
            elif cmd == "CIR":
                surface().radius = float(args.split()[0])
            elif cmd in ("XDE", "YDE", "ZDE"):
                e = surface()
                if getattr(e, "_seq_dec", None) is None:
                    e._seq_dec = [0., 0., 0.]
                e._seq_dec["XYZ".index(cmd[0])] = float(args.split()[0])
            elif cmd in ("ADE", "BDE", "CDE"):
                e = surface()
                if getattr(e, "_seq_tilt", None) is None:
                    e._seq_tilt = [0., 0., 0.]
                e._seq_tilt["ABC".index(cmd[0])] = float(args.split()[0])
            elif cmd == "DAR":
                surface()._seq_dar = True
            elif cmd == "BEN":
                surface()._seq_ben = True
            elif cmd in _SEQ_ASP and args:
                e = surface()
                idx = _SEQ_ASP[cmd]
                if e.aspherics is None:
                    e.aspherics = []
                while len(e.aspherics) <= idx:
                    e.aspherics.append(0.)
                e.aspherics[idx] = float(args.split()[0])
            elif cmd == "GO":
                # end of the lens definition: anything after GO is
                # analysis/edit state, not prescription
                done = True
                break
            elif cmd not in _SEQ_IGNORED:
                print(cmd, "not handled", args)

    if ref and system.wavelengths and ref <= len(system.wavelengths):
        wl = list(system.wavelengths)
        system.wavelengths = [wl.pop(ref - 1)] + wl
    angle_max = max(map(abs, fields_deg)) if fields_deg else 0.
    if object_thickness is None or object_thickness >= _SEQ_INFINITE:
        system.object = InfiniteConjugate(
            angle_deg=angle_max, pupil=system.object.pupil)
        if len(system) > 1:
            system[1].distance = 0.
    else:
        system.object = FiniteConjugate(pupil=system.object.pupil)
    if fields_deg and angle_max:
        system.fields = sorted(abs(v)/angle_max for v in fields_deg)
    if epd:
        system.object.pupil.radius = epd/2
        system.object.pupil.update_radius = False
    if any(getattr(e, "_seq_dec", None) is not None
           or getattr(e, "_seq_tilt", None) is not None
           or getattr(e, "_seq_ben", False)
           for e in system):
        _fold_seq_frames(system)
    return system


def _seq_glass_token(mat):
    """Inverse of _seq_material for the writer: named glasses as
    NAME_CATALOG, mirrors as REFL, unnamed materials as the
    fictitious nnn.nnn code (3-digit nd/vd -- lossy by design, like
    Code V's own fictitious glasses)."""
    if mat is None or str(mat) in ("basic/air", "air"):
        return ""
    if getattr(mat, "mirror", False):
        return "REFL"
    name = getattr(mat, "name", None) or ""
    catalog = getattr(mat, "catalog", None)
    if name and name != "-":
        token = name.upper().replace("-", "")
        if catalog:
            # NAME_CATALOG; the importer re-splits on the underscore
            token += "_" + str(catalog).upper().split("-")[0]
        return token
    try:
        nd, vd = float(mat.nd), float(mat.vd)
    except Exception:
        nd, vd = 1.5, 50.
    if not np.isfinite(vd) or vd <= 0 or vd >= 100:
        vd = 99.9
    if not 1. <= nd < 2.:
        # the nnn.nnn code carries only 1.000..1.999: IR glasses
        # (Si, Ge, ZnSe) cannot round-trip; clamp loudly rather than
        # emit a 4-digit field the importer rejects as 'not found'
        print("seq: nd %.4g outside the fictitious-code range "
              "[1, 2); clamped" % nd)
        nd = min(max(nd, 1.), 1.999)
    return "%03d.%03d" % (round((nd - 1)*1000), round(vd*10))


def system_to_seq(system):
    """Export a System as a Code V .seq sequence (beyond reference --
    rayopt only imports Code V glass catalogs).

    Writes the same interchange core seq_to_system reads: LEN/TI/DIM/
    EPD/WL/REF, YAN field angles, SO/S/SI rows with glass tokens, STO,
    K conics, A..J even-asphere coefficients, CIR apertures.  Tilted/
    decentered elements and non-Spheroid figure types are not
    representable in this subset and are dropped with a notice;
    unnamed materials become fictitious nnn.nnn codes (3-digit
    precision, Code V's own convention)."""
    out = ["LEN"]
    if getattr(system, "description", ""):
        out.append("TI '%s'" % system.description)
    dim = {1e-3: "MM", 1e-2: "CM", 1.: "M", 25.4e-3: "IN"}.get(
        system.scale)
    if dim is None:
        print("seq: nonstandard scale %g exported as MM"
              % system.scale)
        dim = "MM"
    out.append("DIM %s" % dim)
    prad = getattr(system.object.pupil, "radius", np.inf)
    if np.isfinite(prad) and prad:
        out.append("EPD %.17g" % (2.*prad))
    if system.wavelengths:
        out.append("WL " + " ".join("%.6g" % (w*1e9)
                                    for w in system.wavelengths))
        out.append("REF 1")
    angle = np.rad2deg(getattr(system.object, "angle", 0.))
    if angle:
        fields = list(getattr(system, "fields", None) or [1.])
        out.append("YAN " + " ".join("%.9g" % (f*angle)
                                     for f in fields))
    for j, e in enumerate(system):
        c = getattr(e, "curvature", 0.)
        roc = 1./c if c else 0.
        nxt = system[j + 1] if j + 1 < len(system) else None
        thick = float(nxt.distance) if nxt is not None else 0.
        if j == 0:
            if system.object.finite:
                # finite conjugate: the object gap is the first row's
                # distance, emitted as the SO thickness
                pass
            else:
                if nxt is not None and nxt.distance:
                    print("seq: front gap %.6g before the first "
                          "surface of an infinite-object system is a "
                          "pure z-translation; dropped" % nxt.distance)
                thick = 1e10   # infinite object (importer: >= 1e8)
            out.append("SO %.17g %.17g" % (roc, thick))
            continue
        token = _seq_glass_token(getattr(e, "material", None))
        row = "SI" if j == len(system) - 1 else "S"
        out.append(("%s %.17g %.17g %s"
                    % (row, roc, thick, token)).rstrip())
        if j == system.stop:
            out.append("STO")
        if getattr(e, "conic", 0.):
            out.append("K %.17g" % e.conic)
        asp = getattr(e, "aspherics", None) or ()
        for i, v in enumerate(asp):
            if not v:
                continue
            if i == 0 or i > 10:
                print("seq: aspheric r^%d term not representable; "
                      "dropped" % (2*i + 2))
                continue
            out.append("%s %.17g" % ("ABCDEFGHIJ"[i - 1], v))
        if getattr(e, "aspherics_odd", None):
            print("seq: odd aspherics dropped on export")
        if e.rotated or e.offset[0] or e.offset[1]:
            print("seq: surface %d tilt/decenter dropped on export"
                  % j)
        if np.isfinite(e.radius) and e.radius:
            out.append("CIR %.17g" % e.radius)
    out.append("GO")
    return "\n".join(out) + "\n"


def seq_read(file, session):
    """Wrap one .seq file as a single-lens catalog row."""
    import os
    from .library import Catalog, LibLens
    cat = Catalog()
    data = cat.load(file)
    cat.name = os.path.splitext(os.path.basename(file))[0]
    cat.type, cat.source, cat.format = "lens", "codev", "seq"
    cat.version = 0
    session.add(cat)
    rec = LibLens()
    rec.name = cat.name
    rec.data = data if isinstance(data, str) else data.decode("latin1")
    m = re.search(r"(?:TI|TITLE)\s+'([^']*)'", rec.data)
    if m:
        rec.comment = m.group(1)
    cat.lenses.append(rec)
    return cat


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
