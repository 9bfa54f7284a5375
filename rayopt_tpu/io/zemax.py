"""Zemax import: .zmx lens prescriptions, .agf glass catalogs, .zmf
binary lens catalogs.

Behavioral parity with reference zemax.py:40-269 (command coverage,
the XOR de-obfuscation of .zmf descriptions, the 13-entry AGF
dispersion-formula map, UTF-16 BOM handling).  The line formats and
command vocabulary are dictated by the file formats; parsing here is
organized as per-command handler registries dispatched over a small
parse context.
"""

import codecs
import os
import struct

import numpy as np

from ..utils.math import sfloat, sint
from ..utils.geometry import euler_matrix
from ..materials import Material, air, CoefficientsMaterial, Thermal
from ..elements import Spheroid, set_pose
from ..system import System


def register_parsers():
    from .library import Catalog, LibMaterial, LibLens
    Catalog.parsers[".zmf"] = zmf_read
    Catalog.parsers[".agf"] = agf_read
    LibLens.parsers["zmx"] = zmx_to_system
    LibMaterial.parsers["agf"] = agf_to_material


def _registry():
    table = {}

    def bind(*names):
        def reg(fn):
            for name in names:
                table[name] = fn
            return fn
        return reg

    return table, bind


# -- .zmf binary lens catalogs -------------------------------------------

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


#: fixed 132-byte .zmf lens header (reference zemax.py:47)
_ZMF_HEAD = struct.Struct("<I")
_ZMF_LENS = struct.Struct("<100sIIIIIIIdd")
_ZMF_FIELDS = ("name", "version", "elements", "shape", "aspheric",
               "grin", "toroidal", "_desclen", "efl", "enp")
_ZMF_SHAPES = "?EBPM"


def zmf_read(file, session):
    """Read a Zemax binary lens catalog into the library
    (reference zemax.py:40)."""
    from .library import Catalog, LibLens
    cat = Catalog()
    cat.load(file)
    cat.name = os.path.splitext(os.path.basename(file))[0]
    cat.type, cat.source, cat.format = "lens", "zemax", "zmx"
    with open(file, "rb") as f:
        cat.version, = _ZMF_HEAD.unpack(f.read(_ZMF_HEAD.size))
        assert cat.version in (1001,)
        session.add(cat)
        while True:
            raw = f.read(_ZMF_LENS.size)
            if len(raw) != _ZMF_LENS.size:
                break
            rec = LibLens()
            fields = dict(zip(_ZMF_FIELDS, _ZMF_LENS.unpack(raw)))
            desclen = fields.pop("_desclen")
            fields["name"] = fields["name"].decode("latin1").strip("\0")
            fields["shape"] = _ZMF_SHAPES[fields["shape"]]
            for key, val in fields.items():
                setattr(rec, key, val)
            description = f.read(desclen)
            assert len(description) == desclen
            description = zmf_obfuscate(description, rec.efl, rec.enp)
            description = description.decode("latin1")
            assert description.startswith(f"VERS {rec.version:06d}\n")
            rec.data = description
            cat.lenses.append(rec)
    return cat


# -- .zmx prescriptions -----------------------------------------------

_ZMX_IGNORED = set("""
GCAT OPDX CONF PUPD EFFL VERS MODE NOTE HIDE MIRR SQAP
YDAT OBNA PKUP MAZH CLAP PPAR VPAR EDGE VCON UDAD USAP TOLE PFIL
TCED FNUM TOL MOFF SDMA GFAC PUSH PICB ROPD PWAV POLS GLRS
BLNK COFN NSCD GSTD DMFS ISNA VDSZ ENVD ZVDX ZVDY ZVCX ZVCY ZVAN
VDXN VDYN VCXN VCYN VANN FWGT FWGN WWGT WWGN WAVN WAVM XFLD YFLD
MNCA MNEA MNCG MNEG MXCA MXCG RGLA TRAC FLAP TCMM FLOA PMAG TOTR SLAB
POPS COMM PZUP LANG FIMP
""".split())

#: multi-configuration (MCE) operand opcodes mapped to System
#: configuration write specs (the reference ignores the whole MCE
#: section, reference zemax.py:168)
_MCE_OPS = {"THIC", "CRVT", "CONN", "PRAM", "GLSS", "WAVE", "APER"}

_ZMX_SCALES = {"MM": 1e-3, "INCH": 25.4e-3, "IN": 25.4e-3}

_ZMX, _zmx_on = _registry()


@_zmx_on("UNIT")
def _zmx_unit(ctx, args):
    ctx.system.scale = _ZMX_SCALES[args.split()[0]]


@_zmx_on("NAME")
def _zmx_name(ctx, args):
    ctx.system.description = args.strip("\"")


@_zmx_on("SURF")
def _zmx_surf(ctx, args):
    if ctx.break_row is not None:
        ctx.apply_break()
    if not ctx.seen_surf:
        # Zemax SURF 0 IS the object surface: map it onto the seeded
        # object row instead of appending, so imported element count
        # and stop index match the file (and a system_to_zmx round
        # trip is the identity).  The reference importer appends here
        # and every import gains a spurious leading passthrough row
        # (reference zemax.py:93-110).
        ctx.seen_surf = True
        ctx.surf_type = "STANDARD"
        return
    e = Spheroid(material=air)
    ctx.system.append(e)
    ctx.place(e)
    ctx.surf_type = "STANDARD"


@_zmx_on("RAIM")
def _zmx_raim(ctx, args):
    """Ray aiming: only the on/off of the third field is mapped (onto
    ObjectConjugate.pupil.aim); the reference ignores the line."""
    vals = [float(t) for t in args.split()]
    if len(vals) >= 3:
        ctx.raim = vals[2] != 0


#: surface TYPEs whose PARM rows we can map onto the Spheroid model
_ZMX_TYPES = {"STANDARD", "EVENASPH", "ODDASPHE", "COORDBRK",
              "BICONICX", "TOROIDAL", "DGRATING", "BINARY_2",
              "XPOLYNOM", "FZERNSAG", "SZERNSAG"}


@_zmx_on("TYPE")
def _zmx_type(ctx, args):
    typ = args.split()[0]
    ctx.surf_type = typ
    if typ == "COORDBRK":
        # the just-appended row is a coordinate break, not a surface:
        # remember its (already placed) origin and collect its PARMs;
        # the frame change applies when the next surface arrives
        e = ctx.system.pop()
        ctx.pending = np.asarray(e.offset, dtype=float)
        ctx.break_row = [0.]*6
    elif typ == "BICONICX":
        # anamorphic row: promote the just-appended Spheroid to a
        # Biconic (PARM 1 = X radius, PARM 2 = X conic -- the
        # OpticStudio biconic parameter layout; base CURV/CONI stay
        # the Y figure)
        from ..elements import Biconic
        e = ctx.system[-1]
        e.__class__ = Biconic
        e.curvature_x = 0.
        e.conic_x = 0.
    elif typ == "TOROIDAL":
        # toroid: base CURV/CONI describe the y-z generating curve,
        # PARM 1 the radius of rotation (0 = cylinder)
        from ..elements import Toroid
        e = ctx.system[-1]
        e.__class__ = Toroid
        e.curvature_rotation = 0.
    elif typ == "DGRATING":
        # diffraction grating on the base figure: PARM 1 = lines per
        # MICROMETER (the OpticStudio unit), PARM 2 = order
        from ..elements import Grating
        e = ctx.system[-1]
        e.__class__ = Grating
        e.grating_frequency = 0.
        e.grating_order = 1
    elif typ == "BINARY_2":
        # radial diffractive phase on an even-asphere base: PARM rows
        # are the substrate aspherics (like EVENASPH); extra data
        # (XDAT) 1 = number of terms, 2 = normalization radius,
        # 3.. = phase coefficients A_i (radians, coefficient of
        # rho**(2i)).  The traced diffraction order is taken as 1
        # (the design order of essentially all Binary 2
        # prescriptions); adjust e.diffraction_order after import if
        # the design traces another order.
        from ..elements import DiffractiveSurface
        e = ctx.system[-1]
        e.__class__ = DiffractiveSurface
        e.phase_coefficients = []
        e.norm_radius = 1.
        e.diffraction_order = 1
    elif typ == "XPOLYNOM":
        # Extended Polynomial: conic base + general XY polynomial.
        # Extra data (XDAT) 1 = number of terms, 2 = normalization
        # radius, 3.. = coefficients (lens units, i.e. the sag
        # contribution at the normalization radius) in the triangular
        # ordering x, y, x^2, xy, y^2, x^3, ... -- exactly the
        # FreeformXY convention (elements.py), so the mapping is the
        # identity.
        from ..elements import FreeformXY
        e = ctx.system[-1]
        e.__class__ = FreeformXY
        e.xy_coefficients = []
        e.norm_radius = 1.
    elif typ in ("FZERNSAG", "SZERNSAG"):
        # Zernike Fringe Sag / Zernike Standard Sag: conic + even
        # asphere (PARM rows, handled by the EVENASPH fall-through)
        # + Zernike figure.  Extra data (XDAT) 1 = number of terms,
        # 2 = normalization radius, 3.. = coefficients in lens units.
        # FZERNSAG coefficients scale UNNORMALIZED Fringe-ordered
        # Zernikes (utils.zernike.fringe_to_nm); SZERNSAG scales the
        # orthonormal Noll-ordered set -- ZernikeSag's native
        # convention, so Fringe rows are converted exactly via
        # utils.zernike.fringe_to_noll.
        from ..elements import ZernikeSag
        e = ctx.system[-1]
        e.__class__ = ZernikeSag
        e.xy_coefficients = []
        e.zernike_coefficients = []
        e.piston = 0.
        e.norm_radius = 1.
        ctx.fringe = [] if typ == "FZERNSAG" else None
    elif typ not in _ZMX_TYPES:
        print("surface type not supported, treating as STANDARD:", typ)


@_zmx_on("XDAT")
def _zmx_xdat(ctx, args):
    # extra data rows: BINARY_2 / XPOLYNOM / FZERNSAG / SZERNSAG all
    # use the same layout (1 = term count, 2 = normalization radius,
    # 3.. = coefficients); what the coefficients mean depends on the
    # type (phase in radians / XY-monomial sags / Zernike sags)
    typ = getattr(ctx, "surf_type", None)
    if typ not in ("BINARY_2", "XPOLYNOM", "FZERNSAG", "SZERNSAG"):
        return
    toks = args.split()
    i, j = int(toks[0]), float(toks[1])
    e = ctx.surface
    if i == 1:
        return  # term count is implied by the coefficient rows
    if i == 2:
        if j:
            e.norm_radius = j
        return
    if i < 3 or not j:
        return
    if typ == "BINARY_2":
        coeffs = e.phase_coefficients
    elif typ == "XPOLYNOM":
        coeffs = e.xy_coefficients
    elif typ == "FZERNSAG":
        coeffs = ctx.fringe
    else:
        coeffs = e.zernike_coefficients
    while len(coeffs) < i - 2:
        coeffs.append(0.)
    coeffs[i - 3] = j
    if typ == "FZERNSAG":
        from ..utils.zernike import fringe_to_noll
        e.zernike_coefficients = fringe_to_noll(ctx.fringe)
        e._relower()
    elif typ == "SZERNSAG":
        e._relower()


@_zmx_on("CURV")
def _zmx_curv(ctx, args):
    ctx.surface.curvature = float(args.split()[0])


@_zmx_on("ENPD")
def _zmx_enpd(ctx, args):
    ctx.enpd = float(args.split()[0])


@_zmx_on("FTYP")
def _zmx_ftyp(ctx, args):
    ctx.ftyp = [int(float(t)) for t in args.split()[:4]]


@_zmx_on("XFLN")
def _zmx_xfln(ctx, args):
    ctx.xfln = [float(t) for t in args.split()]


@_zmx_on("YFLN")
def _zmx_yfln(ctx, args):
    ctx.yfln = [float(t) for t in args.split()]


@_zmx_on("DISZ")
def _zmx_disz(ctx, args):
    ctx.next_pos = float(args)


@_zmx_on("GLAS")
def _zmx_glas(ctx, args):
    args = args.split()
    name = args[0]
    try:
        ctx.surface.material = Material.make(name)
    except KeyError:
        try:
            ctx.surface.material = Material.make(
                (float(args[3]), float(args[4])))
        except Exception as exc:
            print("material not found", name, exc)


@_zmx_on("DIAM")
def _zmx_diam(ctx, args):
    ctx.surface.radius = float(args.split()[0])


@_zmx_on("STOP")
def _zmx_stop(ctx, args):
    ctx.surface.stop = True
    ctx.system.stop = len(ctx.system) - 1


@_zmx_on("WAVL")
def _zmx_wavl(ctx, args):
    ctx.system.wavelengths = [float(i)*1e-6
                              for i in args.split() if i]


@_zmx_on("COAT")
def _zmx_coat(ctx, args):
    ctx.surface.coating = args.split()[0]


@_zmx_on("CONI")
def _zmx_coni(ctx, args):
    ctx.surface.conic = float(args.split()[0])


@_zmx_on("MNUM")
def _zmx_mnum(ctx, args):
    # multi-configuration editor header: "MNUM <nconf> [<noperand>]".
    # Subsequent operand blocks (opcode line + one indented
    # "<conf> <value> ..." row per configuration) are collected by
    # _ZmxContext.mce_feed until the next regular command.
    toks = args.split()
    ctx.mce_nconf = int(float(toks[0])) if toks else 0
    ctx.mce_active = True


@_zmx_on("PARM")
def _zmx_parm(ctx, args):
    i, j = args.split()
    i = int(i)
    j = float(j)
    if ctx.break_row is not None:
        # COORDBRK: PARM 1,2 = decenter x,y; 3,4,5 = tilt x,y,z in
        # degrees; 6 = order (0: decenter-then-tilt)
        if 1 <= i <= 6:
            ctx.break_row[i - 1] = j
        return
    e = ctx.surface
    if ctx.surf_type == "BICONICX":
        if i == 1:
            e.curvature_x = 1./j if j else 0.
        elif i == 2:
            e.conic_x = j
        elif j:
            print("biconic parameter not supported", args)
        return
    if ctx.surf_type == "DGRATING":
        if i == 1:
            # lines/um -> lines per system unit via the UNIT scale
            # (lines/m = j/1e-6; lines/unit = lines/m * scale)
            e.grating_frequency = j/1e-6*ctx.system.scale
        elif i == 2:
            e.grating_order = int(j)
        elif j:
            print("grating parameter not supported", args)
        return
    # BINARY_2 is "even asphere + phase": its PARM rows carry the
    # substrate aspherics and fall through to the EVENASPH handling
    # (the phase lives in the XDAT extra-data rows)
    if ctx.surf_type == "TOROIDAL":
        if i == 1:
            e.curvature_rotation = 1./j if j else 0.
        elif i >= 2 and j:
            # PARM 2.. are the curve's polynomial terms alpha_1..
            # (coefficients of y^2, y^4, ...) -> aspherics[i - 2]
            e_asp = e.aspherics or []
            while len(e_asp) <= i - 2:
                e_asp.append(0.)
            e_asp[i - 2] = j
            e.aspherics = e_asp
        return
    if ctx.surf_type == "ODDASPHE":
        # odd asphere: PARM i is the coefficient of r**i
        # (all integer powers); route even powers to the even array
        # (r**(2m) -> aspherics[m-1]) and odd powers to
        # aspherics_odd (r**(2m+1) -> aspherics_odd[m])
        if i % 2 == 0:
            attr, idx = "aspherics", i//2 - 1
        else:
            attr, idx = "aspherics_odd", (i - 1)//2
    else:
        # even asphere: PARM i is the coefficient of r**(2i)
        attr, idx = "aspherics", i - 1
    if idx < 0:
        if j:
            print("aspheric 0 degree not supported", args)
        return
    coeffs = getattr(e, attr)
    if coeffs is None:
        coeffs = []
        setattr(e, attr, coeffs)
    while len(coeffs) <= idx:
        coeffs.append(0.)
    coeffs[idx] = j


class _ZmxContext:
    def __init__(self):
        self.system = System()
        self.system.append(Spheroid(material=air))
        self.next_pos = 0.
        self.surf_type = "STANDARD"
        #: aperture/field definitions (ENPD/FTYP/XFLN/YFLN)
        self.enpd = None
        self.ftyp = None
        self.xfln = None
        self.yfln = None
        self.raim = None
        #: the first SURF command maps onto the seeded object row
        self.seen_surf = False
        #: cumulative global->axis rotation from coordinate breaks
        self.axis_rot = np.eye(3)
        #: global-frame shift accumulated by pending breaks
        self.pending = np.zeros(3)
        #: PARMs of a coordinate break awaiting the next surface
        self.break_row = None
        #: raw Fringe-ordered coefficients of an FZERNSAG in progress
        self.fringe = None
        #: multi-configuration (MCE) collection state
        self.mce_active = False
        self.mce_nconf = 0
        self.mce = []          # operand records in file order
        self.mce_pending = None

    def place(self, e):
        """Pose the freshly appended surface: its vertex sits
        next_pos along the current axis (plus any pending break
        shift), its local frame is the current axis frame."""
        if np.allclose(self.axis_rot, np.eye(3)) and \
                not self.pending.any():
            e.distance = self.next_pos   # exact straight-path floats
            # (also keeps an infinite object DISZ out of the 0*inf
            # rotation product)
        else:
            off = (self.axis_rot.T
                   @ np.array([0., 0., self.next_pos])
                   + self.pending)
            set_pose(e, off, self.axis_rot)
        self.pending = np.zeros(3)
        self.next_pos = 0.

    def apply_break(self):
        """Fold the recorded coordinate break into the running frame:
        decenter and tilt per the order flag, then advance the break's
        thickness (next_pos) along the new axis."""
        dx, dy, ax, ay, az, order = self.break_row
        dec = np.array([dx, dy, 0.])
        tilt = euler_matrix(np.deg2rad(ax), np.deg2rad(ay),
                            np.deg2rad(az), axes="rxyz")
        a_old = self.axis_rot
        a_new = tilt.T @ a_old
        if order == 0:
            self.pending += a_old.T @ dec
        else:
            self.pending += a_new.T @ dec
        self.pending += a_new.T @ np.array([0., 0., self.next_pos])
        self.axis_rot = a_new
        self.next_pos = 0.
        self.break_row = None

    @property
    def surface(self):
        return self.system[-1]

    # -- multi-configuration (MCE) section ---------------------------
    #
    # Layout (as written by OpticStudio and by system_to_zmx): after
    # "MNUM <nconf> <nops>" each operand is an opcode line
    # ("THIC <surf>", "CRVT <surf>", "PRAM <surf> <par>", "WAVE <k>",
    # "APER", "GLSS <surf>", ...) followed by one indented row per
    # configuration: "<conf> <value> <flags...>".  The section ends at
    # the first regular (registered) command.  Unknown operands are
    # consumed silently so their rows don't leak into the surface
    # parser.

    def mce_feed(self, cmd, args):
        """Consume one line of the MCE section.  Returns False (and
        deactivates collection) when the section has ended and the
        line must be dispatched normally."""
        if cmd in _ZMX:
            self.mce_active = False
            self.mce_pending = None
            return False
        if cmd.lstrip("+-").isdigit():
            # per-configuration value row of the pending operand
            rec = self.mce_pending
            row = args.split()
            if rec is not None and row:
                try:
                    value = float(row[0])
                except ValueError:
                    value = row[0].strip("\"")   # e.g. GLSS names
                rec["values"][int(cmd)] = value
            return True
        toks = args.split()
        rec = dict(op=cmd, args=[], values={})
        if cmd in _MCE_OPS:
            try:
                rec["args"] = [int(float(t)) for t in toks[:2]]
            except ValueError:
                rec["args"] = []
            self.mce.append(rec)
        elif cmd not in _ZMX_IGNORED:
            print("MCE operand not supported", cmd, args)
        self.mce_pending = rec
        return True

    def _mce_spec(self, rec):
        """Map one MCE operand record to a configuration write spec
        (the pickup/solve accessor vocabulary) plus a value
        transform, or None if it cannot be represented."""
        s = self.system
        op, a = rec["op"], rec["args"]
        ident = lambda v: v  # noqa: E731
        if op == "THIC" and a:
            # DISZ of SURF j is the gap before imported element j+1
            idx = a[0] + 1
            if idx >= len(s):
                print("MCE THIC", a[0], "beyond the last gap; dropped")
                return None
            return {"set": [idx, "distance"]}, ident
        if op == "CRVT" and a:
            return {"set": [a[0], "curvature"]}, ident
        if op == "CONN" and a:
            return {"set": [a[0], "conic"]}, ident
        if op == "PRAM" and len(a) >= 2:
            # "PRAM <surf> <par>"; only plain even-asphere parameters
            # map directly onto an attribute path
            e = s[a[0]]
            if type(e).__name__ != "Spheroid" or getattr(
                    e, "aspherics_odd", None):
                print("MCE PRAM on non-even-asphere surface; dropped")
                return None
            k = a[1] - 1
            if k < 0:
                return None
            coeffs = e.aspherics
            if coeffs is None:
                coeffs = []
                e.aspherics = coeffs
            while len(coeffs) <= k:
                coeffs.append(0.)
            return {"set": [a[0], "aspherics", k]}, ident
        if op == "GLSS" and a:
            return ({"set_exec":
                     "from rayopt_tpu.materials import Material\n"
                     "self[%d].material = Material.make(value)"
                     % (a[0])}, ident)
        if op == "WAVE" and a:
            k = a[0] - 1
            if not 0 <= k < len(s.wavelengths):
                print("MCE WAVE", a[0], "out of range; dropped")
                return None
            return {"set": ["wavelengths", k]}, lambda v: v*1e-6
        if op == "APER":
            return ({"set": ["object", "pupil", "radius"]},
                    lambda v: v/2.)
        return None

    def finish_mce(self):
        """Lower the collected MCE operands into
        System.configurations: one override list per configuration,
        ready for apply_configuration/at_configuration."""
        if not self.mce:
            return
        confs = sorted({c for rec in self.mce for c in rec["values"]})
        if len(confs) < 2:
            return
        mapped = []
        for rec in self.mce:
            out = self._mce_spec(rec)
            if out is not None:
                mapped.append((out[0], out[1], rec["values"]))
        if not mapped:
            return
        self.system.configurations = [
            [dict(spec, value=conv(values[c]))
             for spec, conv, values in mapped if c in values]
            for c in confs]

    def finish_conjugates(self):
        """Apply the collected aperture (ENPD) and field (FTYP +
        XFLN/YFLN) definitions to the conjugates: field type 0 =
        angles in degrees (infinite object), 1 = object heights
        (finite object).  The reference importer drops all of these
        (reference zemax.py:106-113 ignored list)."""
        s = self.system
        if self.enpd:
            s.object.pupil.radius = self.enpd/2.
            s.object.pupil.update_radius = False
        if self.raim is not None:
            s.object.pupil.aim = self.raim
        ftyp = (self.ftyp or [0])[0]
        n = (self.ftyp[2] if self.ftyp and len(self.ftyp) > 2
             and self.ftyp[2] > 0 else None)
        ys = list(self.yfln or [])
        xs = list(self.xfln or [])
        if n is not None:
            ys = (ys + [0.]*n)[:n]
            xs = (xs + [0.]*n)[:n]
        if not ys and xs:
            ys = [0.]*len(xs)
        if ftyp not in (0, 1):
            # FTYP 2/3 field values are paraxial/real IMAGE heights --
            # they must not be written into the object conjugate
            if ys or xs:
                import warnings
                warnings.warn(
                    "FTYP %d (image-height fields) is not mapped to "
                    "the object conjugate; field set ignored" % ftyp)
            ys = []
        if ys:
            if not xs:
                xs = [0.]*len(ys)
            radial = any(abs(x) > 1e-12 for x in xs)
            if radial:
                import warnings
                warnings.warn(
                    "x-direction field points collapse to radial "
                    "magnitudes (System fields are scalar fractions)")
            mags = [np.hypot(x, y) for x, y in zip(xs, ys)]
            fmax = max(mags)
            if fmax:
                if radial:
                    s.fields = [m/fmax for m in mags]
                else:
                    s.fields = [y/fmax for y in ys]
                if ftyp == 1:
                    from ..conjugates import FiniteConjugate
                    obj = FiniteConjugate(radius=fmax)
                    obj.pupil = s.object.pupil
                    s.object = obj
                else:
                    s.object.angle = np.deg2rad(fmax)


def zmx_to_system(data, item=None):
    """Parse a .zmx prescription into a System
    (reference zemax.py:90; command coverage identical, with the STOP
    command additionally wired to System.stop)."""
    ctx = _ZmxContext()
    for line in data.splitlines():
        if not line.strip():
            continue
        cmd, _, args = line.strip().partition(" ")
        if ctx.mce_active and ctx.mce_feed(cmd, args):
            continue
        handler = _ZMX.get(cmd)
        if handler is not None:
            handler(ctx, args)
        elif cmd not in _ZMX_IGNORED:
            print(cmd, "not handled", args)
    if ctx.break_row is not None:
        ctx.apply_break()
    ctx.finish_conjugates()
    ctx.finish_mce()
    return ctx.system


# -- .zmx writer (beyond the reference: export for interchange) --------

def _mce_export_row(path, system):
    """Map a configuration 'set' path to its MCE operand header and
    value transform, or None if not representable in the MCE operand
    subset.  Writer-side index convention: SURF j = system[j], so
    system[i].distance (the gap before element i) is the DISZ -- and
    THIC operand -- of SURF i-1."""
    ident = lambda v: v  # noqa: E731
    if len(path) == 2 and isinstance(path[0], int):
        i, attr = path
        if attr == "distance" and i >= 1:
            return "THIC %d" % (i - 1), ident
        if attr == "curvature":
            return "CRVT %d" % i, ident
        if attr == "conic":
            return "CONN %d" % i, ident
    if len(path) == 3 and isinstance(path[0], int) \
            and path[1] == "aspherics":
        return "PRAM %d %d" % (path[0], path[2] + 1), ident
    if len(path) == 2 and path[0] == "wavelengths":
        return "WAVE %d" % (path[1] + 1), lambda v: v*1e6
    if list(path) == ["object", "pupil", "radius"]:
        return "APER", lambda v: v*2.
    return None


def _mce_block(system):
    """MNUM + operand lines for System.configurations (read back by
    zmx_to_system; the reference has neither)."""
    nconf = len(system.configurations)
    order, values = [], {}
    for ci, cfg in enumerate(system.configurations):
        for spec in cfg:
            path = spec.get("set")
            if path is None or "value" not in spec:
                print("configuration spec dropped on .zmx export "
                      "(no plain set/value):", spec)
                continue
            key = tuple(path)
            if key not in values:
                values[key] = {}
                order.append(key)
            values[key][ci + 1] = spec["value"]
    rows = []
    for key in order:
        out = _mce_export_row(list(key), system)
        if out is None:
            print("configuration path not representable as an MCE "
                  "operand; dropped on .zmx export:", list(key))
            continue
        header, conv = out
        vals = values[key]
        lines = [header]
        for c in range(1, nconf + 1):
            # configurations not overriding this path keep the
            # system's current value
            v = vals.get(c, system.get_path(list(key)))
            lines.append('  %d %.17g 0 0 0 0 ""' % (c, conv(v)))
        rows.append(lines)
    if not rows:
        return []
    block = ["MNUM %d %d" % (nconf, len(rows))]
    for lines in rows:
        block.extend(lines)
    return block


def system_to_zmx(system):
    """Serialize a System to Zemax .zmx text (the command subset the
    importer reads back: UNIT/NAME/WAVL/SURF/TYPE/CURV/CONI/PARM/
    DISZ/DIAM/GLAS/STOP).

    Zemax SURF j maps to system[j] (SURF 0 = the object surface with
    the object gap as its DISZ).  zmx_to_system maps SURF 0 back onto
    its seeded object row, so zmx_to_system(system_to_zmx(s)) is
    self-contained: element count, stop index, conjugate/pupil
    seeding (ENPD/FTYP/XFLN/YFLN/RAIM) and the traced spot RMS all
    round-trip without manual restoration."""
    inv_scales = {v: k for k, v in _ZMX_SCALES.items()}
    out = ["VERS 1.0 rayopt_tpu"]
    if system.description:
        out.append('NAME "%s"' % system.description)
    unit = inv_scales.get(system.scale)
    if unit:
        out.append("UNIT %s IN IN IN" % unit)
    out.append("WAVL " + " ".join("%.9g" % (w*1e6)
                                  for w in system.wavelengths))
    # aperture + field definitions (the importer reads these back;
    # the reference ignores them on import and has no writer at all)
    prad = getattr(system.object.pupil, "radius", np.inf)
    if np.isfinite(prad) and prad:
        out.append("ENPD %.17g" % (2.*prad))
    # ray aiming on/off (third field; read back into pupil.aim)
    out.append("RAIM 0 0 %d 1 0 0 0 0 0"
               % (1 if getattr(system.object.pupil, "aim", False)
                  else 0))
    fields = list(system.fields) or [0.]
    if system.object.finite:
        fmax = system.object.radius
        out.append("FTYP 1 0 %d %d" % (len(fields),
                                       len(system.wavelengths)))
    else:
        fmax = np.rad2deg(system.object.angle)
        out.append("FTYP 0 0 %d %d" % (len(fields),
                                       len(system.wavelengths)))
    out.append("XFLN " + " ".join("0" for _ in fields))
    out.append("YFLN " + " ".join("%.9g" % (f*fmax)
                                  for f in fields))
    if getattr(system, "configurations", None):
        out.extend(_mce_block(system))
    # element poses (tilt/decenter/fold): emitted as COORDBRK rows
    # whose decenter+tilt+thickness reproduce each element's exact
    # lab-frame offset and rotation through the importer's running-
    # axis model (apply_break) -- previously poses were silently
    # dropped on export
    from ..utils.geometry import euler_from_matrix

    def _pose_of(e):
        rot = (np.asarray(e.rot_normal, float)
               if getattr(e, "rotated", False) else np.eye(3))
        return np.asarray(e.offset, float), rot

    posed = []
    a_run = np.eye(3)
    for j, e in enumerate(system):
        off, rot = _pose_of(e)
        if not np.all(np.isfinite(off)):
            # infinite conjugate gap: straight by construction (a
            # 0*inf matmul would NaN the transverse test)
            posed.append(False)
            a_run = rot
            continue
        tr = a_run @ off
        plain = (np.allclose(rot, a_run, atol=1e-14)
                 and abs(tr[0]) < 1e-12 and abs(tr[1]) < 1e-12)
        posed.append(not plain)
        a_run = rot
    if any(posed) and getattr(system, "configurations", None):
        import warnings
        warnings.warn(
            "element poses + MCE configurations cannot both be "
            "exported (COORDBRK rows shift the MCE surface indices); "
            "poses dropped -- serialize via YAML/JSON to keep both")
        posed = [False]*len(system)

    surf_idx = 0
    a_old = np.eye(3)
    for j, e in enumerate(system):
        if j > 0:
            off, rot = _pose_of(e)
            if not posed[j]:
                gap = (off[2] if not np.all(np.isfinite(off))
                       else (a_old @ off)[2])
                out.append("  DISZ %.17g" % gap)
            else:
                # previous gap rides inside the break: solve
                # [x_old y_old z_new][dx dy t]^T = offset
                out.append("  DISZ 0")
                m3 = np.column_stack([a_old.T[:, 0], a_old.T[:, 1],
                                      rot.T[:, 2]])
                dx, dy, t = np.linalg.solve(m3, off)
                tilt = a_old @ rot.T
                ax, ay, az = euler_from_matrix(tilt, "rxyz")
                out.append("SURF %d" % surf_idx)
                surf_idx += 1
                out.append("  TYPE COORDBRK")
                for i, v in enumerate((dx, dy, np.rad2deg(ax),
                                       np.rad2deg(ay),
                                       np.rad2deg(az), 0.)):
                    if v:
                        out.append("  PARM %d %.17g" % (i + 1, v))
                out.append("  DISZ %.17g" % t)
                a_old = rot
        out.append("SURF %d" % surf_idx)
        surf_idx += 1
        odd = getattr(e, "aspherics_odd", None)
        even = getattr(e, "aspherics", None)
        cx = getattr(e, "curvature_x", None)
        kx = getattr(e, "conic_x", None)
        toroid = hasattr(e, "curvature_rotation")
        grating = bool(getattr(e, "grating_frequency", 0.))
        doe = bool(getattr(e, "phase_coefficients", None))
        biconic = not toroid and cx is not None and (
            cx != getattr(e, "curvature", 0.)
            or (kx or 0.) != getattr(e, "conic", 0.))
        zsag = [z for z in getattr(e, "zernike_coefficients", None)
                or () if z]
        has_xy = bool(np.any(np.asarray(getattr(e, "_xy_arr", ()))
                             != 0))
        if has_xy and (doe or grating or toroid or biconic):
            # zmx has no type combining a freeform figure with a
            # grating/DOE/anamorphic carrier; keep the carrier type
            import warnings
            warnings.warn(
                "surface %d: freeform figure on a grating/DOE/"
                "anamorphic carrier has no .zmx type; the carrier is "
                "exported, the freeform terms are dropped (serialize "
                "via YAML/JSON to keep them)" % j)
            zsag, has_xy = [], False
        if doe:
            out.append("  TYPE BINARY_2")
        elif grating:
            out.append("  TYPE DGRATING")
        elif toroid:
            out.append("  TYPE TOROIDAL")
        elif biconic:
            out.append("  TYPE BICONICX")
        elif zsag:
            out.append("  TYPE SZERNSAG")
        elif has_xy:
            out.append("  TYPE XPOLYNOM")
        elif odd:
            out.append("  TYPE ODDASPHE")
        elif even:
            out.append("  TYPE EVENASPH")
        else:
            out.append("  TYPE STANDARD")
        if j == system.stop:
            out.append("  STOP")
        c = getattr(e, "curvature", 0.)
        if c:
            out.append("  CURV %.17g" % c)
        k = getattr(e, "conic", 0.)
        if k:
            out.append("  CONI %.17g" % k)
        if doe:
            for i, v in enumerate(even or ()):
                if v:
                    out.append("  PARM %d %.17g" % (i + 1, v))
            # fold a non-unit traced order into the coefficients:
            # BINARY_2 has no per-surface order field, and the phase
            # enters the trace only as order * coefficients
            m_ord = e.diffraction_order
            pc = [m_ord*v for v in e.phase_coefficients]
            out.append("  XDAT 1 %d" % len(pc))
            out.append("  XDAT 2 %.17g" % e.norm_radius)
            for i, v in enumerate(pc):
                if v:
                    out.append("  XDAT %d %.17g" % (i + 3, v))
            if odd or biconic:
                print("binary-2 substrate odd/anamorphic terms "
                      "dropped on BINARY_2 export")
        elif grating:
            out.append("  PARM 1 %.17g"
                       % (e.grating_frequency/system.scale*1e-6))
            out.append("  PARM 2 %d" % e.grating_order)
            if even or odd or biconic:
                print("grating substrate polynomial/anamorphic "
                      "terms dropped on DGRATING export")
        elif toroid:
            cr = e.curvature_rotation
            out.append("  PARM 1 %.17g" % (1./cr if cr else 0.))
            for i, v in enumerate(even or ()):
                if v:
                    out.append("  PARM %d %.17g" % (i + 2, v))
            if odd:
                print("toroid odd aspherics are not representable "
                      "in TYPE TOROIDAL; dropped on export")
        elif biconic:
            out.append("  PARM 1 %.17g" % (1./cx if cx else 0.))
            if kx:
                out.append("  PARM 2 %.17g" % kx)
            if even or odd:
                print("biconic aspheric terms are not representable "
                      "in TYPE BICONICX; dropped on export")
        elif zsag or has_xy:
            # Zernike Standard Sag / Extended Polynomial: even
            # aspherics ride in the PARM columns (the surface's
            # alpha_i rho^(2i) terms), the figure coefficients in the
            # XDAT block (1 = count, 2 = norm radius, 3.. = values).
            # SZERNSAG coefficients are Noll-ordered orthonormal sags
            # in lens units (ZernikeSag's native convention);
            # XPOLYNOM coefficients are the triangular XY-monomial
            # sags at the normalization radius (FreeformXY's native
            # convention).
            for i, v in enumerate(even or ()):
                if v:
                    out.append("  PARM %d %.17g" % (i + 1, v))
            coeffs = (list(e.zernike_coefficients) if zsag
                      else list(e.xy_coefficients or ()))
            out.append("  XDAT 1 %d" % len(coeffs))
            out.append("  XDAT 2 %.17g" % e.norm_radius)
            for i, v in enumerate(coeffs):
                if v:
                    out.append("  XDAT %d %.17g" % (i + 3, v))
            if odd:
                print("freeform substrate odd aspherics are not "
                      "representable in TYPE SZERNSAG/XPOLYNOM; "
                      "dropped on export")
        elif odd:
            for i, v in enumerate(odd):
                if v:
                    out.append("  PARM %d %.17g" % (2*i + 1, v))
            for i, v in enumerate(even or ()):
                if v:
                    out.append("  PARM %d %.17g" % (2*i + 2, v))
        elif even:
            for i, v in enumerate(even):
                if v:
                    out.append("  PARM %d %.17g" % (i + 1, v))
        mat = getattr(e, "material", None)
        if mat is not None and not getattr(mat, "mirror", False) \
                and str(mat) not in ("basic/air", "air"):
            try:
                nd, vd = float(mat.nd), float(mat.vd)
            except Exception:
                nd = vd = 0.
            out.append("  GLAS %s 0 0 %.9g %.9g"
                       % (str(mat).split("/")[-1].upper(), nd, vd))
        if mat is not None and getattr(mat, "mirror", False):
            out.append("  GLAS MIRROR 0 0 0 0")
        if np.isfinite(e.radius) and e.radius:
            out.append("  DIAM %.17g 1 0 0" % e.radius)
    out.append("  DISZ 0")
    return "\n".join(out) + "\n"


# -- .agf glass catalogs ------------------------------------------------

def _agf_open(fil):
    """AGF files come UTF-16 (BOM) or latin1."""
    with open(fil, "rb") as probe:
        bom = probe.read(len(codecs.BOM_UTF16))
    enc = "utf-16" if bom == codecs.BOM_UTF16 else "latin1"
    return open(fil, encoding=enc)


def agf_read(fil, session):
    """Read a Zemax glass catalog (.agf) into the library: one
    LibMaterial per NM block, nd/vd/status from NM, thermal/density
    from ED, raw block retained for lazy parsing
    (reference zemax.py:186)."""
    from .library import Catalog, LibMaterial
    cat = Catalog()
    cat.load(fil)
    cat.name = os.path.splitext(os.path.basename(fil))[0]
    cat.type, cat.source, cat.format = "material", "zemax", "agf"
    cat.version = 0
    session.add(cat)
    mat = None
    for line in _agf_open(fil):
        if not line.strip() or line.startswith("!"):
            continue
        cmd, _, args = line.partition(" ")
        if cmd == "CC":
            continue
        if cmd == "NM":
            mat = LibMaterial(data="")
            cat.materials.append(mat)
            head = args.split()
            mat.name = head[0]
            mat.code = head[2]
            mat.nd = sfloat(head[3])
            mat.vd = sfloat(head[4])
            if len(head) >= 7:
                mat.status = sint(head[6])
        elif cmd == "GC" and mat is not None:
            mat.comment = args
        elif cmd == "ED" and mat is not None:
            vals = args.split()
            mat.tce = sfloat(vals[0])
            mat.density = sfloat(vals[2])
        if mat is not None:
            mat.data += line
    return cat


#: AGF dispersion formula number -> dispersion name (1-based,
#: reference zemax.py:218)
_AGF_TYPES = ("schott sellmeier_squared herzberger sellmeier2 conrady "
              "sellmeier_squared handbook_of_optics1 handbook_of_optics2 "
              "sellmeier_squared_offset extended1 sellmeier5 extended2 "
              "hikari").split()

_AGF, _agf_on = _registry()


@_agf_on("NM")
def _agf_nm(g, args):
    args = args.split()
    g.typ = _AGF_TYPES[int(float(args[1])) - 1]
    g.glasscode = sfloat(args[2])
    g.name = args[0]


@_agf_on("GC")
def _agf_gc(g, args):
    g.comment = args.strip()


@_agf_on("ED")
def _agf_ed(g, args):
    vals = [sfloat(v) for v in args.split()]
    g.alpham3070, g.alpha20300, g.density = vals[:3]


@_agf_on("CD")
def _agf_cd(g, args):
    g.coefficients = np.array([sfloat(v) for v in args.split()])


@_agf_on("TD")
def _agf_td(g, args):
    vals = [sfloat(v) for v in args.split()]
    g.thermal = Thermal(vals[:3], vals[3:5], *vals[5:])


@_agf_on("OD")
def _agf_od(g, args):
    # price then relative-cost/CR/FR/SR/AR fields (the reference
    # sliced the raw string per character here, zemax.py:257)
    vals = args.split()
    g.price = sfloat(vals[0])
    g.chemical = [sfloat(v) for v in vals[1:]]


@_agf_on("LD")
def _agf_ld(g, args):
    g.lambda_min, g.lambda_max = (sfloat(v)
                                  for v in args.split()[:2])


@_agf_on("IT")
def _agf_it(g, args):
    vals = [sfloat(v) for v in args.split()]
    if not hasattr(g, "transmission"):
        g.transmission = {}
    g.transmission[(vals[0], tuple(vals[2:]))] = vals[1]


def agf_to_material(dat, item=None):
    """Parse one AGF record into a CoefficientsMaterial
    (reference zemax.py:230)."""
    g = CoefficientsMaterial(coefficients=[])
    for line in dat.splitlines():
        if not line:
            continue
        cmd, args = line[:2], line[3:]
        handler = _AGF.get(cmd)
        if handler is not None:
            handler(g, args)
        else:
            print(cmd, args, "not handled")
    return g
