"""System: ordered elements + conjugates + stop + wavelengths.

API parity with reference system.py:35-593 (update/pickup/solve/
validate, reverse/rescale, text tables, edge thickness, outlines, ABCD
products, pupil aiming).  The compute-plane difference: `System.table`
lowers the element list to the struct-of-arrays SurfaceTable and all
per-surface loops (reference system.py:444-464) run as jitted
`lax.scan` engines in rayopt_tpu.ops; the `propagate*` generators here
wrap those engines for API compatibility.
"""

import functools
import itertools

import numpy as np
from scipy.optimize import newton, brentq

from .elements import Element
from .conjugates import Conjugate, FiniteConjugate, InfiniteConjugate
from .materials import fraunhofer
from .pupils import RadiusPupil
from .utils.cachend import PolarCacheND
from .utils.jaxtools import placement, has_accelerator as _accel
from .ops.tables import make_table
from .ops.geometric import trace_rays
from .trace.paraxial import ParaxialTrace


def _auto_pupil():
    return RadiusPupil(radius=1., update_distance=True,
                       update_radius=True)


def _default_object():
    return InfiniteConjugate(angle=0., pupil=_auto_pupil())


def _default_image():
    return FiniteConjugate(radius=0., update_radius=True,
                           pupil=_auto_pupil())


class System(list):
    def __init__(self, elements=None, description="", scale=1e-3,
                 wavelengths=None, stop=1, fields=None,
                 object=None, image=None,
                 pickups=None, validators=None, solves=None):
        super().__init__(Element.make(e) for e in elements or [])
        self.description = description
        self.scale = scale
        self.stop = stop
        self.wavelengths = wavelengths or [fraunhofer[i] for i in "dCF"]
        self.object = (Conjugate.make(object) if object
                       else _default_object())
        self.image = Conjugate.make(image) if image else _default_image()
        if fields is None:
            fields = [0.] if self.object.point else [0., .7, 1.]
        self.fields = fields
        self.pickups = pickups or []
        self.validators = validators or []
        self.solves = solves or []
        self._pupil_cache = {}
        self.paraxial = ParaxialTrace(self, update=False)

    def dict(self):
        out = dict(description=self.description, stop=self.stop,
                   scale=float(self.scale))
        out["wavelengths"] = [float(w) for w in self.wavelengths]
        out["object"] = self.object.dict()
        out["image"] = self.image.dict()
        for key in ("pickups", "validators", "solves"):
            out[key] = [dict(spec) for spec in getattr(self, key)]
        out["elements"] = [e.dict() for e in self]
        return out

    # -- structure ---------------------------------------------------

    @property
    def aperture(self):
        return self[self.stop]

    @aperture.setter
    def aperture(self, a):
        self.stop = self.index(a)

    def groups(self):
        """Yield index lists forming lens groups (reference
        system.py:92): solids accumulate; a closing non-solid (or a
        lone mirror) finishes the group; bare elements extend an open
        group."""
        members = []
        for idx, el in enumerate(self):
            if not hasattr(el, "material"):
                if members:
                    members.append(idx)
                continue
            mat = el.material
            if getattr(mat, "solid", False):
                members.append(idx)
            elif members or getattr(mat, "mirror", False):
                members.append(idx)
                yield members
                members = []
        if members:
            yield members

    def _walk(self, path):
        node = self
        for step in path:
            node = (getattr(node, step) if isinstance(step, str)
                    else node[step])
        return node

    def get_path(self, path):
        return self._walk(path)

    def set_path(self, path, value):
        node = self._walk(path[:-1])
        leaf = path[-1]
        if isinstance(leaf, str):
            setattr(node, leaf, value)
        else:
            node[leaf] = value

    # -- parametric constraints (reference system.py:134-191) ---------
    # The declarative pickup/solve/validator dicts share one accessor
    # vocabulary: get / get_eval / get_func read a value, set /
    # set_exec / set_func write one.

    def _read(self, spec, extra=None):
        value = None
        if "get" in spec:
            value = self.get_path(spec["get"])
        if "get_eval" in spec:
            scope = dict(self=self)
            if extra:
                scope.update(extra)
            value = eval(spec["get_eval"], scope, globals())
        if "get_func" in spec:
            fn = spec["get_func"]
            if isinstance(fn, str):
                fn = eval(fn)
            value = fn(self, spec, value) if extra is None else fn(
                self, spec)
        return value

    def _write(self, spec, value):
        if "set" in spec:
            self.set_path(spec["set"], value)
        if "set_exec" in spec:
            exec(spec["set_exec"], globals(),
                 dict(value=value, self=self, solve=spec))
        if "set_func" in spec:
            spec["set_func"](self, spec, value)

    def pickup(self):
        for spec in self.pickups:
            value = self._read(spec)
            if "factor" in spec:
                value = value*spec["factor"]
            if "offset" in spec:
                value = value + spec["offset"]
            self._write(spec, value)

    def solve(self):
        for spec in self.solves:
            target = spec.get("target", 0.)
            if "init" in spec:
                start = spec["init"]
            elif "set" in spec:
                start = self.get_path(spec["set"])
            else:
                start = 0.

            def residual(x, spec=spec):
                self._write(spec, x)
                self.pickup()
                return self._read(spec, extra={"solve": spec}) - target

            root = newton(residual, start, tol=spec.get("tol", 1e-8),
                          maxiter=spec.get("maxiter", 20))
            residual(root)
            if "init_current" in spec:
                spec["init"] = float(root)

    _CHECKS = {
        "minimum": (lambda v, lim: v >= lim, "<"),
        "maximum": (lambda v, lim: v <= lim, ">"),
        "equality": (lambda v, lim: v == lim, "!="),
    }

    def validate(self, fix=False):
        for spec in self.validators:
            value = self._read(spec)
            if "exec" in spec:
                exec(spec["exec"], globals(),
                     dict(self=self, value=value))
            for key, (ok, sym) in self._CHECKS.items():
                if key not in spec:
                    continue
                lim = spec[key]
                if ok(value, lim):
                    continue
                if fix and "get" in spec:
                    self.set_path(spec["get"], lim)
                else:
                    raise ValueError(
                        f"{value} {sym} {lim} ({spec})")

    # -- refresh pipeline (reference system.py:201) --------------------

    def refractive_index(self, wavelength, index):
        for element in self[index::-1]:
            try:
                return element.refractive_index(wavelength)
            except AttributeError:
                pass
        return 1.

    def update(self):
        self._pupil_cache.clear()
        self.pickup()
        self.solve()
        self.object.pupil.refractive_index = \
            self.refractive_index(self.wavelengths[0], 0)
        self.image.pupil.refractive_index = \
            self.refractive_index(self.wavelengths[0], -1)
        self.paraxial.update_conjugates()
        self.paraxial.update()
        self.validate()

    # -- global edits ---------------------------------------------------

    def reverse(self):
        """Flip the system end for end: each element inverts, takes the
        following element's spacing and the preceding one's medium."""
        next_dist = [e.distance for e in self[1:]] + [0.]
        prev_mat = [None] + [getattr(e, "material", None)
                             for e in self[:-1]]
        for el, dist, mat in zip(self, next_dist, prev_mat):
            el.reverse()
            el.distance = dist
            el.material = mat
        self[:] = self[::-1]
        self.object, self.image = self.image, self.object

    def rescale(self, scale=None):
        if scale is None:
            scale = self.scale/1e-3
        self.scale /= scale
        for part in itertools.chain(self, (self.object, self.image)):
            part.rescale(scale)

    # -- text ----------------------------------------------------------

    def __str__(self):
        return "\n".join(self.text())

    def text(self):
        return itertools.chain(self.base_text(), ("",))

    def _element_row(self, i, e):
        curv = getattr(e, "curvature", 0)
        mat = getattr(e, "material", "")
        nd = getattr(mat, "nd", np.nan)
        n = (self.refractive_index(self.wavelengths[0], i)
             if mat else nd)
        return ("%2i %1s %10.5g %10.4g %10.5g %17s "
                "%7.3f %7.3f %7.2f") % (
            i, e.typeletter, e.distance,
            np.inf if curv == 0 else 1./curv, e.radius*2, mat, n, nd,
            getattr(mat, "vd", np.nan))

    def base_text(self):
        head = [
            "System: %s" % self.description,
            "Scale: %s mm" % (self.scale/1e-3),
            "Wavelengths: %s nm" % ", ".join(
                "%.0f" % (w/1e-9) for w in self.wavelengths),
            "Fields: %s" % ", ".join("%g" % f for f in self.fields),
        ]
        yield from head
        for name, conj in (("Object:", self.object),
                           ("Image:", self.image)):
            yield name
            for line in conj.text():
                yield " " + line
        yield "Stop: %i" % self.stop
        yield "Elements:"
        yield ("{:>2} {:>1} {:>10} {:>10} {:>10} {:>17} "
               "{:>7} {:>7} {:>7}").format(
                   "#", "T", "Distance", "Rad Curv", "Diameter",
                   "Material", "n", "nd", "Vd")
        for i, e in enumerate(self):
            yield self._element_row(i, e)

    # -- geometry ------------------------------------------------------

    def edge_thickness(self, axis=1):
        """Axial gap at the aperture edge: vertex spacing corrected by
        the sag difference of the two bounding surfaces."""
        sags = []
        for el in self:
            try:
                sags.append(el.edge_sag(axis))
            except AttributeError:
                sags.append(0.)
        sags = np.asarray(sags)
        spacing = np.array([el.distance for el in self])
        return spacing - sags + np.concatenate([[0.], sags[:-1]])

    @property
    def edge_y(self):
        return np.array(self.edge_thickness(axis=1))

    @property
    def edge_x(self):
        return np.array(self.edge_thickness(axis=0))

    def resize_convex(self):
        """Enlarge convex surfaces to at least their closing surface
        (reference system.py:333): consecutive glass-entering faces
        pair up; the larger radius wins on the convex side."""
        faces = [el for el in self[1:-1] if hasattr(el, "material")]

        def enters_glass(el):
            return not el.material or el.material.solid

        for front, back in zip(faces, faces[1:]):
            if not enters_glass(front):
                continue
            grown = max(front.radius, back.radius)
            if getattr(back, "curvature", 0) <= 0:
                back.radius = grown
            if getattr(front, "curvature", 0) > 0:
                front.radius = grown

    @staticmethod
    def _close_solid(front, back):
        """Join two surface outlines into a closed lens cross-section
        (front drawn forward, back reversed, edges bridged)."""
        (fx, fz), (bx, bz) = front, back
        lower = (bx[0], fz[0]) if bx[0] < fx[0] else (fx[0], bz[0])
        upper = (bx[-1], fz[-1]) if bx[-1] > fx[-1] else (fx[-1], bz[-1])
        return np.c_[(fx, fz), upper, (bx[::-1], bz[::-1]), lower,
                     (fx[0], fz[0])]

    def surfaces_cut(self, axis=1, points=31):
        """Yield 2-D cut outlines; solids are closed
        (reference system.py:354)."""
        pos = np.zeros(3)
        open_solid = None
        for e in self:
            pos = pos + e.offset
            xyz = pos + e.from_normal(e.surface_cut(axis, points))
            cut = xyz[:, axis], xyz[:, 2]
            mat = getattr(e, "material", None)
            if mat is None:
                yield cut
                continue
            if open_solid:
                yield self._close_solid(open_solid, cut)
            elif not mat.solid or mat.mirror:
                yield cut
            if mat.solid or (open_solid and mat.mirror):
                open_solid = cut
            else:
                open_solid = None
        if open_solid:
            yield open_solid

    @staticmethod
    def _blank_axes(ax):
        ax.set_aspect("equal")
        for spine in ax.spines.values():
            spine.set_visible(False)
        ax.set_xticks(())
        ax.set_yticks(())

    def plot(self, ax, axis=1, npoints=31, adjust=True, **kwargs):
        kwargs.setdefault("color", "black")
        if adjust:
            self._blank_axes(ax)
        for outline_x, outline_z in self.surfaces_cut(axis, npoints):
            ax.plot(outline_z, outline_x, **kwargs)
        spine = self.origins
        ax.plot(spine[:, 2], spine[:, axis], ":", **kwargs)

    def paraxial_matrices(self, l, start=1, stop=None):
        n = self.refractive_index(l, start - 1)
        for e in self[start:stop]:
            n, m = e.paraxial_matrix(n, l)
            yield n, m

    def paraxial_matrix(self, l, start=1, stop=None):
        n, m = 1., np.eye(4)
        for n, step in self.paraxial_matrices(l, start, stop):
            m = step @ m
        return n, m

    @property
    def origins(self):
        return np.add.accumulate([el.offset for el in self], axis=0)

    def close(self, index=-1):
        self[index].offset -= self.origins[-1]

    @property
    def path(self):
        return np.add.accumulate([el.distance for el in self])

    @property
    def track(self):
        return self.origins[:, 2]

    def align(self, n):
        """Re-aim every element's local frame at its successor's
        direction (scaled by the refraction ratio)."""
        for i in range(len(self) - 1):
            mu = (n[i - 1] if i else n[0])/n[i]
            self[i].align(self[i + 1].direction, mu)
        self[-1].angles = 0, 0, 0.

    @property
    def mirrored(self):
        flips = np.array([
            bool(getattr(getattr(el, "material", None), "mirror", False))
            for el in self])
        return np.multiply.accumulate(np.where(flips, -1, 1))

    # -- lowering to the TPU compute plane -----------------------------

    def table(self, wavelength=None, dtype=np.float64):
        """Lower to a SurfaceTable for one trace wavelength."""
        if wavelength is None:
            wavelength = self.wavelengths[0]
        s = len(self)
        kmax = max((len(getattr(e, "aspherics", None) or ())
                    for e in self), default=0)
        kmax_odd = max((len(getattr(e, "aspherics_odd", None) or ())
                        for e in self), default=0)
        curvature = np.zeros(s)
        conic = np.zeros(s)
        aspherics = np.zeros((s, kmax))
        aspherics_odd = np.zeros((s, kmax_odd))
        offset = np.zeros((s, 3))
        rot = np.tile(np.eye(3), (s, 1, 1))
        radius = np.full(s, np.inf)
        alternate = np.zeros(s)
        mu = np.ones(s)
        n_before = np.ones(s)
        n_after = np.ones(s)
        distance = np.zeros(s)
        n0 = self.refractive_index(wavelength, 0)
        for j, e in enumerate(self):
            curvature[j] = getattr(e, "curvature", 0.)
            conic[j] = getattr(e, "conic", 0.)
            asp = getattr(e, "aspherics", None) or ()
            aspherics[j, :len(asp)] = asp
            asp_odd = getattr(e, "aspherics_odd", None) or ()
            aspherics_odd[j, :len(asp_odd)] = asp_odd
            offset[j] = e.offset
            if e.rotated:
                rot[j] = e.rot_normal
            radius[j] = e.radius
            alternate[j] = 1. if getattr(e, "alternate_intersection",
                                         False) else 0.
            distance[j] = e.distance
            n_before[j] = n0
            if hasattr(e, "get_n_mu"):
                n0, mu[j] = e.get_n_mu(n0, wavelength)
            n_after[j] = n0
        return make_table(
            curvature=curvature, conic=conic, aspherics=aspherics,
            aspherics_odd=aspherics_odd, offset=offset, rot=rot,
            radius=radius, alternate=alternate, mu=mu,
            n_before=n_before, n_after=n_after,
            distance=distance, dtype=dtype)

    def tables(self, wavelengths=None, dtype=np.float64):
        """Stacked SurfaceTable with a leading wavelength axis, for
        the batched polychromatic engine
        (ops.geometric.trace_rays_final_multi)."""
        import jax.tree_util as jtu
        if wavelengths is None:
            wavelengths = self.wavelengths
        tabs = [self.table(l, dtype) for l in wavelengths]
        return jtu.tree_map(lambda *a: np.stack(a), *tabs)

    # -- propagation drivers (reference system.py:444-464) -------------

    def propagate_paraxial(self, yu, n, l, start=1, stop=None):
        state = yu, n
        for e in self[start:stop]:
            state = e.propagate_paraxial(*state, l)
            yield state

    def propagate_gaussian(self, q, n, l, start=1, stop=None):
        state = q, n
        for e in self[start:stop]:
            state = e.propagate_gaussian(*state, l)
            yield state

    def propagate_poly(self, state, l, start=1, stop=None):
        from .trace.poly import propagate_poly_element
        for e in self[start:stop]:
            state = propagate_poly_element(e, state, l)
            yield state

    def trace_table(self, y, u, l, start=1, stop=None, clip=False,
                    table=None):
        """Batched real-ray trace via the jitted scan engine: returns
        (y, u, i, t) stacked over surfaces start-1..stop-1 (row 0 = the
        given seed)."""
        if table is None:
            table = self.table(l)
        import jax.tree_util as jtu
        sub = jtu.tree_map(lambda a: a[start - 1:stop], table)
        y = np.atleast_2d(np.asarray(y, dtype=float))
        u = np.atleast_2d(np.asarray(u, dtype=float))
        from .utils.jaxtools import device_for
        kw = {}
        if device_for(y.shape[0]) is None and _accel():
            # big bundle on the accelerator: fused specialized path
            from .ops.kernels import specialize
            kw = dict(specs=specialize(sub), unroll=True)
        with placement(y.shape[0]):
            ys, us, iis, ts = trace_rays(sub, y, u, clip=clip, **kw)
        return (np.asarray(ys), np.asarray(us), np.asarray(iis),
                np.asarray(ts))

    def propagate(self, y, u, n, l, start=1, stop=None, clip=False):
        """Generator API over the jitted trace (reference
        system.py:459): yields (y, u, n, i, t) per surface."""
        table = self.table(l)
        ys, us, iis, ts = self.trace_table(y, u, l, start, stop,
                                           clip, table)
        n_after = np.asarray(table.n_after)
        for j in range(1, ys.shape[0]):
            yield (ys[j], us[j], n_after[start - 1 + j], iis[j], ts[j])

    # -- scalar solvers (reference system.py:466-502) -------------------

    def solve_newton(self, merit, a=0., tol=1e-3, maxiter=30):
        """Newton root of `merit` with a NaN-escaping start search:
        try a, then a+-1, a+-2, ... until the merit is finite."""
        def offsets():
            yield 0.
            for width in range(1, maxiter):
                yield -float(width)
                yield float(width)

        for da in offsets():
            f = merit(a + da)
            if not np.isnan(f):
                start = a + da
                break
        else:
            raise ValueError("no starting ray found")
        if abs(f) <= tol:
            return start
        return newton(merit, start, tol=tol, maxiter=maxiter)

    def solve_brentq(self, merit, a=0., b=1., tol=1e-3, maxiter=30):
        b_nan = None
        for i in range(maxiter):
            fb = merit(b)
            if abs(fb) <= tol:
                return b
            elif np.isnan(fb):
                # rays started missing surfaces: remember the boundary
                # and back off (the reference just halves,
                # reference system.py:489, which can cycle forever
                # against a nearby NaN ceiling)
                b_nan = b if b_nan is None else min(b_nan, b)
                b = (a + b)/2 if a else b/2
            elif fb < 0:
                a = b
                bnext = b*(1 - fb)
                if b_nan is not None and bnext >= b_nan:
                    # expand only up to the NaN boundary
                    b = (b + b_nan)/2
                else:
                    b = bnext
                if b_nan is not None and abs(b_nan - a) < tol*max(a, 1):
                    # the aperture edge is unreachable: the bundle
                    # vignettes before filling it; aim at the
                    # vignetting limit instead of failing
                    import warnings
                    warnings.warn("aperture edge unreachable; aiming "
                                  "at the vignetting limit")
                    return a
            else:
                break
        if i == maxiter - 1:
            if a and b_nan is not None:
                import warnings
                warnings.warn("aperture edge unreachable; aiming at "
                              "the vignetting limit")
                return a
            raise ValueError("no viable interval found", a, b, fb)
        fa = merit(a)
        if abs(fa) <= tol:
            return a
        assert fa < 0
        return brentq(merit, a, b, rtol=tol, xtol=tol, maxiter=maxiter)

    # -- pupil aiming (reference system.py:504-593) ---------------------

    def aim(self, *args, **kwargs):
        return self.object.aim(*args, surface=self[0], **kwargs)

    def _memoized(fn):
        cache = {}

        def wrapped(a):
            if a not in cache:
                cache[a] = fn(a)
            return cache[a]

        return wrapped

    def aim_chief(self, yo, z, p, l=None, stop=None, **kwargs):
        """Solve the chief-ray pupil distance: newton on the stop
        height of the ray aimed at z + a*p
        (reference system.py:507-526)."""
        assert p
        pupil = self.object.pupil
        if pupil.telecentric or not pupil.aim:
            return z
        l = self.wavelengths[0] if l is None else l
        last = self.stop if stop in (-1, None) else stop
        rad = self.aperture.radius
        assert rad
        table = self.table(l)
        field = np.asarray(yo)

        @System._memoized
        def height_at_stop(a):
            seed = self.aim(yo, None, z + a*p, filter=False)
            heights = self.trace_table(*seed, l, stop=last + 1,
                                       table=table)[0]
            return field @ heights[-1, 0, :2] / rad

        return z + p*self.solve_newton(height_at_stop, **kwargs)

    def aim_marginal(self, yo, yp, z, p, l=None, stop=None, **kwargs):
        """Solve the marginal-ray scale: bracketed root of the edge
        clearance at the limiting aperture; stop=-1 selects rim
        (vignetting) mode over all surfaces
        (reference system.py:528-555)."""
        assert p
        rim = stop == -1
        if not self.object.pupil.aim and not rim:
            return p
        l = self.wavelengths[0] if l is None else l
        if rim:
            stop = len(self) - 1
        elif stop is None:
            stop = self.stop + 1
        r2 = np.array([e.radius for e in self[1:stop]]) ** 2
        table = self.table(l)

        @System._memoized
        def edge_clearance(a):
            seed = self.aim(yo, yp, z, a*p, filter=False)
            heights = self.trace_table(*seed, l, stop=stop,
                                       table=table)[0]
            hit2 = np.einsum("sc,sc->s", heights[1:, 0, :2],
                             heights[1:, 0, :2])
            excess = hit2/r2 - 1
            return excess.max() if rim else excess[-1]

        a = self.solve_brentq(edge_clearance, **kwargs)
        assert a
        return a*p

    def _aim_pupil(self, xo, yo, guess, **kwargs):
        field = np.array((xo, yo))
        if guess is not None:
            z = guess[0]
            half = guess[1:].reshape(2, 2).copy()
        else:
            z = self.object.pupil.distance
            half = np.full((2, 2), float(self.object.pupil.radius))
        if not np.allclose(field, 0):
            z1 = self.aim_chief(field, z, np.abs(half).max(), **kwargs)
            if self.object.finite:
                half *= np.abs(z1/z)  # rescale the rim guess with z
            z = z1
        # rim solves: (row=sign, col=axis); meridional first, and
        # within each axis the upper rim first so it can seed the rest
        for ax in (1, 0):
            for sig in (1, 0):
                probe = [0., 0.]
                probe[ax] = 2.*sig - 1.
                half[sig, ax] = self.aim_marginal(
                    field, probe, z, half[sig, ax], **kwargs)
                if sig == 1:
                    half[0, ax] = -half[1, ax]
                    if ax == 1 and guess is None:
                        half[:, 0] = half[:, 1]
        return np.r_[z, half.flat]

    def pupil(self, yo, l=None, stop=None, **kwargs):
        key = (l, stop)
        solver = self._pupil_cache.get(key)
        if solver is None:
            solver = PolarCacheND(self._aim_pupil, l=l, stop=stop,
                                  **kwargs)
            self._pupil_cache[key] = solver
        state = solver(*yo)
        return state[0], state[1:].reshape(2, 2)

    def pupils(self, fields, l=None, stop=None, tol=1e-6,
               chief_only=False):
        """Batched pupil solve for many field points at once.

        fields: (F, 2) fractional field coordinates.  Eligible systems
        (aimed, non-telecentric conjugates; stop mode or rim mode
        stop=-1) solve every field in ONE device dispatch via
        ops.aiming (Newton through the jitted trace + bracketed
        bisection); fields whose converged residual exceeds `tol` --
        and ineligible systems -- fall back to the host scipy path.
        Returns (z (F,), boxes (F, 2, 2)).
        """
        import warnings
        fields = np.atleast_2d(np.asarray(fields, dtype=float))
        pupil = self.object.pupil
        rim = stop == -1
        eligible = pupil.aim and not pupil.telecentric
        if eligible:
            from .ops.aiming import pupil_batched, aim_chief_batched
            from .ops.kernels import specialize
            if l is None:
                l = self.wavelengths[0]
            table = self.table(l)
            kw = dict(finite=bool(self.object.finite),
                      projection=self.object.projection,
                      specs=specialize(table))
            if self.object.finite:
                kw["radius"] = self.object.radius
            else:
                kw["slope"] = np.tan(self.object.angle)
            stop_idx = self.stop if stop in (-1, None) else stop
            if chief_only:
                z, chief_r = aim_chief_batched(
                    table, fields, pupil.distance, stop_idx,
                    with_residual=True, **kw)
                boxes = np.broadcast_to(
                    pupil.radius*np.array([[-1., -1.], [1., 1.]]),
                    (len(fields), 2, 2)).copy()
                width = np.zeros(len(fields))
            else:
                z, boxes, (chief_r, width) = pupil_batched(
                    table, fields, pupil.distance, pupil.radius,
                    stop_idx, rim=rim, with_residuals=True, **kw)
            z, boxes = np.array(z), np.array(boxes)
            bad = (np.asarray(chief_r) > tol) | (np.asarray(width) > tol)
        else:
            z = np.empty(len(fields))
            boxes = np.empty((len(fields), 2, 2))
            bad = np.ones(len(fields), bool)
        if bad.any():
            if eligible:
                warnings.warn(
                    "batched aiming did not converge for %d/%d fields; "
                    "using the host solver there"
                    % (bad.sum(), len(fields)))
            for i in np.flatnonzero(bad):
                z[i], boxes[i] = self.pupil(tuple(fields[i]), l=l,
                                            stop=stop)
        return z, boxes
