"""SurfaceTable: the struct-of-arrays system description.

This is the TPU-native replacement of the reference's list-of-Element
objects (reference system.py:35, elements.py:179): every per-surface
quantity lives in one array with the surface index as the leading axis,
so the whole sequential trace is a single `lax.scan` over rows and rays
stay batched on the vector unit.

A table is built per trace wavelength (refractive indices and the
refraction ratio mu are baked in as arrays).  It is a pytree, so it can
be donated/sharded/differentiated: `jax.grad` w.r.t. `curvature`,
`distance`, `conic`, `aspherics`, ... flows through the trace engines.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class SurfaceTable(NamedTuple):
    """Per-surface arrays; leading axis = surface index (0 = object).

    curvature:  (S,)    vertex curvature 1/roc
    conic:      (S,)    conic constant kappa
    aspherics:  (S, K)  even-asphere coefficients (padded with zeros);
                        aspherics[:, i] multiplies r**(2*i + 2)
    aspherics_odd: (S, K2) odd-asphere coefficients;
                        aspherics_odd[:, j] multiplies r**(2*j + 1)
                        (the odd-power half of Zemax ODDASPHE terms)
    offset:     (S, 3)  vertex offset from previous vertex (lab frame)
    rot:        (S,3,3) surface-normal rotation matrix (identity if none)
    radius:     (S,)    aperture radius for clipping (inf = open)
    alternate:  (S,)    1. where the alternate (far) conic intersection
                        is selected (hyperhemispheres), else 0.
    mu:         (S,)    refraction ratio n_before/n_after; -1 for mirrors;
                        1 for bare interfaces (reference elements.py:283)
    n_before:   (S,)    refractive index before the surface
    n_after:    (S,)    refractive index after the surface
    distance:   (S,)    |offset| along the axis (for path/track bookkeeping)
    curvature_dx:(S,)   x-minus-y vertex-curvature split of anamorphic
                        (biconic/cylindrical) surfaces: the x-axis
                        curvature is curvature + curvature_dx.  Zero
                        (the default) = rotationally symmetric row.
                        Stored as a delta so shared edits -- replace/
                        perturb/optimize on `curvature` -- move both
                        axes rigidly, as a radius tolerance does
    conic_dx:   (S,)    x-minus-y conic split (see curvature_dx)
    toroidal:   (S,)    1. where the row is a toroid (the y-z curve
                        swept at rotation curvature cr = curvature +
                        curvature_dx) instead of a biconic; 0 default
    grating_dy: (S,)    dimensionless diffraction term of a linear
                        grating ruled along x (dispersion in y):
                        m * lambda * G / n_after, baked per trace
                        wavelength; 0 = no grating
    doe:        (S, KD) radial diffractive-phase kick potential
                        (kinoform / Zemax Binary 2): doe[:, i]
                        multiplies r**(2i+2) of psi(r^2) =
                        m * lambda * phi(r) / (2 pi n_after), baked
                        per trace wavelength; zero-width = no DOE
    xy_poly:    (S, KX) freeform XY-monomial sag coefficients in the
                        triangular ordering of kernels._xy_terms
                        (degree d = 1..D, within d from x^d to y^d;
                        KX = D(D+3)/2, no constant term), in lens
                        units (denormalized): sag += sum c x^i y^j.
                        Zero-width = no freeform rows
    """

    curvature: jnp.ndarray
    conic: jnp.ndarray
    aspherics: jnp.ndarray
    aspherics_odd: jnp.ndarray
    offset: jnp.ndarray
    rot: jnp.ndarray
    radius: jnp.ndarray
    alternate: jnp.ndarray
    mu: jnp.ndarray
    n_before: jnp.ndarray
    n_after: jnp.ndarray
    distance: jnp.ndarray
    curvature_dx: jnp.ndarray = None
    conic_dx: jnp.ndarray = None
    toroidal: jnp.ndarray = None
    grating_dy: jnp.ndarray = None
    doe: jnp.ndarray = None
    xy_poly: jnp.ndarray = None

    @property
    def nsurfaces(self):
        return self.curvature.shape[0]

    @property
    def dtype(self):
        return self.curvature.dtype

    def astype(self, dtype):
        return SurfaceTable(*(jnp.asarray(f, dtype=dtype) for f in self))

    def replace(self, **kw):
        return self._replace(**kw)


def make_table(curvature, conic=None, aspherics=None, offset=None,
               rot=None, radius=None, alternate=None, mu=None,
               n_before=None, n_after=None, distance=None,
               aspherics_odd=None, curvature_dx=None, conic_dx=None,
               toroidal=None, grating_dy=None, doe=None,
               xy_poly=None, dtype=np.float64):
    """Assemble a SurfaceTable from plain arrays, filling defaults."""
    curvature = np.asarray(curvature, dtype=dtype)
    s = curvature.shape[0]

    def arr(x, default, shape):
        # stays host-side NumPy: the consuming jit commits it to the
        # right device (remote-accelerator roundtrips are expensive for
        # the many tiny host-driven traces, e.g. pupil aiming)
        if x is None:
            out = np.broadcast_to(np.asarray(default, dtype=dtype), shape)
        else:
            out = np.asarray(x, dtype=dtype)
            assert out.shape == shape, (out.shape, shape)
        return np.ascontiguousarray(out)

    if aspherics is None:
        aspherics = np.zeros((s, 0), dtype=dtype)
    else:
        aspherics = np.asarray(aspherics, dtype=dtype).reshape(s, -1)
    if aspherics_odd is None:
        aspherics_odd = np.zeros((s, 0), dtype=dtype)
    else:
        aspherics_odd = np.asarray(aspherics_odd,
                                   dtype=dtype).reshape(s, -1)
    if doe is None:
        doe = np.zeros((s, 0), dtype=dtype)
    else:
        doe = np.asarray(doe, dtype=dtype).reshape(s, -1)
    if xy_poly is None:
        xy_poly = np.zeros((s, 0), dtype=dtype)
    else:
        xy_poly = np.asarray(xy_poly, dtype=dtype).reshape(s, -1)
        from .kernels import xy_degree
        xy_degree(xy_poly.shape[1])  # validate triangular width
    if offset is None and distance is not None:
        offset = np.zeros((s, 3), dtype=dtype)
        offset[:, 2] = distance
    if distance is None and offset is not None:
        distance = np.linalg.norm(np.asarray(offset), axis=-1)
    return SurfaceTable(
        curvature=np.ascontiguousarray(curvature),
        conic=arr(conic, 0., (s,)),
        aspherics=np.ascontiguousarray(aspherics),
        aspherics_odd=np.ascontiguousarray(aspherics_odd),
        offset=arr(offset, 0., (s, 3)),
        rot=arr(rot, np.eye(3, dtype=dtype), (s, 3, 3)),
        radius=arr(radius, np.inf, (s,)),
        alternate=arr(alternate, 0., (s,)),
        mu=arr(mu, 1., (s,)),
        n_before=arr(n_before, 1., (s,)),
        n_after=arr(n_after, 1., (s,)),
        distance=arr(distance, 0., (s,)),
        curvature_dx=arr(curvature_dx, 0., (s,)),
        conic_dx=arr(conic_dx, 0., (s,)),
        toroidal=arr(toroidal, 0., (s,)),
        grating_dy=arr(grating_dy, 0., (s,)),
        doe=np.ascontiguousarray(doe),
        xy_poly=np.ascontiguousarray(xy_poly),
    )


def is_anamorphic(table):
    """Host-side: True when any row needs the extended surface
    vocabulary -- anamorphic figure (biconic/cylinder/toroid) or a
    diffraction grating.  This is the derivation for the engines'
    static `biconic=` flag (the Pallas f32 path auto-derives its
    specs from it, df32.plan branches on it; only the polynomial
    trace still rejects non-symmetric rows).

    Tracer-safe: a table whose fields are already traced (inside a
    caller's jit) reports False -- the static engine flag must be
    derived from the concrete table BEFORE entering jit."""
    import jax
    dx = getattr(table, "curvature_dx", None)
    if dx is None or isinstance(dx, jax.core.Tracer):
        return False
    tor = getattr(table, "toroidal", None)
    grat = getattr(table, "grating_dy", None)
    doe = getattr(table, "doe", None)
    xy = getattr(table, "xy_poly", None)
    return bool(np.any(np.asarray(dx) != 0)
                or np.any(np.asarray(table.conic_dx) != 0)
                or (tor is not None and np.any(np.asarray(tor) != 0))
                or (grat is not None
                    and np.any(np.asarray(grat) != 0))
                or (doe is not None and np.asarray(doe).size
                    and np.any(np.asarray(doe) != 0))
                or (xy is not None and np.asarray(xy).size
                    and np.any(np.asarray(xy) != 0)))
