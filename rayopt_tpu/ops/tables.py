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
    tilt:       (S, 3)  differentiable pose DELTA: rotation vector
                        (radians; axis * angle) applied in the row's
                        nominal local frame AFTER the baked rotation
                        (rot_eff = rodrigues(tilt) @ rot, lowered
                        inside the trace graph by lower_pose).  Zero
                        (the default) = nominal pose; for an untilted
                        element a single-axis tilt equals the host's
                        euler `angles` about that axis (reference
                        elements.py:116-147).  Stored as a delta so
                        perturb/optimize/differentiate on `tilt` works
                        on any system without touching the baked rot
    decenter:   (S, 3)  differentiable pose delta: lab-frame vertex
                        shift added to `offset` (x/y = decenter,
                        z = despace).  Note `distance` (path
                        bookkeeping) does not track a z-decenter
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
    tilt: jnp.ndarray = None
    decenter: jnp.ndarray = None

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
               xy_poly=None, tilt=None, decenter=None,
               dtype=np.float64):
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
        tilt=arr(tilt, 0., (s, 3)),
        decenter=arr(decenter, 0., (s, 3)),
    )


def _rodrigues(v, xp):
    """Rodrigues rotation matrices from rotation vectors: (..., 3) ->
    (..., 3, 3), R = I + a [v]x + b [v]x^2 with a = sin(th)/th,
    b = (1-cos(th))/th^2, th = |v|.  Smooth (NaN-free gradients)
    through th = 0 via guarded branches + Taylor series, so jax.grad
    at the nominal (zero-tilt) pose is exact.  `xp` is numpy or
    jax.numpy (the host/concrete and traced twins share this body)."""
    v = xp.asarray(v)
    t = (v*v).sum(-1)
    small = t < 1e-12
    ts = xp.where(small, 1., t)         # guards sqrt/div (and their
    th = xp.sqrt(ts)                    # gradients) at t == 0
    a = xp.where(small, 1. - t/6. + t*t/120., xp.sin(th)/th)
    b = xp.where(small, .5 - t/24. + t*t/720.,
                 (1. - xp.cos(th))/ts)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = xp.zeros_like(x)
    kx = xp.stack([
        xp.stack([zero, -z, y], -1),
        xp.stack([z, zero, -x], -1),
        xp.stack([-y, x, zero], -1)], -2)
    eye = xp.eye(3, dtype=kx.dtype)
    return (eye + a[..., None, None]*kx
            + b[..., None, None]*(kx @ kx))


def rodrigues(v):
    """Differentiable Rodrigues rotation matrices (jnp; see
    _rodrigues).  The convention matches the host's euler `angles`
    for a single-axis rotation: rodrigues((ax, 0, 0)) ==
    euler_matrix(ax, 0, 0, 'rxyz')."""
    return _rodrigues(v, jnp)


def lower_pose(table):
    """Fold the differentiable pose deltas (tilt, decenter) into the
    baked rot/offset: rot_eff = rodrigues(tilt) @ rot, offset_eff =
    offset + decenter.  Returns a table with zero tilt/decenter
    (idempotent).

    Called at the top of every trace engine.  Under jit the Rodrigues
    lowering is part of the differentiated graph, so jax.grad /
    sensitivity / MC tolerancing w.r.t. table.tilt and table.decenter
    give exact pose derivatives through the generic (scan) engines.
    The statically specialized engines derive their `rotated` /
    `off_axis` flags from the pose-folded table (kernels.specialize
    lowers first), so a CONCRETELY tilted/decentered row traces
    exactly on every engine; gradients AT the untilted point through a
    specs-specialized graph are baked out like any other specialized
    parameter (seed the tilt off zero or use the scan path).

    Host-side with concrete all-zero poses this is a no-op (the many
    tiny host-driven traces pay nothing); concrete nonzero NumPy
    tables fold in NumPy so nothing round-trips to a remote device.
    """
    import jax
    tilt = getattr(table, "tilt", None)
    dec = getattr(table, "decenter", None)
    if tilt is None and dec is None:
        return table
    involved = [f for f in (tilt, dec, table.rot, table.offset)
                if f is not None]
    traced = any(isinstance(f, jax.core.Tracer) for f in involved)
    if not traced:
        z_t = tilt is None or not np.any(np.asarray(tilt))
        z_d = dec is None or not np.any(np.asarray(dec))
        if z_t and z_d:
            return table
        xp = (np if all(isinstance(f, np.ndarray) or np.isscalar(f)
                        for f in involved) else jnp)
    else:
        xp = jnp
    kw = {}
    if tilt is not None:
        kw["rot"] = _rodrigues(tilt, xp) @ xp.asarray(table.rot)
        kw["tilt"] = xp.zeros_like(xp.asarray(tilt))
    if dec is not None:
        kw["offset"] = xp.asarray(table.offset) + xp.asarray(dec)
        kw["decenter"] = xp.zeros_like(xp.asarray(dec))
    return table.replace(**kw)


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
