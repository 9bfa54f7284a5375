"""Pallas TPU kernel: the fused multi-surface trace.

One grid program owns a tile of rays; the six component vectors are
staged into VMEM once and the full (statically unrolled, spec-
specialized) transfer-intercept-refract chain runs on the tile before
it is written back -- the Pallas counterpart of
ops.geometric.trace_components_final(unroll=True), guaranteeing the
single-HBM-pass property instead of relying on XLA fusion.

Surface parameters are tiny; they ride along as whole-array VMEM
operands and are read per-surface as scalars inside the kernel.

Falls back transparently (interpret mode) off-TPU; parity with the
XLA path is tested in tests/test_pallas.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import kernels as K

DEFAULT_TILE = 8*1024


class _SurfRow:
    """Scalar view of one surface row read inside the kernel."""

    def __init__(self, refs, j, dtype):
        self._refs = refs
        self._j = j
        self._dtype = dtype

    def __getattr__(self, name):
        if (name in ("aspherics", "aspherics_odd", "doe", "xy_poly")
                and name not in self._refs):
            # zero-width blocks are not representable; absent
            # aspherics are a static property of the table
            return jnp.zeros((0,), self._dtype)
        return self._refs[name][self._j]


_FIELDS = ("curvature", "conic", "aspherics", "aspherics_odd",
           "offset", "rot", "radius", "alternate", "mu", "n_before",
           "n_after")


def _fields_for(table, specs):
    """The table fields the kernel must carry: the base set minus
    zero-width aspheric blocks, plus the extended-vocabulary columns
    (anamorphic curvature/conic splits, grating term) when any spec
    row uses them."""
    fields = [f for f in _FIELDS
              if f not in ("aspherics", "aspherics_odd")
              or getattr(table, f).shape[1]]
    if specs is not None:
        if any(s.biconic or s.toroidal for s in specs):
            fields += ["curvature_dx", "conic_dx"]
        if any(s.grating for s in specs):
            fields += ["grating_dy"]
        if any(s.doe for s in specs):
            fields += ["doe"]
        if any(s.freeform for s in specs):
            fields += ["xy_poly"]
    return tuple(fields)


def _resolve_specs(table, specs):
    """Anamorphic/grating rows need the static per-surface
    specialization; derive it from the concrete table when the caller
    did not pass one.  (Inside a caller's jit the table is traced and
    is_anamorphic is False -- the static specs must then be passed
    explicitly, as with the other engines' `biconic=` flag.)"""
    from .tables import is_anamorphic
    if specs is None and is_anamorphic(table):
        specs = K.specialize(table)
    return specs


def _trace_kernel(specs, clip, nsurf, fields, *refs):
    param_refs = dict(zip(fields, refs[:len(fields)]))
    comp_refs = refs[len(fields):len(fields) + 6]
    out_refs = refs[len(fields) + 6:]
    state = tuple(r[:] for r in comp_refs)
    dtype = state[0].dtype
    if specs is None or specs[0].rotated:
        r0 = param_refs["rot"][0]
        state = (*K.rot_apply_t(r0, *state[:3]),
                 *K.rot_apply_t(r0, *state[3:]))
    tacc = jnp.zeros_like(state[0])
    for j in range(1, nsurf):
        surf = _SurfRow(param_refs, j, dtype)
        if specs is None:
            state, (yl, ul, il, t) = K.surface_step(state, surf, clip)
        else:
            state, (yl, ul, il, t) = K.surface_step_spec(
                state, surf, specs[j], clip)
        tacc = tacc + t
    if specs is None or specs[nsurf - 1].rotated:
        rl = param_refs["rot"][nsurf - 1]
        yl = K.rot_apply(rl, *state[:3])
        ul = K.rot_apply(rl, *state[3:])
    else:
        yl, ul = state[:3], state[3:]
    for r, v in zip(out_refs, (*yl, *ul, tacc)):
        r[:] = v


def pallas_trace_final(table, state, clip=False, specs=None,
                       tile=DEFAULT_TILE, interpret=False):
    """Pallas version of trace_components_final: state is the 6-tuple
    of (N,) ray components; returns ((x, y, z, ux, uy, uz), t).

    Covers the full surface vocabulary: anamorphic (biconic/cylinder/
    toroid), grating, and odd-aspheric rows dispatch through the
    static SurfaceSpec flags (auto-derived from a concrete table).
    Pose deltas (tilt/decenter) are folded into rot/offset first."""
    from .tables import lower_pose
    table = lower_pose(table)
    return _pallas_trace_final(table, state, clip=clip,
                               specs=_resolve_specs(table, specs),
                               tile=tile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("clip", "specs", "tile",
                                             "interpret"))
def _pallas_trace_final(table, state, clip=False, specs=None,
                        tile=DEFAULT_TILE, interpret=False):
    n = state[0].shape[0]
    nsurf = table.curvature.shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    # Mosaic wants >= 2-D blocks: view components as (N/128, 128)
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)

    fields = _fields_for(table, specs)
    param_specs = [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,)*nd)
        for a in (getattr(table, f) for f in fields)]
    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))

    out_shape = [jax.ShapeDtypeStruct((n // 128, 128), dtype)
                 for _ in range(7)]
    params = [jnp.asarray(getattr(table, f), dtype=dtype)
              if getattr(table, f).dtype.kind == "f"
              else getattr(table, f) for f in fields]

    # Mosaic rejects i64 index-map results when jax_enable_x64 is on;
    # trace the f32 path with x64 off (f64 interpret-mode runs keep it)
    import contextlib
    ctx = (jax.enable_x64(False) if dtype == jnp.float32
           else contextlib.nullcontext())
    with ctx:
        outs = pl.pallas_call(
            functools.partial(_trace_kernel, specs, clip, nsurf,
                              fields),
            grid=grid,
            in_specs=param_specs + [comp_spec]*6,
            out_specs=[comp_spec]*7,
            out_shape=out_shape,
            interpret=interpret,
        )(*params, *state2)
    return tuple(o.reshape(n) for o in outs[:6]), outs[6].reshape(n)


def _merit_kernel(specs, clip, nsurf, fields, *refs):
    """Trace a tile and reduce it to spot-moment partial sums in-
    kernel: (count, sum x, sum y, sum x^2, sum y^2) per grid step.
    NaN (vignetted/missed) rays are masked out of every moment."""
    param_refs = dict(zip(fields, refs[:len(fields)]))
    comp_refs = refs[len(fields):len(fields) + 6]
    out_ref = refs[len(fields) + 6]
    state = tuple(r[:] for r in comp_refs)
    dtype = state[0].dtype
    if specs is None or specs[0].rotated:
        r0 = param_refs["rot"][0]
        state = (*K.rot_apply_t(r0, *state[:3]),
                 *K.rot_apply_t(r0, *state[3:]))
    out_ref[:, :] = _moment_row(state, specs, param_refs, nsurf,
                                dtype, clip)


def pallas_trace_merit(table, state, clip=False, specs=None,
                       tile=DEFAULT_TILE, interpret=False):
    """Fused trace + spot-moment reduction: each ray tile is traced
    VMEM-resident and collapsed to five partial sums before leaving
    the kernel, so HBM sees only the 6 input reads -- no per-ray
    writeback at all (vs 7 (N,) outputs for pallas_trace_final).

    Measured on v5e the trace is VPU-bound, so this is NOT faster
    than trace-then-reduce (67.0 vs 67.2 ms at 2^27 rays); its value
    is memory footprint -- no (7, N) output ever materializes, so
    merit evaluation fits ~2x the rays per chip.

    Returns (count, sum_x, sum_y, sum_xx, sum_yy) totals over the
    bundle; spot_rms_from_moments turns them into the RMS.  Forward
    (monitoring/merit) use only -- not differentiable."""
    return _pallas_trace_merit(table, state, clip=clip,
                               specs=_resolve_specs(table, specs),
                               tile=tile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("clip", "specs", "tile",
                                             "interpret"))
def _pallas_trace_merit(table, state, clip=False, specs=None,
                        tile=DEFAULT_TILE, interpret=False):
    n = state[0].shape[0]
    nsurf = table.curvature.shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)

    fields = _fields_for(table, specs)
    param_specs = [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,)*nd)
        for a in (getattr(table, f) for f in fields)]
    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_spec = pl.BlockSpec((8, 128), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((n // tile*8, 128), dtype)
    params = [jnp.asarray(getattr(table, f), dtype=dtype)
              if getattr(table, f).dtype.kind == "f"
              else getattr(table, f) for f in fields]

    import contextlib
    ctx = (jax.enable_x64(False) if dtype == jnp.float32
           else contextlib.nullcontext())
    with ctx:
        out = pl.pallas_call(
            functools.partial(_merit_kernel, specs, clip, nsurf,
                              fields),
            grid=grid,
            in_specs=param_specs + [comp_spec]*6,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*params, *state2)
    tot = out.sum(0)
    return tot[0], tot[1], tot[2], tot[3], tot[4]


def spot_rms_from_moments(count, sx, sy, sxx, syy):
    """Centroid-referenced spot RMS from the fused-kernel moments."""
    cx, cy = sx/count, sy/count
    var = (sxx + syy)/count - (cx*cx + cy*cy)
    return jnp.sqrt(jnp.maximum(var, 0.))


def _moment_row(state, specs, param_refs, nsurf, dtype, clip=False):
    """Trace a VMEM-resident tile to the last surface and reduce it to
    the five spot moments packed into an (8, 128) output row."""
    for j in range(1, nsurf):
        surf = _SurfRow(param_refs, j, dtype)
        if specs is None:
            state, _ = K.surface_step(state, surf, clip)
        else:
            state, _ = K.surface_step_spec(state, surf, specs[j],
                                           clip)
    if specs is None or specs[nsurf - 1].rotated:
        rl = param_refs["rot"][nsurf - 1]
        yl = K.rot_apply(rl, *state[:3])
        ul = K.rot_apply(rl, *state[3:])
    else:
        yl, ul = state[:3], state[3:]
    x, y = yl[0], yl[1]
    good = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(ul[2])
    xg = jnp.where(good, x, 0.)
    yg = jnp.where(good, y, 0.)
    moments = (good.astype(dtype).sum(), xg.sum(), yg.sum(),
               (xg*xg).sum(), (yg*yg).sum())
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    row = jnp.zeros((8, 128), dtype)
    for i, v in enumerate(moments):
        row = jnp.where((rowi == 0) & (lane == i), v, row)
    return row


def _multi_kernel(specs, nsurf, nlam, fields, merit, *refs):
    """Polychromatic kernel body: ONE ray tile staged into VMEM runs
    the full unrolled chain once per wavelength table (the input is
    read from HBM once for all wavelengths).  merit=True reduces each
    wavelength to spot moments in-kernel (no per-ray writeback)."""
    param_refs = dict(zip(fields, refs[:len(fields)]))
    comp_refs = refs[len(fields):len(fields) + 6]
    out_refs = refs[len(fields) + 6:]
    state0 = tuple(r[:] for r in comp_refs)
    dtype = state0[0].dtype
    for li in range(nlam):
        refs_l = {f: r[li] for f, r in param_refs.items()}
        state = state0
        if specs is None or specs[0].rotated:
            r0 = refs_l["rot"][0]
            state = (*K.rot_apply_t(r0, *state[:3]),
                     *K.rot_apply_t(r0, *state[3:]))
        if merit:
            out_refs[li][:, :] = _moment_row(state, specs, refs_l,
                                             nsurf, dtype)
            continue
        tacc = jnp.zeros_like(state[0])
        for j in range(1, nsurf):
            surf = _SurfRow(refs_l, j, dtype)
            if specs is None:
                state, (yl, ul, il, t) = K.surface_step(state, surf,
                                                        False)
            else:
                state, (yl, ul, il, t) = K.surface_step_spec(
                    state, surf, specs[j], False)
            tacc = tacc + t
        if specs is None or specs[nsurf - 1].rotated:
            rl = refs_l["rot"][nsurf - 1]
            yl = K.rot_apply(rl, *state[:3])
            ul = K.rot_apply(rl, *state[3:])
        else:
            yl, ul = state[:3], state[3:]
        for r, v in zip(out_refs[7*li:7*li + 7], (*yl, *ul, tacc)):
            r[:] = v


def pallas_trace_multi(tables, state, specs=None, tile=DEFAULT_TILE,
                       interpret=False, merit=False):
    """Polychromatic Pallas trace: `tables` carries a leading
    wavelength axis (System.tables); ONE ray tile is staged into VMEM
    and traced through every wavelength's surface chain before
    writeback, so HBM reads the bundle once for all wavelengths --
    the chromatic-merit HBM lever (the monochromatic kernel re-reads
    the rays per wavelength).

    merit=False: returns a tuple of per-wavelength
    ((x, y, z, ux, uy, uz), t) results (7 (N,) outputs each).
    merit=True: reduces each wavelength to the five spot moments
    in-kernel (count, sum x, sum y, sum x^2, sum y^2) -- no per-ray
    writeback at all; feed spot_rms_from_moments per wavelength.

    The static specs are shared across wavelengths (geometry is
    identical; only indices / grating terms / DOE kicks differ)."""
    return _pallas_trace_multi(tables, state,
                               specs=_resolve_specs(
                                   jax.tree_util.tree_map(
                                       lambda a: a[0], tables), specs),
                               tile=tile, interpret=interpret,
                               merit=merit)


@functools.partial(jax.jit, static_argnames=("specs", "tile",
                                             "interpret", "merit"))
def _pallas_trace_multi(tables, state, specs=None, tile=DEFAULT_TILE,
                        interpret=False, merit=False):
    n = state[0].shape[0]
    nlam = tables.curvature.shape[0]
    nsurf = tables.curvature.shape[1]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)

    fields = _fields_for(jax.tree_util.tree_map(lambda a: a[0],
                                                tables), specs)
    param_specs = [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,)*nd)
        for a in (getattr(tables, f) for f in fields)]
    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    if merit:
        out_spec = [pl.BlockSpec((8, 128), lambda i: (i, 0))]*nlam
        out_shape = [jax.ShapeDtypeStruct((n // tile*8, 128), dtype)
                     for _ in range(nlam)]
    else:
        out_spec = [comp_spec]*(7*nlam)
        out_shape = [jax.ShapeDtypeStruct((n // 128, 128), dtype)
                     for _ in range(7*nlam)]
    params = [jnp.asarray(getattr(tables, f), dtype=dtype)
              if getattr(tables, f).dtype.kind == "f"
              else getattr(tables, f) for f in fields]

    import contextlib
    ctx = (jax.enable_x64(False) if dtype == jnp.float32
           else contextlib.nullcontext())
    with ctx:
        outs = pl.pallas_call(
            functools.partial(_multi_kernel, specs, nsurf, nlam,
                              fields, merit),
            grid=grid,
            in_specs=param_specs + [comp_spec]*6,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*params, *state2)
    if merit:
        return tuple(tuple(o.sum(0)[i] for i in range(5))
                     for o in outs)
    return tuple(
        (tuple(o.reshape(n) for o in outs[7*li:7*li + 6]),
         outs[7*li + 6].reshape(n))
        for li in range(nlam))
