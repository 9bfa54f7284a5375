"""Analytic-adjoint Pallas merit kernel: differentiable fused
spot-RMS with an in-kernel backward pass.

The XLA reverse-mode trace stores every per-surface intermediate as a
VJP residual in HBM (~56 arrays per surface: 22.6 GB at 2^23 rays on
the double Gauss), which caps gradient-step bundles at 2^22 rays and
makes the step residual-bandwidth-bound.  This module removes the
residuals entirely:

* forward: the fused Pallas merit kernel (trace + weighted spot-moment
  reduction, no per-ray writeback) -- HBM sees only the input reads.
* backward (jax.custom_vjp): a second Pallas kernel RECOMPUTES the
  trace tile-by-tile in VMEM, saving only the per-surface ray states
  (6 x nsurf x tile floats, ~2.5 MB at tile=8192 on a 13-row table),
  then runs the chained per-surface VJPs in reverse -- built by
  jax.vjp of the same kernels.surface_step_spec the forward uses, so
  the adjoint physics can never drift from the primal -- and reduces
  the parameter cotangents over the tile before writing a single
  small block back.  Per-ray state and weight cotangents stream out
  in one pass.

HBM traffic per gradient step: read the bundle twice, write the
cotangents once -- independent of surface count, same asymptotics as
the forward kernel.  This is what lets optimization merits run at
2^26+ rays per step (the XLA path OOMs at 2^23).

Vignetted/missed (NaN) rays are handled inside the backward kernel by
the same dead-ray substitution parallel.grad.spot_rms performs
globally: each tile nominates a surviving donor ray, dead slots are
replaced by the donor's (finite) per-surface states, and their
cotangents are zero -- so no NaN ever enters the reverse sweep.

Gradient semantics are those of the SPECIALIZED engine (the same as
spot_rms(specs=..., unroll=True)): a parameter the static
specialization bakes out -- the conic of an exactly-spherical row, the
transverse offset of an on-axis row, the aspherics of a row without
any -- carries a structurally zero gradient.  To optimize such a
parameter away from its baked point, seed it off zero (respecialize)
or use the generic scan engine.

Parity with jax.grad(parallel.grad.spot_rms(specs, unroll=True)) is
pinned in tests/test_pallas_grad.py (interpret mode, f64).  Replaces
the merit gradient of the reference's finite-difference scipy loop
(reference optimize.py:93-161) at production ray counts.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import kernels as K
from .pallas_trace import (DEFAULT_TILE, _fields_for, _resolve_specs,
                           spot_rms_from_moments)

#: kernel-carried table fields that never receive cotangents
#: (aperture/branch selectors).  `rot` is differentiable ON DEMAND:
#: when the caller traces it (pose gradients -- table.tilt lowered by
#: tables.lower_pose into rot inside the XLA graph) AND some spec row
#: is `rotated`, the adjoint reads it as nine scalars and returns its
#: cotangent, which the Rodrigues transpose outside the kernel turns
#: into d/d(tilt).  A concrete rot stays a zero-cost nondiff read.
_NONDIFF = ("radius", "alternate")


@jax.tree_util.register_pytree_node_class
class Coeffs:
    """A tuple of per-surface scalars presented with just enough of
    the jnp array surface (shape[-1], [..., i] indexing) for the
    kernels' polynomial evaluators.

    The adjoint kernel reads every surface parameter as a SCALAR
    before differentiating the step: jax.vjp of an array index is a
    scatter-add, which Mosaic does not lower, while scalar reads
    transpose to pure elementwise math.  Registered as a pytree node
    (not a plain tuple) so jax.vjp/custom_jvp reconstruct Coeffs --
    and its .shape -- on the other side of a transform boundary.
    """

    def __init__(self, vals):
        self.vals = tuple(vals)

    @property
    def shape(self):
        return (len(self.vals),)

    def __len__(self):
        return len(self.vals)

    def __getitem__(self, idx):
        if isinstance(idx, tuple):  # coeffs[..., i]
            idx = idx[-1]
        return self.vals[idx]

    def tree_flatten(self):
        return self.vals, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)


@jax.tree_util.register_pytree_node_class
class Mat3:
    """A 3x3 matrix held as nine scalars with just enough of the jnp
    surface ([i, j] indexing) for kernels.rot_apply(_t) -- the rot
    twin of Coeffs: jax.vjp of an array index is a scatter-add Mosaic
    does not lower, while scalar reads transpose to elementwise math.
    Row-major: vals[3*i + j]."""

    def __init__(self, vals):
        self.vals = tuple(vals)

    def __getitem__(self, idx):
        i, j = idx
        return self.vals[3*i + j]

    def tree_flatten(self):
        return self.vals, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)


class _Vals:
    """Attribute view of one surface row from plain traced values
    (differentiable dict + nondifferentiable dict); absent coefficient
    columns read as empty, like pallas_trace._SurfRow."""

    def __init__(self, diff, nondiff):
        d = dict(nondiff)
        d.update(diff)
        object.__setattr__(self, "_d", d)

    def __getattr__(self, name):
        d = object.__getattribute__(self, "_d")
        if name in d:
            return d[name]
        if name in ("aspherics", "aspherics_odd", "doe", "xy_poly"):
            return Coeffs(())
        raise AttributeError(name)


def _read_row(param_refs, fields, j, rot_diff=False):
    """Read surface row j out of the kernel refs as scalar leaves:
    (diff dict, nondiff dict).  rot is a raw (3, 3) nondiff read
    unless rot_diff (pose gradients): then nine Mat3 scalars in the
    diff dict."""
    diff, nondiff = {}, {}
    for f in fields:
        ref = param_refs[f]
        if f == "rot":
            row = ref[j]
            if rot_diff:
                diff[f] = Mat3(tuple(row[a, b] for a in range(3)
                                     for b in range(3)))
            else:
                nondiff[f] = row
        elif f in _NONDIFF:
            nondiff[f] = ref[j]
        elif f == "offset":
            row = ref[j]
            diff[f] = Coeffs((row[0], row[1], row[2]))
        elif f in ("aspherics", "aspherics_odd", "doe", "xy_poly"):
            row = ref[j]
            diff[f] = Coeffs(tuple(row[i]
                                   for i in range(ref.shape[-1])))
        else:
            diff[f] = ref[j]
    return diff, nondiff


def _esize(table_or_params, f):
    """Number of scalar slots one surface row of field f occupies."""
    if f == "offset":
        return 3
    if f == "rot":
        return 9
    if f in ("aspherics", "aspherics_odd", "doe", "xy_poly"):
        return int(table_or_params[f].shape[-1])
    return 1


def _slot_count(params, diff_fields, nsurf):
    return sum(_esize(params, f)*(nsurf - 1) for f in diff_fields)


def _wmoment_final(state, specs, nsurf, rot_last):
    """Final local-frame transverse coordinates and liveness mask."""
    if specs[nsurf - 1].rotated:
        yl = K.rot_apply(rot_last, *state[:3])
        ul = K.rot_apply(rot_last, *state[3:])
    else:
        yl, ul = state[:3], state[3:]
    x, y = yl[0], yl[1]
    good = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(ul[2])
    return x, y, good


def _wmoments_one(param_refs, specs, clip, nsurf, state_in, w):
    """Trace one VMEM-resident tile through one surface chain and
    reduce it to the five WEIGHTED spot moments (sum w, sum wx,
    sum wy, sum wx^2, sum wy^2); dead rays drop out at zero weight."""
    from .pallas_trace import _SurfRow
    dtype = state_in[0].dtype
    state = state_in
    if specs[0].rotated:
        r0 = param_refs["rot"][0]
        state = (*K.rot_apply_t(r0, *state[:3]),
                 *K.rot_apply_t(r0, *state[3:]))
    for j in range(1, nsurf):
        surf = _SurfRow(param_refs, j, dtype)
        state, _ = K.surface_step_spec(state, surf, specs[j], clip)
    x, y, good = _wmoment_final(state, specs, nsurf,
                                param_refs["rot"][nsurf - 1])
    wg = jnp.where(good, w, 0.)
    xg = jnp.where(good, x, 0.)
    yg = jnp.where(good, y, 0.)
    return (wg.sum(), (wg*xg).sum(), (wg*yg).sum(),
            (wg*xg*xg).sum(), (wg*yg*yg).sum())


def _pack_rows(values, rows, dtype):
    """Scatter a python list of scalars into an (rows, 128) block."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    out = jnp.zeros((rows, 128), dtype)
    for i, v in enumerate(values):
        out = jnp.where((rowi == i // 128) & (lane == i % 128), v,
                        out)
    return out


def _fwd_kernel(specs, clip, nsurf, fields, *refs):
    """Forward: trace the tile and reduce to weighted spot moments."""
    param_refs = dict(zip(fields, refs[:len(fields)]))
    comp_refs = refs[len(fields):len(fields) + 6]
    w_ref = refs[len(fields) + 6]
    out_ref = refs[len(fields) + 7]
    state = tuple(r[:] for r in comp_refs)
    w = w_ref[:]
    moments = _wmoments_one(param_refs, specs, clip, nsurf, state, w)
    out_ref[:, :] = _pack_rows(moments, 8, state[0].dtype)


def _fwd_kernel_multi(specs, clip, nsurf, nlam, fields, *refs):
    """Polychromatic forward: ONE ray tile staged into VMEM runs the
    chain once per wavelength table; per-wavelength weighted moments
    land in per-wavelength output rows (the bundle is read from HBM
    once for all wavelengths)."""
    param_refs = dict(zip(fields, refs[:len(fields)]))
    comp_refs = refs[len(fields):len(fields) + 6]
    w_ref = refs[len(fields) + 6]
    out_refs = refs[len(fields) + 7:]
    state = tuple(r[:] for r in comp_refs)
    w = w_ref[:]
    for li in range(nlam):
        refs_l = {f: r[li] for f, r in param_refs.items()}
        moments = _wmoments_one(refs_l, specs, clip, nsurf, state, w)
        out_refs[li][:, :] = _pack_rows(moments, 8, state[0].dtype)


def _adjoint_one(param_refs, specs, clip, nsurf, fields, diff_fields,
                 state_in, w, ct5):
    """The in-VMEM analytic adjoint for ONE surface chain: recompute
    the trace saving per-surface states, substitute dead rays with a
    donor survivor, then chain the per-surface jax.vjp's in reverse.
    Returns ({field: per-surface cotangent list}, input-state
    cotangents, weight cotangents)."""
    dtype = state_in[0].dtype
    zeros = jnp.zeros_like(state_in[0])
    rot_diff = "rot" in diff_fields

    # ---- forward recompute, saving per-surface states ----
    r0 = param_refs["rot"][0]
    if specs[0].rotated:
        state = (*K.rot_apply_t(r0, *state_in[:3]),
                 *K.rot_apply_t(r0, *state_in[3:]))
    else:
        state = state_in
    saved = [state]
    drows, ndrows = [None], [None]
    for j in range(1, nsurf):
        d, nd = _read_row(param_refs, fields, j, rot_diff)
        surf = _Vals(d, nd)
        state, _ = K.surface_step_spec(state, surf, specs[j], clip)
        saved.append(state)
        drows.append(d)
        ndrows.append(nd)
    rot_last = param_refs["rot"][nsurf - 1]
    x, y, good = _wmoment_final(state, specs, nsurf, rot_last)

    # ---- dead-ray substitution: donor = last surviving ray ----
    shape2 = state_in[0].shape
    rowi = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    idx = rowi*128 + lane
    m = jnp.where(good, idx, -1).max()
    sel = (idx == m) & good
    any_good = m >= 0
    # the all-dead-tile fallback traces the axis ray: finite through
    # any sane system, and every cotangent is zero anyway
    safe = (0., 0., 0., 0., 0., 1.)
    sub = []
    for s in saved:
        donor = tuple(
            jnp.where(any_good, jnp.where(sel, c, 0.).sum(),
                      jnp.asarray(sf, dtype))
            for c, sf in zip(s, safe))
        sub.append(tuple(jnp.where(good, c, dc)
                         for c, dc in zip(s, donor)))

    # substituted final local coordinates (== originals on live rays)
    xs, ys, _ = _wmoment_final(sub[-1], specs, nsurf, rot_last)

    # ---- per-ray cotangents from the moment cotangents ----
    ct_sw, ct_sx, ct_sy, ct_sxx, ct_syy = ct5
    wg = jnp.where(good, w, 0.)
    ct_x = wg*(ct_sx + 2.*xs*ct_sxx)
    ct_y = wg*(ct_sy + 2.*ys*ct_syy)
    ct_w = jnp.where(
        good,
        ct_sw + xs*ct_sx + ys*ct_sy + xs*xs*ct_sxx + ys*ys*ct_syy,
        0.)

    ct_rot_fin = None
    if specs[nsurf - 1].rotated:
        if rot_diff:
            # the to-local rotation of the moment coordinates reads
            # the image row's rot a second time (after its step);
            # vjp it so the row's rot cotangent carries both uses
            rm = drows[nsurf - 1]["rot"]

            def final3(st3, rm):
                out = K.rot_apply(rm, *st3)
                return out[0], out[1]

            _, vjp_fin = jax.vjp(final3, sub[-1][:3], rm)
            ct3, ct_rot_fin = vjp_fin((ct_x, ct_y))
        else:
            ct3 = K.rot_apply_t(rot_last, ct_x, ct_y, zeros)
    else:
        ct3 = (ct_x, ct_y, zeros)
    ct_state = (*ct3, zeros, zeros, zeros)

    # ---- reverse sweep: chained per-surface VJPs ----
    acc = {f: [None]*nsurf for f in diff_fields}
    for j in range(nsurf - 1, 0, -1):
        spec_j = specs[j]
        nd = ndrows[j]

        def step(st, d, spec_j=spec_j, nd=nd):
            nst, _ = K.surface_step_spec(st, _Vals(d, nd), spec_j,
                                         clip)
            return nst
        _, vjp = jax.vjp(step, sub[j - 1], drows[j])
        ct_state, ct_d = vjp(ct_state)
        for f in diff_fields:
            acc[f][j] = ct_d[f]
    if ct_rot_fin is not None:
        acc["rot"][nsurf - 1] = jax.tree_util.tree_map(
            jnp.add, acc["rot"][nsurf - 1], ct_rot_fin)
    if specs[0].rotated:
        ct_state = (*K.rot_apply(r0, *ct_state[:3]),
                    *K.rot_apply(r0, *ct_state[3:]))
    # dead slots already carry zero cotangents (every step is
    # elementwise per ray); the mask also shields the all-dead
    # fallback from any non-finite partials
    ct_state = tuple(jnp.where(good, c, 0.) for c in ct_state)
    return acc, ct_state, ct_w


def _pack_param_grads(accs, diff_fields, nsurf, rows_p, dtype):
    """Pack per-chain parameter cotangent lists into one (rows_p, 128)
    block; `accs` is a list of acc dicts (one per wavelength/chain),
    slot order (field, chain, surface, element)."""
    pgrow = jax.lax.broadcasted_iota(jnp.int32, (rows_p, 128), 0)
    pglane = jax.lax.broadcasted_iota(jnp.int32, (rows_p, 128), 1)
    pg = jnp.zeros((rows_p, 128), dtype)
    slot = 0
    for f in diff_fields:
        for acc in accs:
            for j in range(1, nsurf):
                v = acc[f][j]
                vals = v.vals if hasattr(v, "vals") else (v,)
                for e in vals:
                    pg = jnp.where((pgrow == slot // 128)
                                   & (pglane == slot % 128), e, pg)
                    slot += 1
    return pg


def _adjoint_kernel(specs, clip, nsurf, fields, diff_fields, rows_p,
                    *refs):
    """Backward kernel, monochromatic chain (see _adjoint_one)."""
    nf = len(fields)
    param_refs = dict(zip(fields, refs[:nf]))
    comp_refs = refs[nf:nf + 6]
    w_ref = refs[nf + 6]
    ct_ref = refs[nf + 7]
    out_pg = refs[nf + 8]
    out_ct = refs[nf + 9:nf + 15]
    out_ctw = refs[nf + 15]

    state_in = tuple(r[:] for r in comp_refs)
    w = w_ref[:]
    ct = ct_ref[:, :]
    ct5 = tuple(ct[0, i] for i in range(5))
    acc, ct_state, ct_w = _adjoint_one(param_refs, specs, clip, nsurf,
                                       fields, diff_fields, state_in,
                                       w, ct5)
    out_pg[:, :] = _pack_param_grads([acc], diff_fields, nsurf,
                                     rows_p, state_in[0].dtype)
    for r, v in zip(out_ct, ct_state):
        r[:] = v
    out_ctw[:] = ct_w


def _adjoint_kernel_multi(specs, clip, nsurf, nlam, fields,
                          diff_fields, rows_p, *refs):
    """Polychromatic backward kernel: ONE ray tile runs _adjoint_one
    once per wavelength chain (saved states die after each chain's
    reverse sweep, so VMEM peak matches the monochromatic kernel);
    ray/weight cotangents sum over wavelengths, parameter cotangents
    stay per-wavelength (the stacked-table transpose outside sums
    shared geometry)."""
    nf = len(fields)
    param_refs = dict(zip(fields, refs[:nf]))
    comp_refs = refs[nf:nf + 6]
    w_ref = refs[nf + 6]
    ct_ref = refs[nf + 7]
    out_pg = refs[nf + 8]
    out_ct = refs[nf + 9:nf + 15]
    out_ctw = refs[nf + 15]

    state_in = tuple(r[:] for r in comp_refs)
    w = w_ref[:]
    ct = ct_ref[:, :]
    zeros = jnp.zeros_like(state_in[0])
    ct_state_tot = [zeros]*6
    ct_w_tot = zeros
    accs = []
    for li in range(nlam):
        refs_l = {f: r[li] for f, r in param_refs.items()}
        ct5 = tuple(ct[li, i] for i in range(5))
        acc, ct_state, ct_w = _adjoint_one(refs_l, specs, clip, nsurf,
                                           fields, diff_fields,
                                           state_in, w, ct5)
        accs.append(acc)
        ct_state_tot = [t + c for t, c in zip(ct_state_tot, ct_state)]
        ct_w_tot = ct_w_tot + ct_w
    out_pg[:, :] = _pack_param_grads(accs, diff_fields, nsurf, rows_p,
                                     state_in[0].dtype)
    for r, v in zip(out_ct, ct_state_tot):
        r[:] = v
    out_ctw[:] = ct_w_tot


def _param_blockspecs(params, fields):
    return [pl.BlockSpec(params[f].shape,
                         lambda i, nd=params[f].ndim: (0,)*nd)
            for f in fields]


def _x64_ctx(dtype):
    import contextlib
    return (jax.enable_x64(False) if dtype == jnp.float32
            else contextlib.nullcontext())


def _moments_impl(specs, clip, tile, interpret, fields, params, state,
                  w):
    n = state[0].shape[0]
    nsurf = params["curvature"].shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)
    w2 = w.reshape(n // 128, 128)
    pvals = [params[f] for f in fields]
    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_spec = pl.BlockSpec((8, 128), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((n // tile*8, 128), dtype)
    with _x64_ctx(dtype):
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, specs, clip, nsurf, fields),
            grid=grid,
            in_specs=_param_blockspecs(params, fields)
            + [comp_spec]*7,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*pvals, *state2, w2)
    tot = out.sum(0)
    return tot[0], tot[1], tot[2], tot[3], tot[4]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _moments(specs, clip, tile, interpret, fields, diff_fields,
             params, state, w):
    return _moments_impl(specs, clip, tile, interpret, fields, params,
                         state, w)


def _moments_fwd(specs, clip, tile, interpret, fields, diff_fields,
                 params, state, w):
    mom = _moments_impl(specs, clip, tile, interpret, fields, params,
                        state, w)
    return mom, (params, state, w)


def _moments_bwd(specs, clip, tile, interpret, fields, diff_fields,
                 res, ct_mom):
    params, state, w = res
    n = state[0].shape[0]
    nsurf = params["curvature"].shape[0]
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)
    w2 = w.reshape(n // 128, 128)
    pvals = [params[f] for f in fields]

    nslots = _slot_count(params, diff_fields, nsurf)
    rows_p = max(8, -(-nslots // 128))

    # moment cotangents ride in as one replicated block; the sum-w
    # cotangent reaches only the weights (liveness is a primal-side
    # constant, as in parallel.grad.spot_rms)
    ctv = jnp.zeros((8, 128), dtype)
    for i, c in enumerate(ct_mom):
        ctv = ctv.at[0, i].set(jnp.asarray(c, dtype))

    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    ct_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    pg_spec = pl.BlockSpec((rows_p, 128), lambda i: (i, 0))
    out_specs = ([pg_spec] + [comp_spec]*7)
    out_shape = ([jax.ShapeDtypeStruct((n // tile*rows_p, 128), dtype)]
                 + [jax.ShapeDtypeStruct((n // 128, 128), dtype)
                    for _ in range(7)])
    with _x64_ctx(dtype):
        outs = pl.pallas_call(
            functools.partial(_adjoint_kernel, specs, clip, nsurf,
                              fields, diff_fields, rows_p),
            grid=grid,
            in_specs=_param_blockspecs(params, fields)
            + [comp_spec]*7 + [ct_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*pvals, *state2, w2, ctv)
    pg = outs[0].reshape(n // tile, rows_p, 128).sum(0).reshape(-1)
    ct_state = tuple(o.reshape(n) for o in outs[1:7])
    ct_w = outs[7].reshape(n)

    ct_params = {}
    pos = 0
    for f in fields:
        if f not in diff_fields:
            ct_params[f] = jnp.zeros_like(params[f])
            continue
        es = _esize(params, f)
        cnt = es*(nsurf - 1)
        body = pg[pos:pos + cnt].reshape(nsurf - 1, es)
        full = jnp.concatenate(
            [jnp.zeros((1, es), body.dtype), body], axis=0)
        ct_params[f] = full.reshape(params[f].shape).astype(
            params[f].dtype)
        pos += cnt
    ct_state = tuple(c.astype(s.dtype)
                     for c, s in zip(ct_state, state))
    return ct_params, ct_state, ct_w.astype(w.dtype)


_moments.defvjp(_moments_fwd, _moments_bwd)




def _baked_out_rows(specs, field):
    """Surface rows (1-indexed into the chain) whose static
    specialization never READS `field`, so its gradient there is
    structurally zero (module docstring: specialized-engine
    semantics)."""
    rows = []
    for j, sp in enumerate(specs):
        if j == 0:
            continue
        figured = (sp.aspheric or sp.odd or sp.freeform or sp.doe
                   or sp.grating or sp.biconic or sp.toroidal
                   or sp.cyl_axis)
        if field == "curvature" and sp.flat and not figured:
            rows.append(j)
        elif field == "conic" and sp.spherical and not figured \
                and not sp.flat:
            rows.append(j)
        elif field == "conic" and sp.flat and not figured:
            rows.append(j)
        elif field == "offset" and not sp.off_axis:
            rows.append(j)     # transverse components only
        elif field in ("curvature_dx", "conic_dx") \
                and not (sp.biconic or sp.toroidal or sp.cyl_axis):
            rows.append(j)
        elif field == "mu" and sp.kind == 0:
            rows.append(j)
        elif field == "rot" and not sp.rotated:
            rows.append(j)
    return rows


def _is_differentiated(v):
    """True when v carries an AD tracer (JVP/Linearize) somewhere in
    its tracer stack -- the caller is differentiating it.  A plain
    DynamicJaxprTracer is just a value lifted into a jit trace (every
    np constant becomes one), NOT a differentiation signal."""
    for _ in range(8):
        if not isinstance(v, jax.core.Tracer):
            return False
        name = type(v).__name__
        if "JVP" in name or "Linearize" in name:
            return True
        v = (getattr(v, "primal", None) if hasattr(v, "primal")
             else getattr(v, "val", None))
    return False


def _warn_baked_params(specs, params):
    """Host-side (trace-time, zero jit cost): when a table field the
    caller is differentiating (it carries an AD tracer while the rest
    of the table does not) has rows the static specialization bakes
    out, say so once -- otherwise an optimizer silently never moves
    that parameter (VERDICT r4 task 7)."""
    import warnings
    traced = [f for f, v in params.items()
              if f not in _NONDIFF and _is_differentiated(v)]
    if len(traced) == sum(1 for f in params if f not in _NONDIFF):
        # EVERY float field is differentiated: a wholesale context
        # (sensitivity() / full-table jacobians), not a signal that
        # the user selected these fields for optimization
        return
    for f in traced:
        rows = _baked_out_rows(specs, f)
        if f == "rot":
            # pose differentiation (tilt lowered into rot): the real
            # footgun is the gradient being IDENTICALLY zero; partial
            # coverage (targeted diff_pose rows) is deliberate
            if len(rows) == len(specs) - 1:
                warnings.warn(
                    "adjoint kernel: 'rot' (pose/tilt) is traced but "
                    "no spec row is rotated -- pose gradients are "
                    "structurally zero; pass diff_pose=True (or "
                    "kernels.with_pose(specs)) to keep the nominal "
                    "pose live", stacklevel=3)
            continue
        if rows:
            detail = (" (transverse x/y components)"
                      if f == "offset" else "")
            warnings.warn(
                "adjoint kernel: '%s' of surface row(s) %s is baked "
                "out by the static specialization%s -- its gradient "
                "there is structurally zero; seed it off the baked "
                "point (respecialize) or use the generic scan engine"
                % (f, rows, detail), stacklevel=3)


def _pose_traced(table):
    return any(isinstance(getattr(table, f, None), jax.core.Tracer)
               for f in ("tilt", "decenter"))


def _resolve_pose_specs(table, specs, diff_pose, name):
    """Static-spec resolution with pose awareness.  A traced
    tilt/decenter (pose differentiation under jax.grad) cannot reach
    kernels.specialize, so the specs are derived from the pose-
    stripped concrete table with rotated/off_axis forced live
    (kernels.with_pose) on the diff_pose rows -- by default ALL
    non-object rows, so gradients at the nominal alignment are exact
    rather than baked out.  diff_pose also applies to explicitly
    passed specs (the jit path: build specs eagerly, force the pose
    rows once)."""
    import numpy as np
    pose_tr = _pose_traced(table)
    if specs is None and not pose_tr:
        specs = _resolve_specs(table, specs)
    if specs is None:
        geom_tr = any(isinstance(getattr(table, f), jax.core.Tracer)
                      for f in ("curvature", "rot", "offset"))
        if geom_tr:
            raise ValueError(
                "%s inside jit needs static specs= (kernels.specialize"
                " on the concrete table; wrap them in"
                " kernels.with_pose for pose gradients)" % name)
        if pose_tr:
            z3 = np.zeros((np.asarray(table.curvature).shape[0], 3))
            base = table.replace(tilt=z3, decenter=z3)
            specs = K.specialize(base)
            if diff_pose is None:
                diff_pose = True
        else:
            specs = K.specialize(table)
    if diff_pose is not None:
        specs = K.with_pose(specs,
                            None if diff_pose is True else diff_pose)
    return specs


def _rot_diff_fields(table, fields, specs):
    """The differentiable field subset: everything float except the
    selectors, plus `rot` exactly when it is traced (pose gradients
    flowing through the XLA-side Rodrigues lowering) and some spec row
    actually reads it."""
    rot_diff = (isinstance(table.rot, jax.core.Tracer)
                and any(s.rotated for s in specs))
    return tuple(f for f in fields
                 if f not in _NONDIFF and (f != "rot" or rot_diff))



def pallas_spot_moments(table, state, w, specs=None, clip=False,
                        tile=DEFAULT_TILE, interpret=False,
                        diff_pose=None):
    """Differentiable weighted spot moments (sum w, sum wx, sum wy,
    sum wx^2, sum wy^2) of the fused Pallas trace.  state: 6-tuple of
    (N,) components; w: (N,) weights.  Gradients w.r.t. the table's
    float fields, the ray state, and the weights flow through the
    in-kernel adjoint (see module docstring).

    Pose gradients: a traced table.tilt/.decenter lowers to rot/offset
    through the differentiable Rodrigues inside the XLA graph, and the
    kernel adjoint carries the rot/offset cotangents back through that
    lowering -- d/d(tilt), d/d(decenter) at any pose, including the
    nominal one (diff_pose=True, the default when pose is traced,
    forces the rotated/off_axis flags so nothing bakes out; pass a row
    iterable to keep only selected rows live, or with explicit specs=
    wrap them in kernels.with_pose)."""
    from .tables import lower_pose
    specs = _resolve_pose_specs(table, specs, diff_pose,
                                "pallas_spot_moments")
    table = lower_pose(table)  # traced pose -> traced rot/offset
    fields = _fields_for(table, specs)
    diff_fields = _rot_diff_fields(table, fields, specs)
    dtype = state[0].dtype
    params = {f: (jnp.asarray(getattr(table, f), dtype=dtype)
                  if getattr(table, f).dtype.kind == "f"
                  else getattr(table, f)) for f in fields}
    _warn_baked_params(specs, params)
    return _moments(specs, clip, tile, interpret, fields, diff_fields,
                    params, state, jnp.asarray(w, dtype))


def pallas_spot_rms(table, y0, u0, w=None, specs=None, clip=False,
                    tile=DEFAULT_TILE, interpret=False,
                    diff_pose=None):
    """Weighted RMS spot radius via the fused Pallas merit kernel,
    differentiable end-to-end through the in-kernel analytic adjoint
    -- the production-scale replacement of parallel.grad.spot_rms for
    TPU optimization loops (no VJP residuals: O(N) HBM regardless of
    surface count; 2^26-ray merits fit where the XLA path OOMs at
    2^23).

    Semantics match spot_rms(nan_safe=True) with the same weights:
    vignetted/missed rays drop out of the moments and contribute zero
    cotangent everywhere.

    Pose note: a CONCRETELY tilted/decentered table is folded
    (tables.lower_pose) before specialization, so the primal matches
    the other engines.  A TRACED tilt/decenter (jax.grad w.r.t. pose)
    lowers inside the graph and the adjoint kernel differentiates it
    exactly -- alignment/tolerancing gradients at production ray
    counts (see pallas_spot_moments, diff_pose)."""
    y0 = jnp.asarray(y0)
    u0 = jnp.asarray(u0)
    if w is None:
        w = jnp.ones(y0.shape[0], y0.dtype)/y0.shape[0]
    state = (*K.split(y0), *K.split(u0))
    mom = pallas_spot_moments(table, state, w, specs=specs, clip=clip,
                              tile=tile, interpret=interpret,
                              diff_pose=diff_pose)
    return spot_rms_from_moments(*mom)


# ---------------------------------------------------------------------
# Polychromatic (stacked-table) adjoint merit
# ---------------------------------------------------------------------

def _moments_multi_impl(specs, clip, tile, interpret, fields, params,
                        state, w):
    n = state[0].shape[0]
    nlam, nsurf = params["curvature"].shape[:2]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)
    w2 = w.reshape(n // 128, 128)
    pvals = [params[f] for f in fields]
    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    out_spec = [pl.BlockSpec((8, 128), lambda i: (i, 0))]*nlam
    out_shape = [jax.ShapeDtypeStruct((n // tile*8, 128), dtype)
                 for _ in range(nlam)]
    with _x64_ctx(dtype):
        outs = pl.pallas_call(
            functools.partial(_fwd_kernel_multi, specs, clip, nsurf,
                              nlam, fields),
            grid=grid,
            in_specs=_param_blockspecs(params, fields)
            + [comp_spec]*7,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*pvals, *state2, w2)
    return jnp.stack([o.sum(0)[:5] for o in outs])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _moments_multi(specs, clip, tile, interpret, fields, diff_fields,
                   params, state, w):
    return _moments_multi_impl(specs, clip, tile, interpret, fields,
                               params, state, w)


def _moments_multi_fwd(specs, clip, tile, interpret, fields,
                       diff_fields, params, state, w):
    mom = _moments_multi_impl(specs, clip, tile, interpret, fields,
                              params, state, w)
    return mom, (params, state, w)


def _moments_multi_bwd(specs, clip, tile, interpret, fields,
                       diff_fields, res, ct_mom):
    params, state, w = res
    n = state[0].shape[0]
    nlam, nsurf = params["curvature"].shape[:2]
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)
    w2 = w.reshape(n // 128, 128)
    pvals = [params[f] for f in fields]

    nslots = nlam*_slot_count(
        {f: params[f][0] for f in params}, diff_fields, nsurf)
    rows_p = max(8, -(-nslots // 128))
    rows_c = max(8, nlam)

    # per-wavelength moment cotangents ride in as one replicated
    # block: row li carries wavelength li's five cotangents
    ctv = jnp.zeros((rows_c, 128), dtype)
    ctv = ctv.at[:nlam, :5].set(jnp.asarray(ct_mom, dtype))

    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    ct_spec = pl.BlockSpec((rows_c, 128), lambda i: (0, 0))
    pg_spec = pl.BlockSpec((rows_p, 128), lambda i: (i, 0))
    out_specs = ([pg_spec] + [comp_spec]*7)
    out_shape = ([jax.ShapeDtypeStruct((n // tile*rows_p, 128), dtype)]
                 + [jax.ShapeDtypeStruct((n // 128, 128), dtype)
                    for _ in range(7)])
    with _x64_ctx(dtype):
        outs = pl.pallas_call(
            functools.partial(_adjoint_kernel_multi, specs, clip,
                              nsurf, nlam, fields, diff_fields,
                              rows_p),
            grid=grid,
            in_specs=_param_blockspecs(params, fields)
            + [comp_spec]*7 + [ct_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*pvals, *state2, w2, ctv)
    pg = outs[0].reshape(n // tile, rows_p, 128).sum(0).reshape(-1)
    ct_state = tuple(o.reshape(n) for o in outs[1:7])
    ct_w = outs[7].reshape(n)

    ct_params = {}
    pos = 0
    for f in fields:
        if f not in diff_fields:
            ct_params[f] = jnp.zeros_like(params[f])
            continue
        es = _esize({k: v[0] for k, v in params.items()}, f)
        cnt = es*(nsurf - 1)*nlam
        body = pg[pos:pos + cnt].reshape(nlam, nsurf - 1, es)
        full = jnp.concatenate(
            [jnp.zeros((nlam, 1, es), body.dtype), body], axis=1)
        ct_params[f] = full.reshape(params[f].shape).astype(
            params[f].dtype)
        pos += cnt
    ct_state = tuple(c.astype(s.dtype)
                     for c, s in zip(ct_state, state))
    return ct_params, ct_state, ct_w.astype(w.dtype)


_moments_multi.defvjp(_moments_multi_fwd, _moments_multi_bwd)


def pallas_spot_moments_multi(tables, state, w, specs=None,
                              clip=False, tile=DEFAULT_TILE,
                              interpret=False, diff_pose=None):
    """Differentiable per-wavelength weighted spot moments of the
    fused polychromatic Pallas trace: `tables` carries a leading
    wavelength axis (System.tables / glass.glass_tables), ONE ray
    tile is staged into VMEM and traced through every wavelength's
    chain before writeback.  Returns (nlam, 5) moments
    (sum w, sum wx, sum wy, sum wx^2, sum wy^2 per wavelength).

    Gradients flow through the in-kernel multi-chain adjoint: ray and
    weight cotangents sum over wavelengths; table-field cotangents
    are per wavelength, so a stacked table built differentiably from
    shared parameters (e.g. glass_tables from (nd, vd), or a
    broadcast geometry) receives the cross-wavelength sum through the
    stacking transpose outside the kernel.  Traced pose deltas
    (tilt/decenter) differentiate exactly as in pallas_spot_moments
    (diff_pose)."""
    from .tables import lower_pose
    tab0 = jax.tree_util.tree_map(lambda a: a[0], tables)
    specs = _resolve_pose_specs(tab0, specs, diff_pose,
                                "pallas_spot_moments_multi")
    tables = lower_pose(tables)
    fields = _fields_for(tab0, specs)
    diff_fields = _rot_diff_fields(tables, fields, specs)
    dtype = state[0].dtype
    params = {f: (jnp.asarray(getattr(tables, f), dtype=dtype)
                  if getattr(tables, f).dtype.kind == "f"
                  else getattr(tables, f)) for f in fields}
    _warn_baked_params(specs, params)
    return _moments_multi(specs, clip, tile, interpret, fields,
                          diff_fields, params, state,
                          jnp.asarray(w, dtype))


def union_spot_rms_from_moments(moments):
    """ONE centroid-referenced RMS over the union of all wavelengths'
    spot samples, from (nlam, 5) per-wavelength weighted moments --
    the moment-space identity of glass.polychromatic_spot_rms's
    union reduction (shared centroid: axial AND lateral color are
    penalized together with the monochromatic blur)."""
    sw = moments[:, 0].sum()
    sx = moments[:, 1].sum()
    sy = moments[:, 2].sum()
    sxx = moments[:, 3].sum()
    syy = moments[:, 4].sum()
    cx, cy = sx/sw, sy/sw
    var = (sxx + syy)/sw - (cx*cx + cy*cy)
    return jnp.sqrt(jnp.maximum(var, 0.) + 1e-30)


def pallas_polychromatic_spot_rms(tables, y0, u0, w=None, specs=None,
                                  clip=False, tile=DEFAULT_TILE,
                                  interpret=False, diff_pose=None):
    """Polychromatic union spot RMS via the fused multi-wavelength
    Pallas merit kernel, differentiable end-to-end through the
    in-kernel multi-chain adjoint -- the production-scale twin of
    glass.polychromatic_spot_rms (reference analog: the merit loop of
    reference optimize.py:93-161, which re-traces per wavelength with
    finite differences).

    Semantics match glass.polychromatic_spot_rms: every wavelength
    traces the same (y0, u0) bundle at weight w/nlam, vignetted rays
    drop out per wavelength (in-kernel: zero weight in the moments,
    donor substitution in the adjoint), and the RMS is taken about
    the shared union centroid.  HBM reads the bundle ONCE for all
    wavelengths (the XLA path re-reads per wavelength and stores VJP
    residuals per wavelength -- OOM at 2^23 x 3 rays)."""
    y0 = jnp.asarray(y0)
    u0 = jnp.asarray(u0)
    nlam = tables.curvature.shape[0]
    if w is None:
        w = jnp.ones(y0.shape[0], y0.dtype)/y0.shape[0]
    state = (*K.split(y0), *K.split(u0))
    mom = pallas_spot_moments_multi(tables, state,
                                    jnp.asarray(w)/nlam, specs=specs,
                                    clip=clip, tile=tile,
                                    interpret=interpret,
                                    diff_pose=diff_pose)
    return union_spot_rms_from_moments(mom)


# ---------------------------------------------------------------------
# Per-ray OPD / wavefront-RMS adjoint merit
# ---------------------------------------------------------------------
#
# The forward kernels already accumulate the optical path per surface
# (kernels.surface_step_spec's topt); this section extends the
# analytic adjoint to it, giving a differentiable per-ray OPD on the
# exit-pupil reference sphere (the jnp mirror of
# parallel.grad.opd_rays, reference geometric_trace.py:101-145)
# without XLA VJP residuals -- diffraction-based merits (wavefront
# RMS, Strehl) at production ray counts.
#
# Decomposition (all reference-ray terms are handled OUTSIDE the
# kernel, in XLA, from the kernel's own per-ray output):
#   waves_i = (k_i + h_i) - (k_ref + h_ref)
#   k_i = -(sum_j t_ij + ti_i * n_exit)/(lambda/scale)   [in-kernel]
#   h_i = -n0 * (u0_ref . y0_i)/(lambda/scale)           [XLA, linear]
# with ti the intercept onto the reference sphere of radius `radius`
# centered on the reference ray's image point (a differentiable
# 3-scalar aux input, produced by a single-ray XLA trace).


def _sphere_intercept_comp(x, y, z, ux, uy, uz, c):
    """Closed-form sphere intercept on components (the spherical
    branch of surfaces.intercept_conic; rays missing the sphere go
    NaN)."""
    uy_ = ux*x + uy*y + uz*z
    uu = ux*ux + uy*uy + uz*uz
    yy = x*x + y*y + z*z
    d = c*uy_ - uz
    e = c*uu
    f = c*yy - 2.*z
    disc = d*d - e*f
    g = jnp.sqrt(disc)          # NaN-deliberate on a miss
    return -(d + g)/e


def _opd_tail(state, d_img, nd_img, center, radius, lam_scale,
              spec_img):
    """Exit state (from_normal'd, relative to the exit vertex) ->
    the sphere-intercept part of the per-ray OPD:
    q = ti * n_exit, k = -(path + q)/lam_scale outside.

    Mirrors parallel.grad.opd_rays: step by the lab-frame gap to the
    image vertex, rotate into the image surface's normal frame,
    offset to the reference-sphere center, intercept.  The gap honors
    the image row's static spec flags (transverse offset only when
    off_axis) so the sensitivity semantics match the specialized
    engine that also produced the sphere center."""
    cx, cy, cz = center
    off = d_img["offset"]
    px, py = state[0], state[1]
    if spec_img.off_axis:
        px = px - off[0]
        py = py - off[1]
    pz = state[2] - off[2]
    dx, dy, dz = state[3], state[4], state[5]
    if spec_img.rotated:
        # rot lives in the diff dict when pose is being
        # differentiated (Mat3 scalars), else in nondiff (raw array)
        rot = d_img["rot"] if "rot" in d_img else nd_img["rot"]
        px, py, pz = K.rot_apply(rot, px, py, pz)
        dx, dy, dz = K.rot_apply(rot, dx, dy, dz)
    px = px - cx
    py = py - cy
    pz = pz - cz + radius
    ti = _sphere_intercept_comp(px, py, pz, dx, dy, dz, 1./radius)
    # transverse landing coordinates on the reference sphere (the
    # host opd's x, y; ref-centering happens outside)
    lx = px + ti*dx
    ly = py + ti*dy
    return ti*d_img["n_before"], lx, ly


def _opd_chain_fwd(param_refs, specs, clip, nsurf, fields, state_in,
                   center, radius, lam_scale):
    """Trace one VMEM-resident tile to the exit surface, accumulating
    optical path, then intercept the reference sphere: per-ray k."""
    from .pallas_trace import _SurfRow
    dtype = state_in[0].dtype
    state = state_in
    if specs[0].rotated:
        r0 = param_refs["rot"][0]
        state = (*K.rot_apply_t(r0, *state[:3]),
                 *K.rot_apply_t(r0, *state[3:]))
    path = jnp.zeros_like(state[0])
    for j in range(1, nsurf - 1):
        surf = _SurfRow(param_refs, j, dtype)
        state, out = K.surface_step_spec(state, surf, specs[j], clip)
        path = path + out[3]
    d_img, nd_img = _read_row(param_refs, fields, nsurf - 1)
    q, lx, ly = _opd_tail(state, d_img, nd_img, center, radius,
                          lam_scale, specs[nsurf - 1])
    return -(path + q)/lam_scale, lx, ly


def _opd_kernel(specs, clip, nsurf, fields, *refs):
    nf = len(fields)
    param_refs = dict(zip(fields, refs[:nf]))
    comp_refs = refs[nf:nf + 6]
    aux_ref = refs[nf + 6]
    out_refs = refs[nf + 7:nf + 10]
    state = tuple(r[:] for r in comp_refs)
    aux = aux_ref[:, :]
    center = (aux[0, 0], aux[0, 1], aux[0, 2])
    radius, lam_scale = aux[0, 3], aux[0, 4]
    k, lx, ly = _opd_chain_fwd(param_refs, specs, clip, nsurf,
                               fields, state, center, radius,
                               lam_scale)
    for r, v in zip(out_refs, (k, lx, ly)):
        r[:, :] = v


def _opd_adjoint_kernel(specs, clip, nsurf, fields, diff_fields,
                        rows_p, *refs):
    """Backward: recompute the chain saving per-surface states,
    substitute dead rays, vjp the sphere tail, then chain the
    per-surface vjps in reverse with the per-ray path cotangent
    feeding every surface's optical-path output."""
    nf = len(fields)
    param_refs = dict(zip(fields, refs[:nf]))
    comp_refs = refs[nf:nf + 6]
    aux_ref = refs[nf + 6]
    ctk_ref = refs[nf + 7]
    ctlx_ref = refs[nf + 8]
    ctly_ref = refs[nf + 9]
    out_pg = refs[nf + 10]
    out_ct = refs[nf + 11:nf + 17]
    out_cta = refs[nf + 17]

    state_in = tuple(r[:] for r in comp_refs)
    dtype = state_in[0].dtype
    zeros = jnp.zeros_like(state_in[0])
    aux = aux_ref[:, :]
    center = (aux[0, 0], aux[0, 1], aux[0, 2])
    radius, lam_scale = aux[0, 3], aux[0, 4]
    ct_k = ctk_ref[:]
    ct_lx = ctlx_ref[:]
    ct_ly = ctly_ref[:]

    # ---- forward recompute, saving per-surface states ----
    rot_diff = "rot" in diff_fields
    r0 = param_refs["rot"][0]
    if specs[0].rotated:
        state = (*K.rot_apply_t(r0, *state_in[:3]),
                 *K.rot_apply_t(r0, *state_in[3:]))
    else:
        state = state_in
    saved = [state]
    drows, ndrows = [None], [None]
    path = jnp.zeros_like(state[0])
    for j in range(1, nsurf - 1):
        d, nd = _read_row(param_refs, fields, j, rot_diff)
        surf = _Vals(d, nd)
        state, out = K.surface_step_spec(state, surf, specs[j], clip)
        path = path + out[3]
        saved.append(state)
        drows.append(d)
        ndrows.append(nd)
    d_img, nd_img = _read_row(param_refs, fields, nsurf - 1, rot_diff)
    q, lx, ly = _opd_tail(state, d_img, nd_img, center, radius,
                          lam_scale, specs[nsurf - 1])
    k = -(path + q)/lam_scale
    good = jnp.isfinite(k)

    # ---- dead-ray substitution: donor = last surviving ray ----
    shape2 = state_in[0].shape
    rowi = jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    idx = rowi*128 + lane
    m = jnp.where(good, idx, -1).max()
    sel = (idx == m) & good
    any_good = m >= 0
    safe = (0., 0., 0., 0., 0., 1.)
    sub = []
    for s in saved:
        donor = tuple(
            jnp.where(any_good, jnp.where(sel, c, 0.).sum(),
                      jnp.asarray(sf, dtype))
            for c, sf in zip(s, safe))
        sub.append(tuple(jnp.where(good, c, dc)
                         for c, dc in zip(s, donor)))

    # ---- cotangents: k = -(path + q)/lam_scale ----
    ct_k = jnp.where(good, ct_k, 0.)
    ct_lx = jnp.where(good, ct_lx, 0.)
    ct_ly = jnp.where(good, ct_ly, 0.)
    ct_pq = -ct_k/lam_scale       # reaches every t_j and q alike

    def tail(st, d, c3):
        return _opd_tail(st, d, nd_img, c3, radius, lam_scale,
                         specs[nsurf - 1])

    _, vjp_tail = jax.vjp(tail, sub[-1], d_img,
                          tuple(jnp.asarray(c, dtype)
                                for c in center))
    ct_state, ct_d_img, ct_center = vjp_tail((ct_pq, ct_lx, ct_ly))

    acc = {f: [None]*nsurf for f in diff_fields}
    for f in diff_fields:
        acc[f][nsurf - 1] = ct_d_img[f]
    for j in range(nsurf - 2, 0, -1):
        spec_j = specs[j]
        nd = ndrows[j]

        def step(st, d, spec_j=spec_j, nd=nd):
            nst, out = K.surface_step_spec(st, _Vals(d, nd), spec_j,
                                           clip)
            return nst, out[3]
        _, vjp = jax.vjp(step, sub[j - 1], drows[j])
        ct_state, ct_d = vjp((ct_state, ct_pq))
        for f in diff_fields:
            acc[f][j] = ct_d[f]
    if specs[0].rotated:
        ct_state = (*K.rot_apply(r0, *ct_state[:3]),
                    *K.rot_apply(r0, *ct_state[3:]))
    ct_state = tuple(jnp.where(good, c, 0.) for c in ct_state)

    pg = _pack_param_grads([acc], diff_fields, nsurf, rows_p, dtype)
    for r, v in zip(out_ct, ct_state):
        r[:] = v
    out_pg[:, :] = pg
    # center cotangents ride out in their own small block (row 0)
    out_cta[:, :] = _pack_rows([jnp.asarray(c, dtype).sum()
                                for c in ct_center], 8, dtype)


def _opd_impl(specs, clip, tile, interpret, fields, params, state,
              aux):
    n = state[0].shape[0]
    nsurf = params["curvature"].shape[0]
    assert nsurf >= 3, "opd needs object, exit and image rows"
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)
    pvals = [params[f] for f in fields]
    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    aux_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    with _x64_ctx(dtype):
        outs = pl.pallas_call(
            functools.partial(_opd_kernel, specs, clip, nsurf,
                              fields),
            grid=grid,
            in_specs=_param_blockspecs(params, fields)
            + [comp_spec]*6 + [aux_spec],
            out_specs=[comp_spec]*3,
            out_shape=[jax.ShapeDtypeStruct((n // 128, 128), dtype)
                       for _ in range(3)],
            interpret=interpret,
        )(*pvals, *state2, aux)
    return tuple(o.reshape(n) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _opd(specs, clip, tile, interpret, fields, diff_fields, params,
         state, aux):
    return _opd_impl(specs, clip, tile, interpret, fields, params,
                     state, aux)


def _opd_fwd(specs, clip, tile, interpret, fields, diff_fields,
             params, state, aux):
    out = _opd_impl(specs, clip, tile, interpret, fields, params,
                    state, aux)
    return out, (params, state, aux)


def _opd_bwd(specs, clip, tile, interpret, fields, diff_fields, res,
             ct_out):
    params, state, aux = res
    n = state[0].shape[0]
    nsurf = params["curvature"].shape[0]
    rows = tile // 128
    grid = (n // tile,)
    dtype = state[0].dtype
    state2 = tuple(c.reshape(n // 128, 128) for c in state)
    cts = tuple(jnp.asarray(c, dtype).reshape(n // 128, 128)
                for c in ct_out)
    pvals = [params[f] for f in fields]

    nslots = _slot_count(params, diff_fields, nsurf)
    rows_p = max(8, -(-nslots // 128))

    comp_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0))
    aux_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    pg_spec = pl.BlockSpec((rows_p, 128), lambda i: (i, 0))
    cta_spec = pl.BlockSpec((8, 128), lambda i: (i, 0))
    out_specs = [pg_spec] + [comp_spec]*6 + [cta_spec]
    out_shape = ([jax.ShapeDtypeStruct((n // tile*rows_p, 128), dtype)]
                 + [jax.ShapeDtypeStruct((n // 128, 128), dtype)
                    for _ in range(6)]
                 + [jax.ShapeDtypeStruct((n // tile*8, 128), dtype)])
    with _x64_ctx(dtype):
        outs = pl.pallas_call(
            functools.partial(_opd_adjoint_kernel, specs, clip, nsurf,
                              fields, diff_fields, rows_p),
            grid=grid,
            in_specs=_param_blockspecs(params, fields)
            + [comp_spec]*6 + [aux_spec] + [comp_spec]*3,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*pvals, *state2, aux, *cts)
    pg = outs[0].reshape(n // tile, rows_p, 128).sum(0).reshape(-1)
    ct_state = tuple(o.reshape(n) for o in outs[1:7])
    cta = outs[7].reshape(n // tile, 8, 128).sum(0)

    ct_params = {}
    pos = 0
    for f in fields:
        if f not in diff_fields:
            ct_params[f] = jnp.zeros_like(params[f])
            continue
        es = _esize(params, f)
        cnt = es*(nsurf - 1)
        body = pg[pos:pos + cnt].reshape(nsurf - 1, es)
        full = jnp.concatenate(
            [jnp.zeros((1, es), body.dtype), body], axis=0)
        ct_params[f] = full.reshape(params[f].shape).astype(
            params[f].dtype)
        pos += cnt
    ct_state = tuple(c.astype(s.dtype)
                     for c, s in zip(ct_state, state))
    ct_aux = jnp.zeros_like(aux).at[0, :3].set(cta[0, :3])
    return ct_params, ct_state, ct_aux


_opd.defvjp(_opd_fwd, _opd_bwd)


def pallas_opd_rays(table, y0, u0, ref=0, radius=None,
                    wavelength=None, scale=1e-3, finite=False,
                    with_pupil=False, specs=None, clip=False,
                    tile=DEFAULT_TILE, interpret=False,
                    diff_pose=None):
    """Per-ray optical path difference on the exit-pupil reference
    sphere, in waves -- the adjoint-kernel twin of
    parallel.grad.opd_rays (reference geometric_trace.py:101-144):
    differentiable end-to-end with in-kernel backward, O(N) HBM
    regardless of surface count.  with_pupil additionally returns the
    ref-centered transverse landing coordinates on the reference
    sphere (for tilt-removal / Strehl / pupil-grid merits).

    The reference ray `ref` must be alive; its image point (the
    sphere center) comes from a single-ray XLA trace, so gradients
    flow through the sphere placement exactly as in the XLA twin.
    Traced pose deltas (tilt/decenter) differentiate exactly as in
    pallas_spot_moments (diff_pose)."""
    from .geometric import trace_rays_final
    from .tables import lower_pose
    specs = _resolve_pose_specs(table, specs, diff_pose,
                                "pallas_opd_rays")
    table = lower_pose(table)
    y0 = jnp.asarray(y0)
    u0 = jnp.asarray(u0)
    dtype = y0.dtype
    fields = _fields_for(table, specs)
    diff_fields = _rot_diff_fields(table, fields, specs)
    params = {f: (jnp.asarray(getattr(table, f), dtype=dtype)
                  if getattr(table, f).dtype.kind == "f"
                  else getattr(table, f)) for f in fields}
    _warn_baked_params(specs, params)
    # sphere center: the reference ray's image point (local frame),
    # one differentiable XLA ray
    yr, ur, tr = trace_rays_final(table, y0[ref:ref + 1],
                                  u0[ref:ref + 1], clip=False,
                                  specs=specs, unroll=True)
    center = yr[0]
    lam_scale = wavelength/scale
    aux = jnp.zeros((8, 128), dtype)
    aux = aux.at[0, :3].set(center)
    aux = aux.at[0, 3].set(radius)
    aux = aux.at[0, 4].set(lam_scale)
    state = (*K.split(y0), *K.split(u0))
    k, lx, ly = _opd(specs, clip, tile, interpret, fields,
                     diff_fields, params, state, aux)
    if not finite:
        # input reference plane normal to the chief ray: the linear
        # input-plane term stays in XLA (it is data, not chain)
        n0 = params["n_before"][0]
        h = -n0*(y0 @ u0[ref])/lam_scale
        k = k + h
    waves = k - k[ref]
    if not with_pupil:
        return waves
    landing = jnp.stack([lx - lx[ref], ly - ly[ref]], axis=1)
    return waves, landing


def pallas_wavefront_rms(table, y0, u0, w=None, ref=0, radius=None,
                         wavelength=None, scale=1e-3, finite=False,
                         specs=None, clip=False, tile=DEFAULT_TILE,
                         interpret=False, diff_pose=None):
    """Weighted RMS wavefront error (waves, piston removed) via the
    per-ray OPD adjoint kernel -- the production-scale twin of
    parallel.grad.wavefront_rms: diffraction-based merits no longer
    store XLA VJP residuals (VERDICT r4 task 3).  NaN (vignetted)
    rays drop out of the moments and carry zero cotangent."""
    opd = pallas_opd_rays(table, y0, u0, ref=ref, radius=radius,
                          wavelength=wavelength, scale=scale,
                          finite=finite, specs=specs, clip=clip,
                          tile=tile, interpret=interpret,
                          diff_pose=diff_pose)
    if w is None:
        w = jnp.ones(opd.shape[0], opd.dtype)/opd.shape[0]
    good = jnp.isfinite(opd)
    wg = jnp.where(good, w, 0.)
    o = jnp.where(good, opd, 0.)
    wsum = wg.sum()
    mean = (wg*o).sum()/wsum
    return jnp.sqrt((wg*jnp.square(o - mean)).sum()/wsum + 1e-30)
