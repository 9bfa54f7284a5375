"""Tolerancing: Monte-Carlo perturbation analysis as one vmapped
batch.

The classic workflow (perturb radii/thicknesses/decenters, re-trace,
collect the merit distribution) is embarrassingly parallel over
perturbation samples -- the TPU-native formulation is a SurfaceTable
with a leading sample axis, vmapped through the trace, optionally
sharded over chips.  The reference has no tolerancing machinery; this
is the "multi-host batch farming of independent traces" SURVEY.md
section 5 calls out, expressed single-program.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.geometric import trace_rays_final


def perturbed_tables(table, key, n_samples, sigmas,
                     preserve_zeros=()):
    """Stack n_samples perturbed copies of `table`.

    sigmas: dict field -> per-surface std-dev array (broadcastable to
    the field's shape), e.g. {"curvature": 1e-5, "distance": 1e-3}.
    Gaussian perturbations; offset z follows distance when distance is
    perturbed.  Fields named in `preserve_zeros` keep exact zeros
    unperturbed (so flat surfaces stay flat -- required when the
    downstream consumer was specialized on the nominal table's static
    structure, e.g. the polynomial trace).
    """
    keys = jax.random.split(key, len(sigmas))
    out = {}
    for k, (field, sigma) in zip(keys, sigmas.items()):
        base = jnp.asarray(getattr(table, field))
        noise = sigma*jax.random.normal(k, (n_samples,) + base.shape,
                                        base.dtype)
        if field in preserve_zeros:
            noise = jnp.where(base[None] == 0, 0., noise)
        out[field] = base[None] + noise
    if "distance" in out and "offset" not in out:
        off = jnp.broadcast_to(jnp.asarray(table.offset)[None],
                               (n_samples,) + table.offset.shape)
        out["offset"] = off.at[..., 2].set(out["distance"])
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (n_samples,) + a.shape), table)
    return stacked.replace(**out)


def _best_focus_rms(pt, q, wg):
    """Weighted spot RMS minimized over an axial image shift: the
    transverse landing is pt + delta*q (q = u_xy/u_z), and the
    optimal compensator delta* = -sum w <p', q'>/sum w |q'|^2
    (primed = centered) is closed-form -- the classic Monte-Carlo
    back-focus compensation without any per-sample solve loop."""
    wsum = wg.sum()
    pm = (wg[:, None]*pt).sum(0)/wsum
    qm = (wg[:, None]*q).sum(0)/wsum
    pc = pt - pm
    qc = q - qm
    num = (wg*(pc*qc).sum(1)).sum()
    den = (wg*jnp.square(qc).sum(1)).sum()
    delta = -num/jnp.where(den == 0, 1., den)
    r2 = (wg*jnp.square(pc + delta[None]*qc).sum(1)).sum()/wsum
    return jnp.sqrt(r2), delta


@functools.partial(jax.jit, static_argnames=("clip", "biconic",
                                             "compensate_focus"))
def monte_carlo_rms(tables, y0, u0, w, clip=False, biconic=False,
                    compensate_focus=False):
    """Spot RMS per perturbation sample: vmap over the stacked table
    (rays shared across samples).  Returns (n_samples,) RMS values.

    compensate_focus=True scores each sample at its own best focus
    (closed-form axial-shift compensator from the final ray state --
    the standard MC tolerancing convention, where the back focus is
    re-adjusted per built system)."""

    def rms_one(tab):
        y, u, t = trace_rays_final(tab, y0, u0, clip=clip,
                                   biconic=biconic)
        pt = y[:, :2]
        good = (jnp.all(jnp.isfinite(pt), axis=1)
                & jnp.all(jnp.isfinite(u), axis=1))
        wg = jnp.where(good, w, 0.)
        pt = jnp.where(good[:, None], pt, 0.)
        if compensate_focus:
            uz = jnp.where(u[:, 2] == 0, 1., u[:, 2])
            q = jnp.where(good[:, None], u[:, :2]/uz[:, None], 0.)
            return _best_focus_rms(pt, q, wg)[0]
        wsum = wg.sum()
        mean = (wg[:, None]*pt).sum(0)/wsum
        r2 = (wg*jnp.square(pt - mean).sum(1)).sum()/wsum
        return jnp.sqrt(r2)

    return jax.vmap(rms_one)(tables)


def sharded_monte_carlo_rms(tables, y0, u0, w, mesh, clip=False,
                            axis="samples", biconic=False,
                            compensate_focus=False):
    """Batch-farm the Monte-Carlo samples over a device mesh: the
    stacked tables shard over their leading sample axis, rays are
    replicated, every chip traces its own slice of the design
    perturbations with no cross-chip communication at all (the
    SURVEY.md section 5 "farm independent traces over hosts" pattern;
    over multi-host meshes the same sharding rides DCN)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(tabs, y0, u0, w):
        # rays are replicated but feed a scan carry that varies over
        # the sample axis; mark them varying for shard_map's checker
        if hasattr(jax.lax, "pcast"):
            y0, u0, w = jax.lax.pcast((y0, u0, w), (axis,),
                                      to="varying")
        return monte_carlo_rms.__wrapped__(
            tabs, y0, u0, w, clip=clip, biconic=biconic,
            compensate_focus=compensate_focus)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis),
    )
    return jax.jit(fn)(tables, y0, u0, w)


def _nan_safe_sample_rms(tab, y0, u0, w, clip, biconic,
                         compensate_focus):
    """Differentiable weighted spot RMS of one (possibly compensated)
    sample table.  Vignetted rays poison reverse-mode AD (NaN * 0 =
    NaN cotangents), so a stop-gradient pre-trace finds the survivors
    and dead rays are substituted by a surviving seed with zero
    weight before the differentiated trace runs (same scheme as
    parallel.grad.spot_rms).  With compensate_focus the merit is the
    closed-form best-focus RMS."""
    tab0 = jax.tree_util.tree_map(jax.lax.stop_gradient, tab)
    yp, up, tp = trace_rays_final(tab0, y0, u0, clip=clip,
                                  biconic=biconic)
    alive = (jnp.all(jnp.isfinite(yp[:, :2]), axis=1)
             & jnp.all(jnp.isfinite(up), axis=1))
    i0 = jnp.argmax(alive)
    y0 = jnp.where(alive[:, None], y0, y0[i0])
    u0 = jnp.where(alive[:, None], u0, u0[i0])
    w = jnp.where(alive, w, 0.)
    y, u, t = trace_rays_final(tab, y0, u0, clip=clip, biconic=biconic)
    pt = y[:, :2]
    good = jnp.all(jnp.isfinite(pt), axis=1)
    wg = jnp.where(good, w, 0.)
    pt = jnp.where(good[:, None], pt, 0.)
    if compensate_focus:
        uz = jnp.where(u[:, 2] == 0, 1., u[:, 2])
        q = jnp.where(good[:, None], u[:, :2]/uz[:, None], 0.)
        return _best_focus_rms(pt, q, wg)[0]
    wsum = wg.sum()
    mean = (wg[:, None]*pt).sum(0)/wsum
    r2 = (wg*jnp.square(pt - mean).sum(1)).sum()/wsum
    return jnp.sqrt(r2)


def compensated_monte_carlo_rms(tables, y0, u0, w, compensators,
                                steps=30, lr=1e-2, optimizer=None,
                                clip=False, biconic=False,
                                compensate_focus=False, mesh=None,
                                axis="samples"):
    """Monte-Carlo tolerancing with per-sample COMPENSATOR
    re-optimization -- the "as adjusted" convention: every built
    (perturbed) system gets its own adjustment of the designated
    compensator parameters before it is scored, exactly like a real
    assembly line re-spaces an air gap or re-tilts a fold to recover
    a toleranced build.

    Each sample runs `steps` adam updates of ITS OWN compensator
    parameters against its own NaN-safe spot-RMS merit, all samples
    inside one jitted vmap -- the whole Monte-Carlo-with-adjustment
    study is a single device dispatch (the TPU-native formulation;
    a per-sample scipy re-optimize loop is the reference-era shape).
    With `mesh` the samples shard over the named axis, each chip
    adjusting its own slice with no cross-chip communication.

    compensators: dict field -> surface row indices free to adjust,
        e.g. {"distance": [6]} for an air-gap compensator or
        {"tilt": [2]} for an alignment compensator (vector rows free
        all three components).  Perturbing `distance` keeps offset
        tied (offset = unit * distance, like perturbed_tables).
    compensate_focus: score (and descend) at the closed-form best
        focus on top of the descended compensators -- use it when
        back-focus is ALSO adjusted per build, instead of spending a
        `distance` compensator row on the image gap.
    lr: adam step in parameter units (default 1e-2: ~0.3 units of
        total travel at steps=30; scale to the compensator's range).

    Returns dict with "rms" ((n,) compensated merits -- never worse
    than uncompensated: a diverged/NaN descent falls back to the
    as-built value), "rms0" ((n,) uncompensated), and "params"
    ({field: (n, k, ...)} the final per-sample compensator values).
    """
    import optax
    if optimizer is None:
        optimizer = optax.adam(lr)
    comp = {f: np.atleast_1d(np.asarray(ix, int))
            for f, ix in compensators.items()}
    y0 = jnp.asarray(y0)
    u0 = jnp.asarray(u0)
    w = jnp.asarray(w)

    def apply_comp(tab, params):
        t2 = tab
        for f, ix in comp.items():
            base = jnp.asarray(getattr(t2, f))
            t2 = t2.replace(**{f: base.at[ix].set(params[f])})
        if "distance" in comp:
            ix = comp["distance"]
            d_new = params["distance"]
            d_old = tab.distance[ix]
            denom = jnp.where(d_old == 0, 1., d_old)[:, None]
            unit = jnp.where((d_old != 0)[:, None],
                             tab.offset[ix]/denom,
                             jnp.asarray([0., 0., 1.],
                                         tab.offset.dtype))
            t2 = t2.replace(
                offset=t2.offset.at[ix].set(unit*d_new[:, None]))
        return t2

    def descend(tab):
        params0 = {f: jnp.asarray(getattr(tab, f))[ix]
                   for f, ix in comp.items()}
        loss = functools.partial(
            _nan_safe_sample_rms, y0=y0, u0=u0, w=w, clip=clip,
            biconic=biconic, compensate_focus=compensate_focus)
        rms0 = loss(apply_comp(tab, params0))
        state = optimizer.init(params0)

        def body(carry, _):
            p, st = carry
            value, grads = jax.value_and_grad(
                lambda p: loss(apply_comp(tab, p)))(p)
            updates, st = optimizer.update(grads, st, p)
            return (optax.apply_updates(p, updates), st), value

        (p, _), _ = jax.lax.scan(body, (params0, state), None,
                                 length=steps)
        rms1 = loss(apply_comp(tab, p))
        better = rms1 < rms0          # NaN descent -> keep as-built
        params = jax.tree_util.tree_map(
            lambda a0, a1: jnp.where(better, a1, a0), params0, p)
        return jnp.where(better, rms1, rms0), rms0, params

    if mesh is None:
        rms, rms0, params = jax.jit(jax.vmap(descend))(tables)
    else:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        fn = shard_map(jax.vmap(descend), mesh=mesh,
                       in_specs=(P(axis),), out_specs=P(axis),
                       check_vma=False)
        rms, rms0, params = jax.jit(fn)(tables)
    return {"rms": rms, "rms0": rms0, "params": params}


#: linear (s, t) combinations forming the Seidel sums s1..s5
#: (same table as trace/poly.py SEIDEL_COMBOS, reference
#: poly_trace.py:150-156)
_SEIDEL5 = (
    (("s", 1, 1.),),
    (("t", 1, -1.),),
    (("t", 3, .5),),
    (("s", 2, 1.), ("t", 3, -.5)),
    (("t", 2, -1.),),
)


def _seidel5(s, t):
    """s1..s5 from the final (s, t) coefficient vectors."""
    st = {"s": s, "t": t}
    return jnp.stack([sum(w*st[which][idx] for which, idx, w in combo)
                      for combo in _SEIDEL5])


def aberration_tolerance(table, pupil_distance, sigmas=None,
                         n_samples=256, kmax=3, seed=0,
                         telecentric=False, mesh=None, axis="samples"):
    """Monte-Carlo tolerancing of the third-order (Seidel) aberration
    coefficients: perturb the table, run the jittable aberration-
    polynomial trace (ops.poly_jax) vmapped over samples, and return
    the distribution of s1..s5.

    Coefficients are in the raw (unnormalized) trace invariants --
    identical to PolyTrace.seidel for infinite conjugates; finite
    conjugates skip the field/pupil normalization (deltas across
    samples remain directly comparable).

    Flat surfaces stay flat under perturbation (the polynomial trace
    is specialized on the nominal static structure).  With `mesh`, the
    sample axis is farmed over devices exactly like the ray-based
    Monte-Carlo (no cross-chip communication).
    """
    from ..ops.kernels import specialize
    from ..ops.poly_jax import poly_trace_table

    specs = specialize(table)
    if sigmas is None:
        sigmas = {"curvature": 1e-6, "distance": 5e-3}
    key = jax.random.PRNGKey(seed)
    tables = perturbed_tables(table, key, n_samples, sigmas,
                              preserve_zeros=("curvature", "conic"))

    def one(tab):
        stvwof, n = poly_trace_table(tab, specs, kmax, pupil_distance,
                                     telecentric=telecentric)
        return _seidel5(stvwof[-1, 0], stvwof[-1, 1])

    if mesh is None:
        vals = jax.jit(jax.vmap(one))(tables)
    else:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        fn = shard_map(jax.vmap(one), mesh=mesh,
                       in_specs=(P(axis),), out_specs=P(axis))
        vals = jax.jit(fn)(tables)
    vals = np.asarray(vals)
    nominal = np.asarray(one(table))
    good = vals[np.all(np.isfinite(vals), axis=1)]
    return {
        "seidel": vals,
        "nominal": nominal,
        "mean": good.mean(0),
        "std": good.std(0),
        "p90_abs_delta": np.percentile(
            np.abs(good - nominal), 90, axis=0),
    }


def _rms_and_weight(table, y0, u0, w, clip=False, biconic=False,
                    specs=None):
    """(weighted transverse spot RMS, surviving weight) of one traced
    table; NaN (vignetted/missed) rays drop out of both."""
    y, u, t = trace_rays_final(table, y0, u0, clip=clip,
                               biconic=biconic, specs=specs,
                               unroll=specs is not None)
    pt = y[:, :2]
    good = jnp.all(jnp.isfinite(pt), axis=1)
    wg = jnp.where(good, w, 0.)
    pt = jnp.where(good[:, None], pt, 0.)
    wsum = wg.sum()
    mean = (wg[:, None]*pt).sum(0)/wsum
    r2 = (wg*jnp.square(pt - mean).sum(1)).sum()/wsum
    return jnp.sqrt(r2), wsum


def _rms_of_table(table, y0, u0, w, clip=False, biconic=False,
                  specs=None):
    """Weighted transverse spot RMS of one traced table (NaN rays
    dropped) -- the scalar merit all sensitivity machinery differentiates
    or samples."""
    return _rms_and_weight(table, y0, u0, w, clip=clip,
                           biconic=biconic, specs=specs)[0]


def _perturb_entry(table, field, idx, delta):
    """Return `table` with entry `idx` of `field` shifted by `delta`
    (delta may carry leading batch axes).  Perturbing `distance` moves
    offset z with it, like perturbed_tables."""
    base = jnp.asarray(getattr(table, field))
    onehot = jnp.zeros(base.shape).at[idx].set(1.)
    shaped = jnp.asarray(delta)[..., *(None,)*base.ndim]
    out = {field: base + shaped*onehot}
    if field == "distance":
        off = jnp.asarray(table.offset)
        zhot = jnp.zeros(off.shape).at[idx, 2].set(1.)
        out["offset"] = off + shaped[..., None]*zhot
    if delta_ndim := jnp.ndim(delta):
        bshape = jnp.shape(delta)
        rest = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       bshape + jnp.shape(a)), table)
        return rest.replace(**out)
    return table.replace(**out)


def sensitivity(table, y0, u0, w=None, fields=("curvature", "distance"),
                clip=False, second_order=True, engine="xla",
                tile=None, interpret=False):
    """Exact per-parameter sensitivities of the spot RMS.

    One reverse pass gives every first derivative d(RMS)/dp (the
    whole table is differentiated at once -- no finite differences,
    no per-parameter loop); a vmapped forward-over-reverse pass over
    one-hot tangents adds the diagonal second derivatives used by the
    quadratic inverse-sensitivity model.

    Returns {field: {"grad": (S,...), "hess": (S,...)}} with hess
    omitted when second_order=False.

    engine="adjoint" runs the reverse pass through the analytic-
    adjoint Pallas merit (ops.pallas_grad.pallas_spot_rms): no VJP
    residuals, so production-scale sensitivity bundles (2^26 rays)
    fit where the XLA path OOMs -- including pose fields ("tilt",
    "decenter"), whose rows kernels.with_pose keeps live at the
    nominal alignment.  Gradient semantics become the SPECIALIZED
    engine's (exact-zero parameters bake out and warn); ray counts
    must tile by 128.  The adjoint is reverse-only (custom_vjp has no
    forward mode), so second_order requires engine="xla" -- run the
    Hessian diagonal at a reduced ray count there if the gradient
    needed the adjoint's memory ceiling.

    Freeform caveat: a table with a nonzero xy_poly row is rerouted
    through the statically specialized engine (the dynamic scan path
    compiles pathologically under forward-over-reverse on XLA:CPU),
    and specialization BAKES OUT parameters that are exactly zero in
    non-freeform rows -- e.g. the curvature of an exactly-flat row
    reports structurally zero grad/hess there (the flat corrector-
    plate carrier itself is unaffected: its xy_poly row stays fully
    differentiable).  Symmetric/anamorphic tables keep the scan path
    and its full-parameter semantics.
    """
    if w is None:
        w = jnp.full(y0.shape[0], 1./y0.shape[0])
    w = jnp.asarray(w)
    from ..ops.tables import is_anamorphic
    bic = is_anamorphic(table)
    # freeform rows: the dynamic scan path (three Newton candidates
    # per row) makes the vmapped forward-over-reverse second-order
    # pass compile pathologically on XLA:CPU -- route through the
    # statically specialized engine instead (NOTE: specialization
    # bake-out semantics apply, e.g. a flat row's curvature slot
    # reports zero sensitivity; symmetric/anamorphic tables keep the
    # scan path and its full-parameter semantics)
    xyp = getattr(table, "xy_poly", None)
    specs = None
    if xyp is not None and np.asarray(xyp).size \
            and np.any(np.asarray(xyp) != 0):
        from ..ops.kernels import specialize
        specs = specialize(table)
        bic = False

    if engine == "adjoint":
        if second_order:
            raise ValueError(
                "sensitivity(engine='adjoint') is reverse-only "
                "(custom_vjp has no forward mode): pass "
                "second_order=False, and run the Hessian diagonal on "
                "engine='xla' (a reduced ray count fits its memory)")
        from ..ops.kernels import specialize, with_pose
        from ..ops.pallas_grad import DEFAULT_TILE, pallas_spot_rms
        specs_adj = specialize(
            jax.tree_util.tree_map(np.asarray, table))
        if any(f in fields for f in ("tilt", "decenter")):
            specs_adj = with_pose(specs_adj)
        n = y0.shape[0]
        t_adj = tile or min(n, DEFAULT_TILE)
        while n % t_adj or t_adj % 128:
            t_adj -= 128
            if t_adj <= 0:
                raise ValueError(
                    "engine='adjoint' needs ray counts in multiples "
                    "of 128 (got %d)" % n)

        def _rms(tab):
            return pallas_spot_rms(tab, y0, u0, w, specs=specs_adj,
                                   clip=clip, tile=t_adj,
                                   interpret=interpret)
    else:
        def _rms(tab):
            return _rms_of_table(tab, y0, u0, w, clip=clip,
                                 biconic=bic, specs=specs)

    def merit_from(deltas):
        tab = table.replace(**{
            f: jnp.asarray(getattr(table, f)) + deltas[f]
            for f in fields})
        if "distance" in fields:
            off = jnp.asarray(table.offset)
            tab = tab.replace(offset=off.at[:, 2].add(
                deltas["distance"]))
        return _rms(tab)

    zeros = {f: jnp.zeros(jnp.shape(getattr(table, f)))
             for f in fields}
    grads = jax.jit(jax.grad(merit_from))(zeros)
    out = {f: {"grad": np.asarray(grads[f])} for f in fields}
    if second_order:
        for f in fields:
            shape = jnp.shape(getattr(table, f))
            size = int(np.prod(shape))
            eye = jnp.eye(size).reshape((size,) + shape)

            def hvp(tangent, f=f):
                g = jax.grad(merit_from)
                _, gdot = jax.jvp(
                    g, (zeros,), ({**zeros, f: tangent},))
                return (gdot[f]*tangent).sum()

            diag = jax.jit(jax.vmap(hvp))(eye)
            out[f]["hess"] = np.asarray(diag).reshape(shape)
    return out


def inverse_sensitivity(table, y0, u0, budget, w=None,
                        fields=("curvature", "distance"), clip=False,
                        t_min=1e-9, t_max=None, n_grid=25):
    """Per-parameter tolerances for a merit budget (reference TODO.rst
    "tolerancing (mc, inverse sensitivity)" -- absent upstream).

    For every perturbable entry p of the selected table fields, find
    the magnitude t such that worst-sign degradation
    max_s RMS(p0 + s*t) - RMS(p0) reaches `budget`.

    Seed each entry from the quadratic model g*t + h/2*t^2 = budget
    (g, h from `sensitivity`), then certify/correct on a geometric
    magnitude grid around the seed: ALL entries x grid points x both
    signs are traced as ONE vmapped batch, and the budget crossing is
    log-interpolated per entry.  Returns {field: {"tolerance": (S,...),
    "achieved": (S,...)}} where achieved is the re-traced degradation
    at the returned tolerance.
    """
    if w is None:
        w = jnp.full(y0.shape[0], 1./y0.shape[0])
    w = jnp.asarray(w)
    sens = sensitivity(table, y0, u0, w, fields=fields, clip=clip)
    from ..ops.tables import is_anamorphic
    bic = is_anamorphic(table)
    rms0, wsum0 = map(float, jax.jit(
        _rms_and_weight, static_argnames=("clip", "biconic"))(
        table, y0, u0, w, clip=clip, biconic=bic))

    @functools.partial(jax.jit, static_argnames=("field", "clip"))
    def degradation_grid(field, flat_idx, ts, clip=False):
        """(P, G) degradations for entries `flat_idx` at magnitudes
        `ts`, worst over both signs.  A magnitude that vignettes away
        more than half the nominal surviving weight counts as an
        infinite degradation (a one-ray 'perfect spot' is not a
        tolerance pass)."""
        shape = jnp.shape(getattr(table, field))

        def one_entry(i, trow):
            idx = jnp.unravel_index(i, shape)

            def one_mag(t):
                tabs = _perturb_entry(table, field, idx,
                                      jnp.stack([t, -t]))
                r, ws = jax.vmap(
                    lambda tb: _rms_and_weight(
                        tb, y0, u0, w, clip=clip, biconic=bic))(tabs)
                ok = jnp.isfinite(r) & (ws >= .5*wsum0)
                r = jnp.where(ok, r, jnp.inf)
                return jnp.max(r) - rms0

            return jax.vmap(one_mag)(trow)

        return jax.vmap(one_entry)(flat_idx, ts)

    out = {}
    for f in fields:
        g = np.abs(sens[f]["grad"]).ravel()
        h = np.abs(sens[f].get("hess", np.zeros_like(g))).ravel()
        # quadratic-model seed; linear fallback when h ~ 0
        with np.errstate(divide="ignore", invalid="ignore"):
            seed = np.where(
                h > 1e-12*np.maximum(g, 1e-30),
                (-g + np.sqrt(g*g + 2*h*budget))/np.where(h, h, 1.),
                budget/np.where(g, g, np.inf))
        cap = t_max if t_max is not None else 1e6
        seed = np.where(np.isfinite(seed) & (seed > 0), seed, cap)
        seed = np.clip(seed, t_min, cap)
        # geometric certification grid spanning 2 decades around seed
        span = np.logspace(-1., 1., n_grid)
        ts = np.clip(seed[:, None]*span[None, :], t_min, cap)
        idx = jnp.arange(g.size)
        dgr = np.array(degradation_grid(f, jnp.asarray(idx),
                                        jnp.asarray(ts), clip=clip))
        # rescue entries already over budget at their smallest grid
        # point (the quadratic seed underestimated the sensitivity by
        # more than the grid's decade, or a vignetting cliff sits far
        # below it): one more batched pass on a full-range downward
        # grid so the reported tolerance never exceeds the true one
        lost = np.flatnonzero(dgr[:, 0] >= budget)
        if lost.size:
            wide = np.exp(np.linspace(
                np.log(t_min), np.log(ts[lost, 0]), n_grid, axis=-1))
            dgr_w = np.asarray(degradation_grid(
                f, jnp.asarray(lost), jnp.asarray(wide), clip=clip))
            ts[lost] = wide
            dgr[lost] = dgr_w
        # first grid point where the worst-sign degradation crosses
        # the budget, log-interpolated against its predecessor
        tol = np.empty(g.size)
        ach = np.empty(g.size)
        tgrid = np.asarray(ts)
        for i in range(g.size):
            d = dgr[i]
            over = np.flatnonzero(d >= budget)
            if not over.size:
                tol[i] = tgrid[i, -1]  # insensitive within t_max
                ach[i] = d[-1]
                continue
            j = over[0]
            if not np.isfinite(d[j]) and j > 0:
                # budget reached through a vignetting cliff: report
                # the last magnitude proven below budget
                tol[i] = tgrid[i, j - 1]
                ach[i] = d[j - 1]
                continue
            if j == 0 or not np.isfinite(d[j]) or d[j - 1] <= 0:
                tol[i] = tgrid[i, j]
                ach[i] = d[j]
                continue
            # log-log interpolation of the crossing
            lt = np.log(tgrid[i, j - 1:j + 1])
            ld = np.log(d[j - 1:j + 1])
            frac = (np.log(budget) - ld[0])/(ld[1] - ld[0])
            tol[i] = float(np.exp(lt[0] + frac*(lt[1] - lt[0])))
            ach[i] = float(np.exp(ld[0] + frac*(ld[1] - ld[0])))
        out[f] = {
            "tolerance": tol.reshape(np.shape(sens[f]["grad"])),
            "achieved": ach.reshape(np.shape(sens[f]["grad"])),
        }
    out["nominal_rms"] = rms0
    return out


def tolerance_analysis(table, y0, u0, w=None, sigmas=None,
                       n_samples=256, seed=0, clip=False, mesh=None,
                       compensate_focus=False, compensators=None,
                       comp_steps=30, comp_lr=1e-2):
    """Monte-Carlo tolerance run; returns dict with the merit
    distribution and its quantiles.  With `mesh`, samples are farmed
    over the devices (sample count must divide by the mesh size).
    compensate_focus scores each sample at its own closed-form best
    focus (the standard per-build back-focus compensator).
    compensators ({field: row indices}) additionally re-optimizes the
    named parameters PER SAMPLE before scoring ("as adjusted" -- see
    compensated_monte_carlo_rms); the returned dict then carries the
    uncompensated distribution stats under "mean_uncompensated"."""
    if w is None:
        w = np.ones(y0.shape[0])/y0.shape[0]
    if sigmas is None:
        sigmas = {"curvature": 1e-6, "distance": 5e-3}
    from ..ops.tables import is_anamorphic
    bic = is_anamorphic(table)
    key = jax.random.PRNGKey(seed)
    tables = perturbed_tables(table, key, n_samples, sigmas)
    rms0 = None
    if compensators is not None:
        out = compensated_monte_carlo_rms(
            tables, jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(w),
            compensators, steps=comp_steps, lr=comp_lr, clip=clip,
            biconic=bic, compensate_focus=compensate_focus, mesh=mesh)
        rms = out["rms"]
        rms0 = np.asarray(out["rms0"])
    elif mesh is None:
        rms = monte_carlo_rms(tables, y0, u0, jnp.asarray(w),
                              clip=clip, biconic=bic,
                              compensate_focus=compensate_focus)
    else:
        rms = sharded_monte_carlo_rms(tables, jnp.asarray(y0),
                                      jnp.asarray(u0), jnp.asarray(w),
                                      mesh, clip=clip, biconic=bic,
                                      compensate_focus=compensate_focus)
    rms = np.asarray(rms)
    good = rms[np.isfinite(rms)]
    extra = {}
    if rms0 is not None:
        good0 = rms0[np.isfinite(rms0)]
        extra = {"rms_uncompensated": rms0,
                 "mean_uncompensated": float(good0.mean())}
    return {
        **extra,
        "rms": rms,
        "nominal": float(np.asarray(monte_carlo_rms(
            jax.tree_util.tree_map(lambda a: a[None], table),
            y0, u0, jnp.asarray(w), clip=clip, biconic=bic,
            compensate_focus=compensate_focus))[0]),
        "mean": float(good.mean()),
        "p50": float(np.percentile(good, 50)),
        "p90": float(np.percentile(good, 90)),
        "p99": float(np.percentile(good, 99)),
        "yield_2x": float((good <= 2*good.min()).mean()),
    }
