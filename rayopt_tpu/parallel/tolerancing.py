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


@functools.partial(jax.jit, static_argnames=("clip",))
def monte_carlo_rms(tables, y0, u0, w, clip=False):
    """Spot RMS per perturbation sample: vmap over the stacked table
    (rays shared across samples).  Returns (n_samples,) RMS values."""

    def rms_one(tab):
        y, u, t = trace_rays_final(tab, y0, u0, clip=clip)
        pt = y[:, :2]
        good = jnp.all(jnp.isfinite(pt), axis=1)
        wg = jnp.where(good, w, 0.)
        pt = jnp.where(good[:, None], pt, 0.)
        wsum = wg.sum()
        mean = (wg[:, None]*pt).sum(0)/wsum
        r2 = (wg*jnp.square(pt - mean).sum(1)).sum()/wsum
        return jnp.sqrt(r2)

    return jax.vmap(rms_one)(tables)


def sharded_monte_carlo_rms(tables, y0, u0, w, mesh, clip=False,
                            axis="samples"):
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
        return monte_carlo_rms.__wrapped__(tabs, y0, u0, w, clip=clip)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis),
    )
    return jax.jit(fn)(tables, y0, u0, w)


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


def tolerance_analysis(table, y0, u0, w=None, sigmas=None,
                       n_samples=256, seed=0, clip=False, mesh=None):
    """Monte-Carlo tolerance run; returns dict with the merit
    distribution and its quantiles.  With `mesh`, samples are farmed
    over the devices (sample count must divide by the mesh size)."""
    if w is None:
        w = np.ones(y0.shape[0])/y0.shape[0]
    if sigmas is None:
        sigmas = {"curvature": 1e-6, "distance": 5e-3}
    key = jax.random.PRNGKey(seed)
    tables = perturbed_tables(table, key, n_samples, sigmas)
    if mesh is None:
        rms = monte_carlo_rms(tables, y0, u0, jnp.asarray(w), clip=clip)
    else:
        rms = sharded_monte_carlo_rms(tables, jnp.asarray(y0),
                                      jnp.asarray(u0), jnp.asarray(w),
                                      mesh, clip=clip)
    rms = np.asarray(rms)
    good = rms[np.isfinite(rms)]
    return {
        "rms": rms,
        "nominal": float(np.asarray(monte_carlo_rms(
            jax.tree_util.tree_map(lambda a: a[None], table),
            y0, u0, jnp.asarray(w), clip=clip))[0]),
        "mean": float(good.mean()),
        "p50": float(np.percentile(good, 50)),
        "p90": float(np.percentile(good, 90)),
        "p99": float(np.percentile(good, 99)),
        "yield_2x": float((good <= 2*good.min()).mean()),
    }
