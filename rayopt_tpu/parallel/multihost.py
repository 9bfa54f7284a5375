"""Multi-host (DCN) batch farming of independent traces.

The reference is single-process (SURVEY.md section 5: the only
distributed-communication need of this domain is farming independent
work -- tolerancing Monte-Carlo, optimization sweeps -- over hosts).
The TPU-native design keeps the engines communication-free and puts
ALL distribution at the sharding boundary:

* one global mesh over every device of every host, with the sample
  axis sharded across it -- slices that land on another host's
  devices ride DCN only at array materialization, never inside the
  trace;
* per-process data construction via `jax.make_array_from_callback`,
  so each host materializes only its addressable shard (correct and
  identical code single-process and multi-host);
* results are summarized per-shard and gathered once at the end
  (`process_allgather` when distributed, a plain fetch otherwise).

Real multi-host validation needs a multi-host slice; on one host this
module runs bit-identically over the local (or virtual CPU) mesh, and
tests/test_multihost.py pins that path.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Bring up jax.distributed when running under a multi-process
    launcher; a no-op single-process.  Call before any jax API."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def farm_mesh(axis="samples"):
    """One mesh axis over every device of every process: the farm."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def _shard_samples(build_shard, shape, mesh, axis, dtype=jnp.float64):
    """Materialize a sample-sharded global array: `build_shard(lo, hi)`
    is called only for index ranges this process actually holds."""
    sharding = NamedSharding(mesh, P(axis, *([None]*(len(shape) - 1))))
    return jax.make_array_from_callback(
        shape, sharding,
        lambda idx: np.asarray(build_shard(idx[0].start or 0,
                                           idx[0].stop or shape[0]),
                               dtype=dtype))


def farmed_monte_carlo_rms(table, y0, u0, w=None, sigmas=None,
                           n_samples=256, seed=0, clip=False,
                           axis="samples", mesh=None):
    """Tolerancing Monte-Carlo farmed over every device of every
    host.  Each process draws only its own perturbation shard (the
    same deterministic per-sample keys everywhere, so the global
    sample set is independent of topology); the vmapped trace runs
    without any cross-device communication; per-sample RMS values are
    gathered once at the end.

    Returns the same stats dict as tolerance_analysis."""
    from .tolerancing import monte_carlo_rms

    if mesh is None:
        mesh = farm_mesh(axis)
    if w is None:
        w = np.ones(y0.shape[0])/y0.shape[0]
    if sigmas is None:
        sigmas = {"curvature": 1e-6, "distance": 5e-3}

    base = {f: np.asarray(getattr(table, f)) for f in table._fields}
    field_names = sorted(sigmas)

    def noise_for(lo, hi, field):
        """Deterministic per-sample noise rows: key = (seed, sample,
        field index) -- independent of the process layout."""
        shp = base[field].shape
        fi = field_names.index(field)
        rows = []
        for si in range(lo, hi):
            k = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), si), fi)
            rows.append(np.asarray(
                jax.random.normal(k, shp, jnp.float64)))
        return np.stack(rows)

    stacked = {}
    for f in table._fields:
        shp = (n_samples,) + base[f].shape
        if f in sigmas:
            sig = sigmas[f]
            stacked[f] = _shard_samples(
                lambda lo, hi, f=f, sig=sig:
                    base[f][None] + sig*noise_for(lo, hi, f),
                shp, mesh, axis)
        elif f == "offset" and "distance" in sigmas:
            sig = sigmas["distance"]

            def off_shard(lo, hi, sig=sig):
                off = np.broadcast_to(
                    base["offset"][None],
                    (hi - lo,) + base["offset"].shape).copy()
                off[..., 2] = (base["distance"][None]
                               + sig*noise_for(lo, hi, "distance"))
                return off
            stacked[f] = _shard_samples(off_shard, shp, mesh, axis)
        else:
            stacked[f] = _shard_samples(
                lambda lo, hi, f=f: np.broadcast_to(
                    base[f][None], (hi - lo,) + base[f].shape),
                shp, mesh, axis)
    tables = type(table)(**stacked)

    rep = NamedSharding(mesh, P())
    y0 = jax.device_put(np.asarray(y0), rep)
    u0 = jax.device_put(np.asarray(u0), rep)
    w = jax.device_put(np.asarray(w), rep)
    from ..ops.tables import is_anamorphic
    rms = monte_carlo_rms(tables, y0, u0, w, clip=clip,
                          biconic=is_anamorphic(table))

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        rms = multihost_utils.process_allgather(rms, tiled=True)
    rms = np.asarray(rms)
    good = rms[np.isfinite(rms)]
    return {
        "rms": rms,
        "mean": float(good.mean()),
        "p50": float(np.percentile(good, 50)),
        "p90": float(np.percentile(good, 90)),
        "p99": float(np.percentile(good, 99)),
        "n_hosts": jax.process_count(),
        "n_devices": len(mesh.devices.ravel()),
    }
